package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-similarity building blocks (builder brief: similarity search
  * over an `Array[Float]` column).
  *
  * Exactness across engines: float sums are order-sensitive, so raw float
  * cosines would hash-mismatch between Spark and DuckDB. Vectors are
  * instead QUANTIZED once (float → exact double → round ×1000 → bigint);
  * dot products and norms are then exact integer sums (order-independent),
  * and the final cosine is a single IEEE-deterministic double expression.
  * Ranking quality is unaffected (≈3 significant digits beyond typical
  * embedding noise).
  *
  * Scale notes: brute-force top-k broadcasts the (small) query set and
  * scans the corpus once — the right baseline up to ~10^9 vectors/queries
  * product. The LSH variant buckets by 8 deterministic integer hyperplanes
  * and joins bucket-to-bucket, turning ANN into an equi-join (the IVF
  * shape); recall is tunable by hyperplane count.
  */
object Embed {

  /** Embedding dimensionality — fixed by the corpus schema; the unrolled
    * expressions below are generated for exactly this width.
    */
  val Dim = 64

  /** Quantized vector: exact in both engines. (The lambda here runs once
    * per VECTOR, not per pair — interpreted eval is fine.)
    */
  val quantizeExpr: String =
    "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
  val quantizeSql: String =
    "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))"

  /** Squared norm of a quantized vector (exact bigint). History of this
    * spelling: 64-term unrolled Add trees blow codegen method limits
    * (fall back to per-node interpreted eval, 3× slower than the lambda
    * fold at sf0.1); the fold itself still walks an expression tree per
    * element. Round 4 moved the integer kernels into the codegen'd
    * [[graft.expr.VecOps]] expressions — bit-identical (exact integer
    * sums are order-independent), one tight static loop per row.
    */
  def normExprOf(v: String): String = s"vec_normsq($v)"
  def normSqlOf(v: String): String =
    s"CAST(list_sum(list_transform($v, x -> x * x)) AS BIGINT)"
  val normExpr: String = normExprOf("qv")
  val normSql: String = normSqlOf("qv")

  /** Exact integer dot product of two quantized vectors (codegen'd — see
    * [[normExprOf]] note).
    */
  def dotExpr(a: String, b: String): String = s"vec_dot($a, $b)"
  def dotSql(a: String, b: String): String =
    s"CAST(list_sum(list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i])) AS BIGINT)"

  /** cosine = dot / sqrt(na)·sqrt(nb) over exact ints — one deterministic
    * double expression, identical text in both dialects.
    */
  def cosineSql(dot: String, na: String, nb: String): String =
    s"CAST($dot AS DOUBLE) / (sqrt(CAST($na AS DOUBLE)) * sqrt(CAST($nb AS DOUBLE)))"

  /** Deterministic integer hyperplane j, generated in Scala and embedded
    * as LITERALS in both dialects (trivially identical cross-engine).
    *
    * Why literals and not a modular formula: the round-2 formula
    * `((i*31 + j*17) % 7) - 3` collapses — 31 ≡ 17 ≡ 3 (mod 7), so plane
    * j depended only on (i + j) % 7 and there were only SEVEN distinct
    * hyperplanes. Fine for one small sign-bucket, fatal for banded
    * multi-bit signatures (bands built from duplicate planes carry no
    * extra information). A murmur-style bit mix gives genuinely
    * independent planes with entries in [-3, 3], mean ≈ 0.
    */
  def hyperplaneVec(j: Int): IndexedSeq[Long] =
    graft.expr.VecOps.hyperplaneVec(j, Dim)

  private def hyperplaneLits(j: Int): String = hyperplaneVec(j).mkString(", ")

  def hyperplaneDotExpr(j: Int): String =
    s"aggregate(zip_with(array(${hyperplaneLits(j)}), qv, (h, x) -> h * x), CAST(0 AS BIGINT), (acc, x) -> acc + x)"
  def hyperplaneDotSql(j: Int): String =
    s"CAST(list_sum(list_transform(range(1, ${Dim + 1}), i -> ([${hyperplaneLits(j)}][i]) * qv[i])) AS BIGINT)"

  /** Band b's signature from `bits` contiguous hyperplane dots
    * d{b·bits}..d{b·bits+bits-1} (columns already computed): an integer in
    * [0, 2^bits) — bit k set iff the dot against plane b·bits+k is >= 0.
    * Plain arithmetic — shared dialect.
    */
  def bandKeySql(b: Int, bits: Int): String =
    (0 until bits).map(k => s"(CASE WHEN d${b * bits + k} >= 0 THEN ${1 << k} ELSE 0 END)")
      .mkString("(", " + ", ")")

  /** Spark-side band key reading a `dots` ARRAY column (the codegen'd
    * `hyperplane_dots` output; element_at is 1-based).
    */
  def bandKeyDotsExpr(b: Int, bits: Int): String =
    (0 until bits)
      .map(k => s"(CASE WHEN element_at(dots, ${b * bits + k + 1}) >= 0 THEN ${1 << k} ELSE 0 END)")
      .mkString("(", " + ", ")")

  /** Single sign-bucket from dots d0..d{bits-1} (= band 0's key). */
  def bucketSql(bits: Int): String = bandKeySql(0, bits)

  /** Adaptive LSH signature width (round 7): the number of bits that
    * keeps EXPECTED bucket occupancy ≈ `target` at corpus size `n` —
    * `max(minBits, ceil(log2(ceil(n / target))))`. With constant
    * occupancy, random-collision candidate pairs stay LINEAR in n
    * (buckets × target²/2) instead of n²/2^bits; the price is a mild,
    * quantified recall drift per added bit (a cos ≈ 0.99 pair agrees on
    * a given sign bit with p ≈ 0.955, so a 4-band match at 8 bits ≈ 0.99
    * recall, at 11 bits ≈ 0.97 — tunable back up with more bands).
    *
    * The floor+correct spelling (instead of a bare `ceil(log2 ...)`)
    * makes the result immune to cross-engine log rounding: both engines
    * floor their own log2, then correct against an EXACT integer
    * comparison (`2^f < q`), so any 1-ULP disagreement in the log is
    * repaired and both sides land on the true `ceil(log2(q))`.
    * [[adaptiveBitsSql]] is the DuckDB twin of this arithmetic.
    */
  def adaptiveBits(n: Long, minBits: Int, target: Int): Int = {
    val q = math.max(1L, (n + target - 1) / target)
    val f = math.floor(math.log(q.toDouble) / math.log(2.0)).toInt
    val c = if (math.pow(2.0, f) < q.toDouble) f + 1 else f
    math.max(minBits, c)
  }

  /** DuckDB twin of [[adaptiveBits]] as a CTE: `SELECT bits FROM params`.
    * `fromSql` is the table/CTE whose COUNT(*) is the corpus size.
    */
  def adaptiveBitsCteSql(fromSql: String, minBits: Int, target: Int): String =
    s"""params AS (
       |  SELECT GREATEST($minBits, CAST(FLOOR(LOG2(q)) AS INT) +
       |    (CASE WHEN POW(2, CAST(FLOOR(LOG2(q)) AS INT)) < q THEN 1 ELSE 0 END)) AS bits
       |  FROM (SELECT GREATEST(1, CAST(FLOOR((COUNT(*) + ${target - 1}) / $target.0) AS BIGINT)) AS q
       |        FROM $fromSql) t)""".stripMargin

  /** Int8 scalar quantization — ONE definition of the per-dimension
    * scale-and-encode kernel (corpus absmax per dimension, code_d =
    * sign(v)·(|v|·levels div scale_d)): `llm_sq_recall` and the
    * `llm_ann_ledger` 'sq' row both quantize through this; a divergent
    * copy would silently split the ledger's row from the entry it
    * claims to reuse (round-8 review finding). Returns emb's columns
    * plus `codes`; the scale table is a Dim-row aggregate broadcast
    * back, the encode a map-side zip_with.
    */
  def sqCoded(emb: DataFrame, levels: Long): DataFrame = {
    val scales = emb.select(posexplode(col("qv")).as(Seq("pos", "x")))
      .groupBy("pos").agg(greatest(max(abs(col("x"))), lit(1L)).as("s"))
      .groupBy().agg(array_sort(collect_list(struct(col("pos"), col("s")))).as("ps"))
      .select(col("ps.s").as("scales"))
    emb.crossJoin(broadcast(scales))
      .withColumn("codes", expr(
        s"zip_with(qv, scales, (v, s) -> CASE WHEN v >= 0 THEN (v * $levels) div s " +
          s"ELSE -((-v * $levels) div s) END)"))
      .drop("scales")
  }

  /** DuckDB twin of [[sqCoded]]: CTE chain `scal, sl, coded` over
    * `fromEmb`, ending in coded = (vec_id, qv, codes).
    */
  def sqCodedSql(fromEmb: String, levels: Long): String = {
    val codeT = s"CASE WHEN qv[j] >= 0 THEN (qv[j] * $levels) // s0.scales[j] " +
      s"ELSE -((-qv[j] * $levels) // s0.scales[j]) END"
    s"""scal AS (SELECT i.i AS i, GREATEST(1, max(abs(e.qv[i.i]))) AS s
       |         FROM $fromEmb e, range(1, ${Dim + 1}) i(i) GROUP BY i.i),
       |sl AS (SELECT list(s ORDER BY i) AS scales FROM scal),
       |coded AS (SELECT vec_id, qv,
       |    list_transform(range(1, ${Dim + 1}), j -> $codeT) AS codes
       |  FROM $fromEmb, sl s0)""".stripMargin
  }

  /** Spark-side prepared embedding table: (vec_id, label, qv, nrm). */
  def prepared(embeddings: DataFrame): DataFrame =
    embeddings
      .withColumn("qv", expr(quantizeExpr))
      .withColumn("nrm", expr(normExpr))
      .select(col("vec_id"), col("label"), col("qv"), col("nrm"))

  /** DuckDB twin of [[prepared]] as a CTE body over any embedding table. */
  def preparedSqlFrom(table: String): String =
    s"""SELECT vec_id, label, qv, $normSql AS nrm
       |FROM (SELECT vec_id, label, $quantizeSql AS qv FROM $table) q0""".stripMargin

  val preparedSql: String = preparedSqlFrom("embeddings")
}
