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

  /** Squared norm of a quantized vector (exact bigint). NOTE: the
    * fold/zip_with forms measure FASTER than 64-term unrolled
    * expressions — the giant flat Add trees blow codegen method limits
    * and fall back to per-node interpreted eval, while the lambda loop is
    * one tight interpreted loop (measured 3× at sf0.1).
    */
  val normExpr: String =
    "aggregate(transform(qv, x -> x * x), CAST(0 AS BIGINT), (acc, x) -> acc + x)"
  val normSql: String =
    "CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT)"

  /** Exact integer dot product of two quantized vectors (see [[normExpr]]
    * note on why this is a fold, not an unrolled sum).
    */
  def dotExpr(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, x) -> acc + x)"
  def dotSql(a: String, b: String): String =
    s"CAST(list_sum(list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i])) AS BIGINT)"

  /** cosine = dot / sqrt(na)·sqrt(nb) over exact ints — one deterministic
    * double expression, identical text in both dialects.
    */
  def cosineSql(dot: String, na: String, nb: String): String =
    s"CAST($dot AS DOUBLE) / (sqrt(CAST($na AS DOUBLE)) * sqrt(CAST($nb AS DOUBLE)))"

  /** Deterministic integer hyperplane j: H_j[i] = ((i*31 + j*17) % 7) - 3
    * for i in 0..63 — seed-free, identical in both engines.
    */
  def hyperplaneDotExpr(j: Int): String =
    s"aggregate(transform(sequence(0, ${Dim - 1}), i -> CAST(((i * 31 + $j * 17) % 7) - 3 AS BIGINT) * element_at(qv, i + 1)), CAST(0 AS BIGINT), (acc, x) -> acc + x)"
  def hyperplaneDotSql(j: Int): String =
    s"CAST(list_sum(list_transform(range(0, $Dim), i -> (((i * 31 + $j * 17) % 7) - 3) * qv[i + 1])) AS BIGINT)"

  /** Sign-bucket from `bits` hyperplane dots d0..d{bits-1} (columns already
    * computed): bit j set iff d_j >= 0. Plain arithmetic — shared dialect.
    */
  def bucketSql(bits: Int): String =
    (0 until bits).map(j => s"(CASE WHEN d$j >= 0 THEN ${1L << j} ELSE 0 END)")
      .mkString("(", " + ", ")")

  /** Spark-side prepared embedding table: (vec_id, label, qv, nrm). */
  def prepared(embeddings: DataFrame): DataFrame =
    embeddings
      .withColumn("qv", expr(quantizeExpr))
      .withColumn("nrm", expr(normExpr))
      .select(col("vec_id"), col("label"), col("qv"), col("nrm"))

  /** DuckDB twin of [[prepared]] as a CTE body. */
  val preparedSql: String =
    s"""SELECT vec_id, label, qv, $normSql AS nrm
       |FROM (SELECT vec_id, label, $quantizeSql AS qv FROM embeddings) q0""".stripMargin
}
