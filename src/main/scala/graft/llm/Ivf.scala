package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF coarse-quantizer machinery (builder brief: similarity search, the
  * "IVF or LSH-bucketed variant as the scale path"): K centroids partition
  * the corpus into inverted lists; a query probes only its nprobe nearest
  * lists, so exact scoring touches ~nprobe/K of the corpus.
  *
  * THE 100 TB ASSIGNMENT SHAPE (round-3 verdict fix): nearest-centroid
  * assignment is a single `groupBy(vec_id)` HASH aggregate over the N×K
  * scored stream — `max_by(cent_id, key)` partial-aggregates to ONE row
  * per vector map-side before the exchange (a 16× shuffle cut vs the old
  * `row_number()` window, which shuffled and sorted all N×K rows), and the
  * N×K stream is never cached or materialized. The ordering key packs
  * (cosine, tiebreak) into one BIGINT — see [[packedKeySqlOf]] — because a
  * struct ordering would push `max_by` off the fixed-width fast path into
  * SortAggregate (the [[graft.ingest.Dedup]] lesson).
  *
  * Probe selection (top-nprobe centroids per QUERY) runs the same scored
  * stream filtered to the query set — numQueries×K rows, collapsed by a
  * tiny per-query collect+sort (K elements per group).
  *
  * Lloyd training ([[lloydIter]]): the codebook is trained IN-ENGINE with
  * deterministic k-means iterations — assignment is the same hash
  * aggregate (carrying `qv` as a grouping key, so no join back to the
  * corpus), and the new centroid is the per-dimension floor-mean,
  * re-quantized to BIGINT so both engines stay bit-identical. Each
  * iteration is two hash aggregates over N·Dim exploded components; the
  * result is K rows, broadcast into the next pass.
  */
object Ivf {

  /** 2^40 — the cosine quantum for the packed ordering key. */
  private val KeyScale = "1099511627776"

  /** One-BIGINT ordering key `floor(cos·2^40)·K + (K-1-cent_id)`:
    * max-by(key) = max cosine at 2^-40 resolution, ties broken toward the
    * LOWEST cent_id. Exact in both engines (the cosine doubles are
    * IEEE-identical, floor/cast/integer arithmetic shared-dialect), unique
    * per (vector, centroid) row, and fixed-width — which is what keeps the
    * assignment aggregate on HashAggregateExec.
    */
  def packedKeySqlOf(ccos: String, numCent: Int): String =
    s"CAST(floor($ccos * $KeyScale) AS BIGINT) * $numCent + (${numCent - 1} - cent_id)"

  // ---- codebook init: K corpus vectors starting at `off` ----

  /** Deterministic init: corpus vectors [off, off+k). Callers pass
    * off = numQueries so the query block NEVER seeds the codebook — a
    * query that IS a centroid retrieves its own list trivially, which
    * masks codebook quality (measured: recall@3 looked perfect with
    * overlapping init and dropped to the honest ~30% once disjoint;
    * Lloyd training then lifts it to ~40% — IvfSpec pins that ordering).
    */
  def initCent(emb: DataFrame, k: Int, off: Int): DataFrame =
    emb.filter(col("vec_id") >= off && col("vec_id") < off + k)
      .select((col("vec_id") - off).cast("int").as("cent_id"), col("qv").as("cqv"),
        col("nrm").as("cnrm"))

  def initCentSql(k: Int, off: Int): String =
    s"SELECT CAST(vec_id - $off AS INT) AS cent_id, qv AS cqv, nrm AS cnrm " +
      s"FROM emb WHERE vec_id >= $off AND vec_id < ${off + k}"

  // ---- scored stream: (vec_id, cent_id, packed key), never materialized ----

  private def scored(emb: DataFrame, cent: DataFrame, numCent: Int,
      carryQv: Boolean): DataFrame = {
    // zero-norm guard: a vector (or centroid) that quantizes to all-zeros
    // makes the cosine NaN, and CAST(floor(NaN) AS BIGINT) silently
    // yields 0 in Spark but ERRORS in the DuckDB oracle — exclude such
    // rows from assignment in BOTH engines (the SQL twins carry the same
    // predicates); a zero vector has no meaningful cosine neighbors.
    val base = emb.filter(col("nrm") > 0)
      .join(broadcast(cent.filter(col("cnrm") > 0)), lit(true))
      .withColumn("ccos",
        expr(Embed.cosineSql(Embed.dotExpr("cqv", "qv"), "cnrm", "nrm")))
      .withColumn("ck", expr(packedKeySqlOf("ccos", numCent)))
    val cols = Seq(col("vec_id"), col("cent_id"), col("ck")) ++
      (if (carryQv) Seq(col("qv")) else Nil)
    base.select(cols: _*)
  }

  // ---- search: assign + probe + rescore ----

  /** Nearest-centroid assignment on the 100 TB shape (scaladoc above):
    * one hash aggregate over the never-materialized N×K scored stream.
    * Shared by [[search]] and the semantic-dedup operator.
    */
  def assign(emb: DataFrame, cent: DataFrame, numCent: Int): DataFrame =
    scored(emb, cent, numCent, carryQv = false)
      .groupBy("vec_id").agg(max_by(col("cent_id"), col("ck")).as("cent_id"))

  /** DuckDB twin of [[assign]]: `keyed` + `assign` CTEs reading CTEs
    * `emb` (vec_id, qv, nrm) and `cent` (cent_id, cqv, cnrm).
    */
  def assignCtesSql(numCent: Int): String = {
    val assignCos = Embed.cosineSql(Embed.dotSql("cqv", "qv"), "cnrm", "nrm")
    s"""keyed AS (SELECT vec_id, cent_id, ${packedKeySqlOf("ccos", numCent)} AS ck FROM (
       |    SELECT vec_id, cent_id, $assignCos AS ccos FROM emb, cent
       |    WHERE nrm > 0 AND cnrm > 0) s0),
       |assign AS (SELECT vec_id, arg_max(cent_id, ck) AS cent_id FROM keyed GROUP BY vec_id)""".stripMargin
  }

  /** IVF top-N search over a prepared embedding table against a (small)
    * centroid table. Assignment/probing per the scaladoc above; rescoring
    * is exact cosine on the probed lists only, top-N per query via a
    * window over the (bounded) candidate set.
    */
  def search(emb: DataFrame, cent: DataFrame, numCent: Int, numQueries: Int,
      nprobe: Int, topN: Int): DataFrame = {
    val sc = scored(emb, cent, numCent, carryQv = false)
    val assigned = assign(emb, cent, numCent)
    val probes = sc.filter(col("vec_id") < numQueries)
      .groupBy("vec_id")
      .agg(slice(array_sort(collect_list(struct((-col("ck")).as("nk"),
        col("cent_id")))), 1, nprobe).as("top"))
      .select(col("vec_id").as("query_id"), explode(col("top.cent_id")).as("cent_id"))
    // probes is numQueries×nprobe rows — broadcast it so the corpus-wide
    // assignment table never shuffles
    val cand = assigned.join(broadcast(probes), "cent_id")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"))
    cand
      .join(emb.select(col("vec_id").as("query_id"), col("qv").as("qqv"),
        col("nrm").as("qnrm")), "query_id")
      .join(emb.select(col("vec_id"), col("qv"), col("nrm")), "vec_id")
      .withColumn("cos_sim",
        expr(Embed.cosineSql(Embed.dotExpr("qqv", "qv"), "qnrm", "nrm")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col("vec_id"))))
      .filter(col("rank") <= topN)
      .select(col("query_id"), col("vec_id"), col("cos_sim"),
        col("rank").cast("long").as("rank"))
      .orderBy("query_id", "rank")
  }

  /** DuckDB twin of [[search]]: CTE chain + final SELECT, assuming CTEs
    * `emb` (vec_id, qv, nrm) and `cent` (cent_id, cqv, cnrm) are in scope.
    * The oracle keeps its window formulation — ordered by the SAME packed
    * key, so both engines resolve near-ties identically.
    */
  def searchSql(numCent: Int, numQueries: Int, nprobe: Int, topN: Int): String = {
    val rescoreCos = Embed.cosineSql(Embed.dotSql("qq.qv", "cc.qv"), "qq.nrm", "cc.nrm")
    s"""${assignCtesSql(numCent)},
       |probes AS (SELECT vec_id AS query_id, cent_id FROM (
       |    SELECT vec_id, cent_id, row_number() OVER (PARTITION BY vec_id ORDER BY ck DESC) AS rn
       |    FROM keyed WHERE vec_id < $numQueries) r WHERE rn <= $nprobe),
       |cand AS (SELECT p.query_id, a.vec_id FROM probes p
       |         JOIN assign a ON a.cent_id = p.cent_id
       |         WHERE a.vec_id != p.query_id),
       |rescored AS (SELECT c.query_id, c.vec_id, $rescoreCos AS cos_sim
       |  FROM cand c JOIN emb qq ON qq.vec_id = c.query_id
       |              JOIN emb cc ON cc.vec_id = c.vec_id),
       |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS rank
       |           FROM rescored)
       |SELECT query_id, vec_id, cos_sim, rank FROM ranked
       |WHERE rank <= $topN ORDER BY query_id, rank""".stripMargin
  }

  // ---- Lloyd iteration ----

  /** One deterministic k-means step: nearest-centroid assignment (hash
    * aggregate; `qv` rides in the GROUPING key — grouping keys may be
    * variable-length, only the buffer must be fixed-width — so the
    * centroid update needs no join back to the corpus), then per-dimension
    * floor-mean re-quantized to BIGINT. A cluster that captures no vectors
    * drops out of the next codebook (both engines identically).
    */
  def lloydIter(emb: DataFrame, cent: DataFrame, numCent: Int): DataFrame = {
    val assign = scored(emb, cent, numCent, carryQv = true)
      .groupBy("vec_id", "qv").agg(max_by(col("cent_id"), col("ck")).as("cent_id"))
    assign.select(col("cent_id"), posexplode(col("qv")).as(Seq("pos", "x")))
      .groupBy("cent_id", "pos")
      .agg(expr("CAST(floor(CAST(sum(x) AS DOUBLE) / count(1)) AS BIGINT)").as("c"))
      .groupBy("cent_id")
      .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("pc"))
      .select(col("cent_id"), col("pc.c").as("cqv"))
      .withColumn("cnrm", expr(Embed.normExprOf("cqv")))
  }

  /** DuckDB twin of [[lloydIter]]: CTEs deriving `$next` (cent_id, cqv,
    * cnrm) from `emb` and `$prev`. Component positions are 1-based here
    * vs 0-based posexplode — only the ordering matters.
    */
  def lloydIterSql(prev: String, next: String, numCent: Int): String = {
    val assignCos = Embed.cosineSql(Embed.dotSql("cqv", "qv"), "cnrm", "nrm")
    s"""keyed_$next AS (SELECT vec_id, cent_id, ${packedKeySqlOf("ccos", numCent)} AS ck FROM (
       |    SELECT e.vec_id, c.cent_id, $assignCos AS ccos FROM emb e, $prev c
       |    WHERE e.nrm > 0 AND c.cnrm > 0) s0),
       |comp_$next AS (SELECT a.cent_id, i.i AS pos, e.qv[i.i] AS x
       |  FROM (SELECT vec_id, arg_max(cent_id, ck) AS cent_id
       |        FROM keyed_$next GROUP BY vec_id) a
       |  JOIN emb e ON e.vec_id = a.vec_id, range(1, ${Embed.Dim + 1}) i(i)),
       |$next AS (SELECT cent_id, cqv, ${Embed.normSqlOf("cqv")} AS cnrm FROM (
       |    SELECT cent_id, list(c ORDER BY pos) AS cqv FROM (
       |      SELECT cent_id, pos, CAST(floor(CAST(sum(x) AS DOUBLE) / count(*)) AS BIGINT) AS c
       |      FROM comp_$next GROUP BY cent_id, pos) cc GROUP BY cent_id) l)""".stripMargin
  }
}
