package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hot-key mitigation for 100 TB aggregations (SURVEY §7.7): a handful of
  * instruments dominate real trade flow (index heavyweights), so a plain
  * `groupBy(sec_code)` concentrates those keys on single reducers. The
  * two-stage salted form spreads each key over `buckets` sub-keys, does
  * the heavy partial aggregation at full parallelism, then re-aggregates
  * the per-salt partials — the second shuffle carries only
  * |keys| × buckets rows.
  *
  * AQE's skew-join splitting handles skewed JOINS at runtime; salting is
  * the complementary tool for skewed AGGREGATIONS, where the partial
  * aggregate itself must parallelize.
  *
  * Only algebraic (re-aggregatable) measures qualify: sum/count/min/max.
  */
object Salt {

  /** Deterministic salt from row content (no rand(): retries and the
    * DuckDB oracle both need stable assignment).
    */
  def saltCol(entropy: Column, buckets: Int): Column =
    pmod(hash(entropy), lit(buckets))

  /** Two-stage salted sum: equivalent to
    * `df.groupBy(keys).agg(sum(value))` for any data distribution.
    */
  def saltedSum(df: DataFrame, keys: Seq[String], value: String,
      entropy: Column, buckets: Int = 32): DataFrame = {
    val keyCols = keys.map(col)
    df.withColumn("_salt", saltCol(entropy, buckets))
      .groupBy(keyCols :+ col("_salt"): _*)
      .agg(sum(col(value)).as("_partial"))
      .groupBy(keyCols: _*)
      .agg(sum(col("_partial")).as(s"sum_$value"))
  }
}
