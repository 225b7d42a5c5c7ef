package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CollapsingMergeTree / VersionedCollapsingMergeTree read paths — the
  * remaining members of the reference's MergeTree engine family
  * (db.go:31 tables are ReplacingMergeTree; Collapsing is the sibling
  * engine a mutating feed would use: each state UPDATE writes a cancel
  * row `sign = -1` mirroring the old state plus a new state row
  * `sign = +1`, and rows annihilate pairwise at merge).
  *
  * Semantics implemented are the USER-LEVEL `FINAL` read: per sorting
  * key, a net sign of +1 resolves to the latest state row, a net of 0
  * to no row at all. ClickHouse's documented merge algorithm has two
  * extra cases ("write the first cancel row", "write both") that exist
  * only because its merges are INCREMENTAL over arbitrary part subsets
  * — a one-shot distributed collapse never materializes those
  * intermediate states, so this engine doesn't reproduce them.
  *
  * Scale design mirrors [[Dedup]]: ONE partial-aggregated hash
  * aggregation per collapse (map-side combine before the single
  * key-hash exchange, fixed-width buffers via [[Dedup.maxByAgg]] so
  * HashAggregateExec applies — no window, no global sort). The
  * versioned variant pays a second, already-collapsed aggregation to
  * pick the live version. The sign-weighted AGGREGATE-WITHOUT-FINAL
  * idiom (`sum(metric * sign)`) needs no collapse at all and is
  * registered separately (`qx_collapsing_turnover`) — at 100 TB that
  * is the shape dashboards should read, because it stays a pure
  * map-side partial aggregate no matter how many corrections exist.
  */
object Collapse {

  /** CollapsingMergeTree `FINAL`: keep the latest (max `seq`) state row
    * of every key whose signs sum positive; fully-cancelled keys
    * disappear. `seq` is arrival order (unique within a key) — exactly
    * the trust model of ClickHouse's unversioned engine, which is why
    * the cancel row must arrive AFTER the state it cancels.
    * Payload columns must be fixed-width (or `packCols`-declared short
    * ASCII strings) — the [[Dedup]] family documents the payload-shape
    * spectrum; this is the columnar all-hash point of it.
    */
  def finalState(df: DataFrame, keys: Seq[String], sign: String, seq: String,
      packCols: Set[String] = Set.empty): DataFrame = {
    val others =
      df.columns.filterNot(keys.contains).filter(c => c != sign && c != seq).toSeq
    // cancels never win: their ordering key is NULL, which max_by skips
    val ord = s"CASE WHEN $sign = 1 THEN $seq END"
    val aggs = others.map(o => Dedup.maxByAgg(o, ord, packCols(o)).as(o)) :+
      sum(col(sign)).as("_net")
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
      .filter(col("_net") >= 1)
      .select((keys ++ others).map(col): _*)
  }

  /** VersionedCollapsingMergeTree `FINAL`: cancel/state pairs annihilate
    * on (key, `version`) REGARDLESS of arrival order — the out-of-order
    * feed case the unversioned engine cannot handle. Two hash
    * aggregations: (1) per (key, version) the exact-duplicate pair
    * collapses (`max` carries the payload — the write contract makes the
    * cancel byte-identical to its state modulo sign) and only net = +1
    * versions survive; (2) per key the max surviving version is the
    * live row. Net = -1 survivors (a cancel whose state row is still in
    * flight) are in-flight bookkeeping, not final states — excluded.
    */
  def versionedFinal(df: DataFrame, keys: Seq[String], sign: String,
      version: String, packCols: Set[String] = Set.empty): DataFrame = {
    val others = df.columns.filterNot(keys.contains)
      .filter(c => c != sign && c != version).toSeq
    // within a (key, version) group the payload is constant, so any
    // deterministic pick works; max_by over `sign` keeps string columns
    // on the packed fixed-width buffer (plain max(string) would push
    // the whole aggregation to SortAggregate)
    val stage1 = others.map(o => Dedup.maxByAgg(o, sign, packCols(o)).as(o)) :+
      sum(col(sign)).as("_net")
    val live = df.groupBy((keys :+ version).map(col): _*)
      .agg(stage1.head, stage1.tail: _*)
      .filter(col("_net") === 1)
    val stage2 = others.map(o => Dedup.maxByAgg(o, version, packCols(o)).as(o)) :+
      max(col(version)).as(version)
    live.groupBy(keys.map(col): _*).agg(stage2.head, stage2.tail: _*)
      .select((keys ++ others :+ version).map(col): _*)
  }
}
