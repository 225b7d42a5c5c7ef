package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming complement of the batch [[graft.ingest.Dedup]] read path.
  *
  * ReplacingMergeTree's last-write-wins (db.go:31,47,61,93,106) cannot be
  * replicated exactly on an unbounded stream — "last" needs a total order
  * that never closes. The streaming analog is FIRST-write-wins within a
  * bounded lateness horizon: `dropDuplicatesWithinWatermark` keeps the
  * first row seen per key, suppresses re-deliveries (the at-least-once
  * sink's duplicates, A5) while they can still arrive, and EVICTS a key's
  * suppression state once the watermark passes its event time — so state
  * is O(distinct keys per horizon), not O(stream history). Downstream,
  * the batch dedup read path remains the exactly-once authority, same
  * division of labor as the reference (fire-and-forget insert + merge).
  */
object StreamDedup {

  /** First-write-wins per `keys` over event-time column `tsCol`, with
    * suppression state bounded by `delay`. Streaming frames only:
    * `dropDuplicatesWithinWatermark` has no batch execution (Spark's
    * analyzer rejects it), and silently substituting a different batch
    * semantics here would hide the watermark contract — callers with a
    * batch frame want [[graft.ingest.Dedup]] and are told so loudly.
    */
  def firstWriteWins(df: DataFrame, tsCol: String, delay: String,
      keys: Seq[String]): DataFrame = {
    require(df.isStreaming,
      "firstWriteWins is a streaming operator; use graft.ingest.Dedup for batch frames")
    df.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark(keys)
  }
}
