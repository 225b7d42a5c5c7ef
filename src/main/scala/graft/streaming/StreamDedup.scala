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
    * suppression state bounded by `delay`. Works on streaming and batch
    * frames (on batch it degrades to a plain per-key first pick).
    */
  def firstWriteWins(df: DataFrame, tsCol: String, delay: String,
      keys: Seq[String]): DataFrame =
    df.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark(keys)
}
