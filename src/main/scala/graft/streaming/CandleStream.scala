package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

import graft.ingest.CandleCore
import graft.schema.{Candle, Tick}

/** A1/A5/A16 streaming slice — the reference IS a streaming ETL
  * (/root/reference/process.go:15-67): typed tick stream → per-security
  * keyed state → candle append sink.
  *
  * Scale notes: state is one tiny fixed-size [[CandleCore.CandleState]]
  * per security (the reference's `map[int]commands.Candle`, main.go:26) —
  * thousands of keys, bytes each, far under any state-store pressure;
  * the shuffle is on secId only. The parquet sink appends per micro-batch
  * (at-least-once, like the reference's fire-and-forget AsyncInsert,
  * db.go:12); exactly-once end state comes from the ReplacingMergeTree
  * dedup read path downstream, same as the reference.
  */
object CandleStream {

  /** Exact port of the Go state machine as keyed streaming state. Works on
    * both a streaming and a batch `Dataset[Tick]` (Spark runs
    * flatMapGroupsWithState on batch with empty initial state).
    */
  def candles(ticks: Dataset[Tick], today: java.time.LocalDate): Dataset[Candle] = {
    import ticks.sparkSession.implicits._
    ticks.groupByKey(_.secId)
      .flatMapGroupsWithState[CandleCore.CandleState, Candle](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Int, it: Iterator[Tick], state: GroupState[CandleCore.CandleState]) =>
          var cur: Option[CandleCore.CandleState] = state.getOption
          val out = ArrayBuffer.empty[Candle]
          // The wire guarantees per-security arrival order; group iterators
          // don't, so restore (ts, tickNo) order within the micro-batch.
          it.toSeq.sortBy(t => (t.ts.getTime, t.tickNo)).foreach { t =>
            val (next, candle) = CandleCore.step(cur, t, today)
            cur = Some(next)
            out ++= candle
          }
          cur.foreach(state.update)
          out.iterator
      }
  }

  /** A5 analog: micro-batch append sink. */
  def sinkToParquet(candles: Dataset[Candle], path: String,
      checkpoint: String): StreamingQuery =
    candles.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .start()
}
