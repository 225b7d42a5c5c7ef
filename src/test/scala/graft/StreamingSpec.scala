package graft

import java.nio.file.Files
import java.sql.Timestamp
import java.time.LocalDate

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ingest.CandleCore
import graft.schema.Tick
import graft.streaming.CandleStream

/** A1/A5/A16 end-to-end streaming parity (SURVEY §5.4): MemoryStream of
  * ticks → keyed candle state → sink; output must equal a single-pass
  * [[CandleCore.replay]] over the same per-security arrival order —
  * including state carried ACROSS micro-batches.
  */
class StreamingSpec extends SparkSuite {

  private val D = LocalDate.of(2024, 12, 6)

  private def tick(sec: Int, time: String, last: Double, qty: Long,
      no: Long, open: Double = 0d): Tick =
    Tick(secId = sec, secCode = s"SEC$sec", ts = Timestamp.valueOf(s"2024-12-06 $time"),
      time = time, last = last, open = open, quantity = qty, tickNo = no)

  // batch 1 ends mid-minute: the 10:01 candle's state must survive the
  // micro-batch boundary
  private val batch1 = Seq(
    tick(1, "10:00:10", 101.0, 5, 1),
    tick(1, "10:00:20", 103.0, 2, 2),
    tick(2, "10:00:15", 55.0, 4, 3),
    tick(1, "10:01:00", 102.0, 9, 4), // emits sec1 candle 1
    tick(1, "10:01:10", 105.0, 1, 5, open = 101.5))
  private val batch2 = Seq(
    tick(2, "10:01:00", 56.0, 2, 6), // emits sec2 candle 1
    tick(1, "10:02:00", 106.0, 4, 7), // emits sec1 candle 2 (cross-batch state)
    tick(2, "10:02:00", 57.0, 1, 8)) // emits sec2 candle 2

  test("MemoryStream → flatMapGroupsWithState → parquet sink ≡ CandleCore.replay") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val ms = MemoryStream[Tick]
    val outDir = Files.createTempDirectory("candles_out").toString
    val ckDir = Files.createTempDirectory("candles_ck").toString
    val query = CandleStream.sinkToParquet(
      CandleStream.candles(ms.toDS(), D), outDir, ckDir)

    ms.addData(batch1)
    query.processAllAvailable()
    ms.addData(batch2)
    query.processAllAvailable()
    query.stop()

    val got = spark.read.parquet(outDir).as[graft.schema.Candle]
      .collect().sortBy(c => (c.secId, c.date.getTime)).toSeq

    val want = (batch1 ++ batch2).groupBy(_.secId).toSeq.flatMap { case (_, ts) =>
      CandleCore.replay(ts.sortBy(t => (t.ts.getTime, t.tickNo)).iterator, D)
    }.sortBy(c => (c.secId, c.date.getTime))

    assert(got == want)
    assert(got.size == 4)
    // cross-batch candle: sec1's 10:02 candle opens from the wire open
    val c = got.find(c => c.secId == 1 && c.date == Timestamp.valueOf("2024-12-06 10:02:00")).get
    assert(c.open == 101.5 && c.close == 106.0 && c.volume == 1)
  }

  test("batch Dataset runs through the same stateful operator") {
    import spark.implicits._
    val ds = (batch1 ++ batch2).toDS()
    val got = CandleStream.candles(ds, D).collect()
      .sortBy(c => (c.secId, c.date.getTime)).toSeq
    // single batch = no cross-batch state, but same per-key ordering ⇒ same
    // result here (all boundary ticks arrive in order within the batch)
    val want = (batch1 ++ batch2).groupBy(_.secId).toSeq.flatMap { case (_, ts) =>
      CandleCore.replay(ts.sortBy(t => (t.ts.getTime, t.tickNo)).iterator, D)
    }.sortBy(c => (c.secId, c.date.getTime))
    assert(got == want)
  }

  test("candlesBatch (lazy partition replay) ≡ stateful operator ≡ replay") {
    import spark.implicits._
    val ds = (batch1 ++ batch2).toDS()
    val key = (c: graft.schema.Candle) => (c.secId, c.date.getTime, c.close)
    val viaBatch = CandleStream.candlesBatch(ds, D).collect().sortBy(key).toSeq
    val viaState = CandleStream.candles(ds, D).collect().sortBy(key).toSeq
    val want = (batch1 ++ batch2).groupBy(_.secId).toSeq.flatMap { case (_, ts) =>
      CandleCore.replay(ts.sortBy(t => (t.ts.getTime, t.tickNo)).iterator, D)
    }.sortBy(key)
    assert(viaBatch == want)
    assert(viaState == want)
  }
}
