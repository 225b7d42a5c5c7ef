package graft

import java.nio.file.Files
import java.sql.Timestamp
import java.time.LocalDate

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ingest.CandleCore
import graft.schema.Tick
import graft.streaming.{CandleStream, StreamDedup}

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

  test("checkpoint restart: keyed candle state survives a full query stop/start") {
    // the round-6 recovery proof: not just state ACROSS micro-batches
    // (previous test) but across a QUERY RESTART — the checkpoint's
    // offsets + state store must restore the open candle so the rebooted
    // query emits exactly what an uninterrupted run would (the
    // reference's in-memory map loses this state on process restart;
    // the Spark port does not).
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val ms = MemoryStream[Tick]
    val outDir = Files.createTempDirectory("candles_rs_out").toString
    val ckDir = Files.createTempDirectory("candles_rs_ck").toString

    val q1 = CandleStream.sinkToParquet(
      CandleStream.candles(ms.toDS(), D), outDir, ckDir)
    ms.addData(batch1)
    q1.processAllAvailable()
    q1.stop() // hard stop mid-stream: sec1's 10:01 candle is OPEN state

    // new query object, same checkpoint — recovery path
    val q2 = CandleStream.sinkToParquet(
      CandleStream.candles(ms.toDS(), D), outDir, ckDir)
    ms.addData(batch2)
    q2.processAllAvailable()
    q2.stop()

    val got = spark.read.parquet(outDir).as[graft.schema.Candle]
      .collect().sortBy(c => (c.secId, c.date.getTime)).toSeq
    val want = (batch1 ++ batch2).groupBy(_.secId).toSeq.flatMap { case (_, ts) =>
      CandleCore.replay(ts.sortBy(t => (t.ts.getTime, t.tickNo)).iterator, D)
    }.sortBy(c => (c.secId, c.date.getTime))
    assert(got == want)
    // the candle that PROVES recovery: opened before the stop, emitted after
    val c = got.find(c => c.secId == 1 && c.date == Timestamp.valueOf("2024-12-06 10:02:00")).get
    assert(c.open == 101.5 && c.close == 106.0 && c.volume == 1)
  }

  test("watermarked window port: late ticks drop, on-time windows ≡ batchCandles") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val onTime = Seq(
      tick(1, "10:00:10", 101.0, 5, 1),
      tick(1, "10:00:20", 103.0, 2, 2),
      tick(1, "10:01:05", 105.0, 3, 3))
    val advance1 = Seq(tick(1, "10:02:10", 106.0, 4, 4))
    // watermark is now 10:01:40 (max 10:02:10 − 30 s): this tick is LATE
    val late = tick(1, "10:00:30", 999.0, 100, 5)
    val advance2 = Seq(late, tick(1, "10:03:10", 107.0, 2, 6))
    val flush = Seq(tick(1, "10:10:00", 110.0, 1, 7))

    val ms = MemoryStream[Tick]
    val query = CandleStream.candlesWindowed(ms.toDS(), "30 seconds")
      .writeStream.outputMode("append").format("memory")
      .queryName("wm_candles").start()
    Seq(onTime, advance1, advance2, flush).foreach { b =>
      ms.addData(b); query.processAllAvailable()
    }
    query.stop()

    // finalized windows: 10:00 .. 10:03 (10:10 still open). The late 999
    // tick contributed NOTHING — compare against the batch port over the
    // on-time ticks only.
    val batchTicks = (onTime ++ advance1 ++ advance2.drop(1) ++ flush).toDS()
      .selectExpr("secCode AS sec_code", "tickNo AS tick_no", "last", "quantity", "ts")
    val want = graft.ingest.CandleBuilder.batchCandles(batchTicks)
      .filter($"date" < java.sql.Timestamp.valueOf("2024-12-06 10:04:00"))
      .collect().map(_.toSeq).toSet
    val gotAligned = spark.table("wm_candles")
      .selectExpr("date", "secCode AS sec_code", "period", "open", "close", "high", "low", "volume")
      .collect().map(_.toSeq).toSet
    assert(gotAligned == want, s"got=$gotAligned\nwant=$want")
    // and the drop really happened: window 10:00 kept volume 7, high 103
    val w0 = spark.table("wm_candles")
      .filter($"date" === java.sql.Timestamp.valueOf("2024-12-06 10:00:00"))
      .select("high", "volume").collect()
    assert(w0.length == 1 && w0(0).getDouble(0) == 103.0 && w0(0).getLong(1) == 7L)
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

  test("streaming first-write-wins dedup suppresses re-deliveries across batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val ms = MemoryStream[Tick]
    val query = StreamDedup.firstWriteWins(
        ms.toDS().toDF(), "ts", "30 seconds", Seq("secId", "tickNo"))
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_stream").start()
    // batch A: two originals; batch B: a RE-DELIVERY of tickNo 1 with a
    // different payload (the at-least-once sink's duplicate) + one new
    val a = Seq(tick(1, "10:00:10", 101.0, 5, 1), tick(1, "10:00:20", 103.0, 2, 2))
    val b = Seq(tick(1, "10:00:10", 999.0, 99, 1), tick(1, "10:00:40", 104.0, 1, 3))
    Seq(a, b).foreach { batch => ms.addData(batch); query.processAllAvailable() }
    query.stop()

    val got = spark.table("dedup_stream")
      .select("tickNo", "last").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // one row per key; the duplicate's 999 payload never surfaced
    assert(got == Map(1L -> 101.0, 2L -> 103.0, 3L -> 104.0))
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
