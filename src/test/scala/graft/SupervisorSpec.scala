package graft

import java.nio.file.Files
import java.sql.Timestamp
import java.time.LocalDate

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ingest.CandleCore
import graft.schema.Tick
import graft.streaming.{CandleStream, Supervisor, TransientFault}

/** A19 retry/reconnect control (main.go:46-60, process.go:43-49): the
  * supervisor's POLICY (budget, fixed-backoff schedule, give-up rethrow)
  * and the end-to-end recovery claim — a run whose first attempt dies
  * mid-micro-batch must produce byte-identical output to an
  * uninterrupted run, because checkpoint offsets + state store + the
  * file sink's commit log make the replayed batch exactly-once.
  */
class SupervisorSpec extends SparkSuite {

  private val D = LocalDate.of(2024, 12, 6)

  private def tick(sec: Int, time: String, last: Double, qty: Long,
      no: Long, open: Double = 0d): Tick =
    Tick(secId = sec, secCode = s"SEC$sec", ts = Timestamp.valueOf(s"2024-12-06 $time"),
      time = time, last = last, open = open, quantity = qty, tickNo = no)

  private val batch1 = Seq(
    tick(1, "10:00:10", 101.0, 5, 1),
    tick(1, "10:00:20", 103.0, 2, 2),
    tick(2, "10:00:15", 55.0, 4, 3),
    tick(1, "10:01:00", 102.0, 9, 4),
    tick(1, "10:01:10", 105.0, 1, 5, open = 101.5))
  private val batch2 = Seq(
    tick(2, "10:01:00", 56.0, 2, 6),
    tick(1, "10:02:00", 106.0, 4, 7),
    tick(2, "10:02:00", 57.0, 1, 8))

  /** A trivial always-healthy query for the pure-policy tests (the
    * failures come from `work`, standing in for a dropped wire during
    * the drive loop). */
  private def healthyQuery(name: String): StreamingQuery = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Int]
    ms.toDS().writeStream.format("memory").queryName(name).start()
  }

  test("policy: clean run is one attempt, zero restarts, zero sleeps") {
    val sleeps = ArrayBuffer.empty[java.time.Duration]
    var starts = 0
    val out = Supervisor.run(
      () => { starts += 1; healthyQuery("sup_clean") },
      maxRestarts = 10, sleep = sleeps += _)(_ => ())
    assert(out == Supervisor.Outcome(attempts = 1, restarts = 0))
    assert(starts == 1 && sleeps.isEmpty)
  }

  test("policy: a failure while RE-ESTABLISHING the query consumes the budget too") {
    // The reference's ping loop retries connection ESTABLISHMENT, not
    // just an established connection dropping — so a start() that throws
    // (e.g. the checkpoint still held by a half-stopped attempt) must
    // burn a retry and be retried, never escape with the budget unused.
    val sleeps = ArrayBuffer.empty[java.time.Duration]
    var startFailuresLeft = 2
    var starts = 0
    val out = Supervisor.run(
      () => {
        starts += 1
        if (startFailuresLeft > 0) {
          startFailuresLeft -= 1
          throw new IllegalStateException("checkpoint still in use")
        }
        healthyQuery("sup_startfail")
      },
      maxRestarts = 10, sleep = sleeps += _)(_ => ())
    assert(out == Supervisor.Outcome(attempts = 3, restarts = 2))
    assert(starts == 3 && sleeps.length == 2)
  }

  test("policy: transient failures burn budget with the fixed backoff, then recover") {
    val sleeps = ArrayBuffer.empty[java.time.Duration]
    var failuresLeft = 2
    val backoff = java.time.Duration.ofSeconds(3)
    val out = Supervisor.run(
      () => healthyQuery("sup_transient"),
      maxRestarts = 10, backoff = backoff, sleep = sleeps += _) { _ =>
      if (failuresLeft > 0) {
        failuresLeft -= 1
        throw new java.io.IOException("wire dropped")
      }
    }
    assert(out == Supervisor.Outcome(attempts = 3, restarts = 2))
    // the reference sleeps a FIXED 3 s between pings (main.go:52) — the
    // schedule is flat, one sleep per restart
    assert(sleeps.toSeq == Seq(backoff, backoff))
  }

  test("policy: exhausting the budget rethrows the last failure (main.go:58-60 exit)") {
    val sleeps = ArrayBuffer.empty[java.time.Duration]
    var starts = 0
    val e = intercept[java.io.IOException] {
      Supervisor.run(
        () => { starts += 1; healthyQuery("sup_fatal") },
        maxRestarts = 3, backoff = java.time.Duration.ZERO,
        sleep = sleeps += _) { _ =>
        throw new java.io.IOException(s"wire dead (attempt $starts)")
      }
    }
    // budget of 3 restarts = 4 attempts, a sleep before each restart
    assert(starts == 4 && sleeps.size == 3)
    assert(e.getMessage == "wire dead (attempt 4)")
  }

  test("recovery: a mid-micro-batch kill + supervised restart emits exactly the uninterrupted rows") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val ms = MemoryStream[Tick]
    val outDir = Files.createTempDirectory("sup_rec_out").toString
    val ckDir = Files.createTempDirectory("sup_rec_ck").toString
    val key = s"supervisor-spec|$outDir"
    TransientFault.arm(key, 1)

    val batches = Seq(batch1, batch2)
    var fed = 0
    val out = Supervisor.run(
      () => CandleStream.sinkToParquet(
        CandleStream.candles(
          ms.toDS().map { t => TransientFault.tripwire(key); t }, D),
        outDir, ckDir),
      maxRestarts = 10, backoff = java.time.Duration.ZERO,
      sleep = _ => ()) { q =>
      while (fed < batches.length) {
        ms.addData(batches(fed)); fed += 1; q.processAllAvailable()
      }
      q.processAllAvailable() // flush a batch whose feed died mid-kill
    }
    // the armed fault MUST have killed the first attempt
    assert(out.restarts >= 1)

    val got = spark.read.parquet(outDir).as[graft.schema.Candle]
      .collect().sortBy(c => (c.secId, c.date.getTime)).toSeq
    val want = (batch1 ++ batch2).groupBy(_.secId).toSeq.flatMap { case (_, ts) =>
      CandleCore.replay(ts.sortBy(t => (t.ts.getTime, t.tickNo)).iterator, D)
    }.sortBy(c => (c.secId, c.date.getTime))
    // row-IDENTICAL, not just row-countish: no duplicates from the
    // replayed batch (sink commit log), no losses from the kill
    // (checkpointed offsets + state)
    assert(got == want)
    assert(got.size == 4)
  }

  test("ticker analog: scheduled rebounce epochs + a mid-epoch kill lose nothing") {
    // process.go:43-49 — the exporter resubscribes every 5 min even when
    // healthy. Three scheduled stop/start epochs over one checkpoint,
    // with a wire fault armed to kill epoch 1 mid-micro-batch; the sink
    // must still hold exactly the uninterrupted rows.
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val ms = MemoryStream[Tick]
    val outDir = Files.createTempDirectory("sup_tick_out").toString
    val ckDir = Files.createTempDirectory("sup_tick_ck").toString
    val key = s"supervisor-ticker|$outDir"

    val epochFeeds = Seq(Seq(batch1), Seq(batch2), Seq.empty)
    val fedByEpoch = scala.collection.mutable.Set.empty[Int]
    val out = Supervisor.rebounce(
      () => CandleStream.sinkToParquet(
        CandleStream.candles(
          ms.toDS().map { t => TransientFault.tripwire(key); t }, D),
        outDir, ckDir),
      epochs = 3, backoff = java.time.Duration.ZERO, sleep = _ => ()) {
      (q, i) =>
        if (i == 1 && !fedByEpoch(i)) TransientFault.arm(key, 1)
        if (!fedByEpoch(i)) { epochFeeds(i).foreach(ms.addData(_)); fedByEpoch += i }
        q.processAllAvailable()
    }
    assert(out.restarts == 1) // the one injected kill, re-entering epoch 1
    assert(out.attempts == 4) // 3 scheduled epochs + 1 recovery re-entry

    val got = spark.read.parquet(outDir).as[graft.schema.Candle]
      .collect().sortBy(c => (c.secId, c.date.getTime)).toSeq
    val want = (batch1 ++ batch2).groupBy(_.secId).toSeq.flatMap { case (_, ts) =>
      CandleCore.replay(ts.sortBy(t => (t.ts.getTime, t.tickNo)).iterator, D)
    }.sortBy(c => (c.secId, c.date.getTime))
    assert(got == want && got.size == 4)
  }

  test("tripwire: budget exhausts — later passes are clean no-ops") {
    TransientFault.arm("sup_tw", 2)
    intercept[java.io.IOException](TransientFault.tripwire("sup_tw"))
    intercept[java.io.IOException](TransientFault.tripwire("sup_tw"))
    TransientFault.tripwire("sup_tw") // budget spent: silent
    TransientFault.tripwire("sup_tw_never_armed") // unarmed: silent
  }
}
