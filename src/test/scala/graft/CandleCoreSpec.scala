package graft

import java.sql.Timestamp
import java.time.LocalDate

import graft.ingest.CandleCore
import graft.ingest.CandleCore.CandleState
import graft.schema.Tick

/** A16 state-machine spec vs hand-computed sequences
  * (/root/reference/process.go:126-169; SURVEY §5.2): first-tick init,
  * zero-price guards, emit-on-:00, post-emit zero state (open from the
  * wire `open` field), boundary-tick drop.
  */
class CandleCoreSpec extends SparkSuite {

  private val D = LocalDate.of(2024, 12, 6)
  private var n = 0L
  private def tick(time: String, last: Double, qty: Long, open: Double = 0d): Tick = {
    n += 1
    Tick(secId = 1, secCode = "SBER", ts = Timestamp.valueOf(s"2024-12-06 $time"),
      time = time, last = last, open = open, quantity = qty, tickNo = n)
  }

  test("first tick initializes state from last, no emit — even on :00") {
    val (s1, e1) = CandleCore.step(None, tick("10:00:00", 101.0, 5), D)
    assert(e1.isEmpty) // map entry didn't exist → init branch (process.go:157)
    assert(s1 == CandleState(101.0, 101.0, 101.0, 5))
  }

  test("updates accumulate high/low/volume; open stays") {
    val s0 = CandleState(101.0, 101.0, 101.0, 5)
    val (s1, e1) = CandleCore.step(Some(s0), tick("10:00:10", 103.0, 2), D)
    assert(e1.isEmpty && s1 == CandleState(101.0, 103.0, 101.0, 7))
    val (s2, _) = CandleCore.step(Some(s1), tick("10:00:20", 99.0, 1), D)
    assert(s2 == CandleState(101.0, 103.0, 99.0, 8))
  }

  test("zero-price tick zeroes low (process.go:153 guard) and next positive restores") {
    val s0 = CandleState(101.0, 103.0, 99.0, 8)
    val (s1, _) = CandleCore.step(Some(s0), tick("10:00:30", 0.0, 4), D)
    assert(s1 == CandleState(101.0, 103.0, 0.0, 12)) // 0 < 99 → low := 0
    val (s2, _) = CandleCore.step(Some(s1), tick("10:00:40", 100.0, 1), D)
    assert(s2 == CandleState(101.0, 103.0, 100.0, 13)) // low==0 → low := last
  }

  test(":00 tick with positive last emits candle and resets to zero state") {
    val s0 = CandleState(101.0, 103.0, 99.0, 8)
    val (s1, e1) = CandleCore.step(Some(s0), tick("10:01:00", 102.0, 9), D)
    assert(s1 == CandleCore.Zero)
    val c = e1.get
    assert(c.date == Timestamp.valueOf("2024-12-06 10:01:00"))
    assert(c.open == 101.0 && c.close == 102.0 && c.high == 103.0 && c.low == 99.0)
    assert(c.volume == 8) // the boundary tick's qty is NOT added (process.go:134-143)
    assert(c.period == 1 && c.secCode == "SBER")
  }

  test(":00 tick with zero last does NOT emit (falls through to update)") {
    val s0 = CandleState(101.0, 103.0, 99.0, 8)
    val (s1, e1) = CandleCore.step(Some(s0), tick("10:01:00", 0.0, 3), D)
    assert(e1.isEmpty)
    assert(s1 == CandleState(101.0, 103.0, 0.0, 11))
  }

  test("post-emit zero state refreshes open from the wire open field, not last") {
    val (s1, e1) = CandleCore.step(Some(CandleCore.Zero),
      tick("10:01:05", 104.0, 2, open = 100.5), D)
    assert(e1.isEmpty)
    // open ← q.Open (process.go:147-149); high/low ← last; volume += qty
    assert(s1 == CandleState(100.5, 104.0, 104.0, 2))
  }

  test("replay: full sequence drops the trailing partial candle") {
    val ticks = Iterator(
      tick("10:00:10", 101.0, 5),
      tick("10:00:20", 103.0, 2),
      tick("10:01:00", 102.0, 9), // emits candle 1
      tick("10:01:10", 105.0, 1, open = 101.5),
      tick("10:02:00", 106.0, 4), // emits candle 2
      tick("10:02:30", 90.0, 7)) // trailing partial — dropped
    val out = CandleCore.replay(ticks, D).toSeq
    assert(out.size == 2)
    assert(out.head.open == 101.0 && out.head.close == 102.0 && out.head.volume == 7)
    val c2 = out(1)
    // after reset: open from wire open, high/low from the 10:01:10 tick
    assert(c2.open == 101.5 && c2.high == 105.0 && c2.low == 105.0 &&
      c2.close == 106.0 && c2.volume == 1)
  }

  test("minute with no boundary tick is silently dropped (the reference bug)") {
    val ticks = Iterator(
      tick("10:00:10", 101.0, 5),
      tick("10:00:59", 103.0, 2),
      // no :00 tick for 10:01 — 10:00's candle is never emitted
      tick("10:01:30", 104.0, 1),
      tick("10:02:00", 105.0, 2)) // emits one merged candle spanning both minutes
    val out = CandleCore.replay(ticks, D).toSeq
    assert(out.size == 1)
    assert(out.head.volume == 8 && out.head.open == 101.0 && out.head.high == 104.0)
  }
}
