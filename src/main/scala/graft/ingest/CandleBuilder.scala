package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.schema.{Candle, Tick}

/** A16 — the reference's one genuinely stateful transform: per-security
  * tick→1-minute-OHLCV candle construction
  * (/root/reference/process.go:126-169, state map main.go:26).
  *
  * Two ports, per SURVEY §2.A16:
  *
  *   - [[batchCandles]] — the IDIOMATIC Spark formulation: a tumbling
  *     1-minute hash aggregation. One shuffle on (minute, security); all
  *     five OHLCV measures are partial-aggregatable (min/max of an
  *     (order, value) struct for open/close), so map-side combine runs
  *     before the shuffle and the operator scales linearly. This version
  *     also FIXES the reference's boundary bug: the Go code emits a candle
  *     only when a tick lands exactly on :00, silently dropping minutes
  *     whose boundary tick never arrives; the window agg emits every
  *     non-empty minute.
  *
  *   - [[CandleCore]] — the SEMANTICS-EXACT port of the Go state machine
  *     (zero-price guards, emit-on-":00"-tick, post-emit zero-state with
  *     `Open` refreshed from the wire `open` field, boundary drop), used by
  *     the streaming `flatMapGroupsWithState` pipeline
  *     ([[graft.streaming.CandleStream]]) and verified against hand-computed
  *     sequences plus batch parity in the test suite.
  */
object CandleBuilder {

  /** Minute floor (= ClickHouse toStartOfInterval(t, 1 MINUTE)). */
  private def minuteFloor(c: Column): Column =
    timestamp_seconds(unix_seconds(c) - pmod(unix_seconds(c), lit(60L)))

  /** Tumbling 1-minute OHLCV over a tick table with columns
    * (sec_code, tick_no, last, quantity, ts). Guards mirror process.go:
    * open/low consider only nonzero prices (147-155); volume sums every
    * tick's quantity (156); minutes with no priced tick are dropped.
    *
    * Arrival order = (ts, tick_no), PACKED into one DECIMAL(38,0) — the
    * same `epoch·10^17 + tick_no` packing the DuckDB twin uses as
    * HUGEINT (tick_no < 10^17 by construction, so it is collision-free
    * and order-preserving). Why packed and not a struct: min/max of a
    * struct pushes the whole aggregate onto SortAggregate (struct
    * buffers aren't fixed-width — the [[graft.ingest.Dedup]] lesson),
    * while min_by/max_by over a decimal ordering keeps every measure on
    * the partial-aggregated HASH path (null ordering rows — unpriced
    * ticks — are skipped by max_by/min_by semantics).
    */
  def batchCandles(ticks: DataFrame): DataFrame = {
    val ord = when(col("last") > 0, expr(
      "CAST(CAST(unix_seconds(ts) AS DECIMAL(38,0)) * 100000000000000000 + tick_no AS DECIMAL(38,0))"))
    ticks
      .groupBy(minuteFloor(col("ts")).as("date"), col("sec_code"))
      .agg(
        min_by(col("last"), ord).as("open"),
        max_by(col("last"), ord).as("close"),
        max(when(col("last") > 0, col("last"))).as("high"),
        min(when(col("last") > 0, col("last"))).as("low"),
        sum(col("quantity")).as("volume"))
      .filter(col("open").isNotNull)
      .select(col("date"), col("sec_code"), lit(1).as("period"),
        col("open"), col("close"), col("high"), col("low"), col("volume"))
  }

  /** DuckDB twin of [[batchCandles]] (expects a `ticks` CTE in scope).
    * Arrival order packs (second, tick_no) into a HUGEINT — tick_no stays
    * below 1e17 by construction, so the packing is collision-free.
    */
  val batchCandlesSql: String =
    """SELECT date, sec_code, 1 AS period,
      |  arg_min(last, ord) FILTER (WHERE last > 0) AS open,
      |  arg_max(last, ord) FILTER (WHERE last > 0) AS close,
      |  max(last) FILTER (WHERE last > 0) AS high,
      |  min(last) FILTER (WHERE last > 0) AS low,
      |  CAST(sum(quantity) AS BIGINT) AS volume
      |FROM (SELECT make_timestamp((CAST(epoch(ts) AS BIGINT) - ((CAST(epoch(ts) AS BIGINT) % 60) + 60) % 60) * 1000000) AS date,
      |             sec_code, last, quantity,
      |             CAST(epoch(ts) AS HUGEINT) * 100000000000000000 + tick_no AS ord
      |      FROM ticks) t
      |GROUP BY date, sec_code
      |HAVING count(*) FILTER (WHERE last > 0) > 0""".stripMargin
}

/** The exact Go state machine. One instance of [[CandleState]] corresponds
  * to one entry of the `quotationCandles` map (main.go:26); `step` is one
  * iteration of the quotation loop (process.go:129-166).
  */
object CandleCore {

  /** `commands.Candle` zero value + map-membership flag. */
  final case class CandleState(
      open: Double, high: Double, low: Double, volume: Long)

  val Zero: CandleState = CandleState(0d, 0d, 0d, 0L)

  /** One tick through the state machine.
    *
    * @param state  None = no map entry yet (first tick for this security)
    * @param today  the process-local date used for the emitted candle's
    *               `date` (the Go code stamps time.Now's date, process.go:133)
    * @return (next state, emitted candle if the tick closed a minute)
    */
  def step(state: Option[CandleState], t: Tick, today: java.time.LocalDate)
      : (CandleState, Option[Candle]) = state match {
    // emit path (process.go:131-144): boundary tick + positive price + entry exists
    case Some(s) if t.time.endsWith(":00") && t.last > 0 =>
      val date = java.sql.Timestamp.valueOf(
        java.time.LocalDateTime.of(today, java.time.LocalTime.parse(t.time)))
      val candle = Candle(date, t.secId, t.secCode, period = 1,
        open = s.open, close = t.last, high = s.high, low = s.low, volume = s.volume)
      // state is reset to the zero candle but REMAINS in the map
      (Zero, Some(candle))
    // update path (process.go:146-156)
    case Some(s) =>
      val open = if (s.open == 0 && t.open != 0) t.open else s.open
      val high = if (t.last > s.high) t.last else s.high
      val low = if (t.last < s.low || s.low == 0) t.last else s.low
      (CandleState(open, high, low, s.volume + t.quantity), None)
    // init path (process.go:157-164): first tick ever seeds from `last`
    case None =>
      (CandleState(t.last, t.last, t.last, t.quantity), None)
  }

  /** Run a whole (already arrival-ordered) tick sequence for ONE security
    * through the machine — the batch-replay form used by
    * `flatMapGroups`/tests. The trailing partial candle is discarded, as the
    * reference's in-memory state is on process exit.
    */
  def replay(ticks: Iterator[Tick], today: java.time.LocalDate): Iterator[Candle] = {
    var state: Option[CandleState] = None
    ticks.flatMap { t =>
      val (next, out) = step(state, t, today)
      state = Some(next)
      out.iterator
    }
  }
}
