package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.fixtures.Fixtures
import graft.fixtures.Fixtures._

/** The 22 dashboard queries (SURVEY.md §2.B; GD =
  * /root/reference/etc/grafana-dashboard-trades.json). Each is the Spark-first
  * re-expression of one `rawSql` panel query, parameterized with the fixed
  * constants in [[Fixtures]] (the dashboard's `$interval`/`$sec_code`/
  * `$__fromTime` template variables).
  *
  * Scale notes (100 TB readiness):
  *   - securities is a 60-row dim → always `broadcast()` (no shuffle of the
  *     fact side for the join).
  *   - two-level aggregations keep the explicit inner `groupBy` (semantics,
  *     GD:113) but both levels are hash aggregates with map-side partial agg;
  *     the second level re-shuffles on a strictly coarser key.
  *   - top-10s use `orderBy(...).limit(n)` → Catalyst plans
  *     `TakeOrderedAndProject` (per-partition heap + driver merge, no global
  *     sort).
  *   - every query ends in a TOTAL order (tiebreakers) so LIMIT is
  *     deterministic for the oracle compare.
  */
object TradeQueries {

  /** ClickHouse `toStartOfInterval(t, INTERVAL n)` = epoch-floor bucketing
    * (GD:113). Integer-only arithmetic → identical in DuckDB.
    */
  def bucket(c: Column, seconds: Int): Column =
    timestamp_seconds(unix_seconds(c) - pmod(unix_seconds(c), lit(seconds.toLong)))

  /** DuckDB twin of [[bucket]]. */
  def bucketSql(col: String, seconds: Int): String =
    s"make_timestamp((CAST(epoch($col) AS BIGINT) - CAST(epoch($col) AS BIGINT) % $seconds) * 1000000)"

  val IntervalSec = 300 // the dashboard's default 5-minute grain (GD:3783)

  private def tsLit(s: String): Column = lit(s).cast("timestamp")
  private def timeRange(c: Column): Column =
    c >= tsLit(TimeFrom) && c < tsLit(TimeTo)
  private def timeRangeSql(col: String): String =
    s"$col >= TIMESTAMP '$TimeFrom' AND $col < TIMESTAMP '$TimeTo'"

  /** trades ⋈ securities on (sec_code, board) — GD:113 key variant. Dim is
    * 60 rows → broadcast-hash join, fact side never shuffles.
    */
  private def joinedOnCode(spark: SparkSession, dir: String): DataFrame = {
    val t = trades(spark, dir).as("t")
    val s = securities(spark, dir).as("s")
    t.join(broadcast(s), col("t.sec_code") === col("s.seccode") && col("t.board") === col("s.board"))
  }

  /** trades ⋈ securities on (secid, board) — GD:136 key variant. */
  private def joinedOnId(spark: SparkSession, dir: String): DataFrame = {
    val t = trades(spark, dir).as("t")
    val s = securities(spark, dir).as("s")
    t.join(broadcast(s), col("t.secid") === col("s.secid") && col("t.board") === col("s.board"))
  }

  private val joinCodeSql =
    "trades t JOIN securities s ON t.sec_code = s.seccode AND t.board = s.board"
  private val joinIdSql =
    "trades t JOIN securities s ON t.secid = s.secid AND t.board = s.board"

  // signed notional: if(buy_sell=='S',-1,1) * price*quantity*lotsize (GD:113)
  private val signedNotional: Column =
    when(col("t.buy_sell") === "S", lit(-1)).otherwise(lit(1)) *
      col("t.price") * col("t.quantity") * col("s.lotsize")
  private val signedNotionalSql =
    "(CASE WHEN t.buy_sell = 'S' THEN -1 ELSE 1 END) * t.price * t.quantity * s.lotsize"

  // =========================================================================

  /** Q1 (GD:113) — net buys leaders: inner interval agg over trades⋈securities
    * with signed notional, outer re-agg by sec_code, HAVING > 0, top-10.
    */
  val q01 = QueryDef.sql(
    "q01_netto_buy_topk",
    withCtes(
      s"""SELECT sec_code, netto FROM (
         |  SELECT sec_code, SUM(v) AS netto FROM (
         |    SELECT ${bucketSql("t.time", IntervalSec)} AS minute, t.sec_code, t.buy_sell,
         |           SUM($signedNotionalSql) AS v
         |    FROM $joinCodeSql
         |    WHERE t.board = 'TQBR' AND ${timeRangeSql("t.time")}
         |    GROUP BY 1, 2, 3) inner_agg
         |  GROUP BY sec_code) outer_agg
         |WHERE netto > 0
         |ORDER BY netto DESC, sec_code LIMIT 10""".stripMargin,
      tradesCte, securitiesCte)
  ) { (spark, dir) =>
    joinedOnCode(spark, dir)
      .filter(col("t.board") === "TQBR" && timeRange(col("t.time")))
      .groupBy(bucket(col("t.time"), IntervalSec).as("minute"),
        col("t.sec_code"), col("t.buy_sell"))
      .agg(sum(signedNotional).as("v"))
      .groupBy(col("sec_code"))
      .agg(sum(col("v")).as("netto"))
      .filter(col("netto") > 0) // HAVING
      .orderBy(col("netto").desc, col("sec_code"))
      .limit(10)
  }

  /** Q2 (GD:136) — net buys via UNION ALL of buy-leg and negated sell-leg
    * (join on secid,board), re-agg by sec_code, top-10.
    */
  private def unionLegs(spark: SparkSession, dir: String): DataFrame = {
    def leg(side: String, sign: Int): DataFrame =
      joinedOnId(spark, dir)
        .filter(col("t.buy_sell") === side && timeRange(col("t.time")))
        .groupBy(bucket(col("t.time"), IntervalSec).as("minute"), col("t.sec_code"))
        .agg((sum(col("t.price") * col("t.quantity") * col("s.lotsize")) * sign).as("vol"))
        .select(col("minute"), col("sec_code"), col("vol"))
    leg("B", 1).unionAll(leg("S", -1))
  }

  private def unionLegsSql: String =
    s"""SELECT ${bucketSql("t.time", IntervalSec)} AS minute, t.sec_code,
       |       SUM(t.price * t.quantity * s.lotsize) * 1 AS vol
       |FROM $joinIdSql
       |WHERE t.buy_sell = 'B' AND ${timeRangeSql("t.time")}
       |GROUP BY 1, 2
       |UNION ALL
       |SELECT ${bucketSql("t.time", IntervalSec)} AS minute, t.sec_code,
       |       SUM(t.price * t.quantity * s.lotsize) * -1 AS vol
       |FROM $joinIdSql
       |WHERE t.buy_sell = 'S' AND ${timeRangeSql("t.time")}
       |GROUP BY 1, 2""".stripMargin

  val q02 = QueryDef.sql(
    "q02_netto_buy_union",
    withCtes(
      s"""SELECT sec_code, SUM(vol) AS vol FROM ($unionLegsSql) legs
         |GROUP BY sec_code ORDER BY vol DESC, sec_code LIMIT 10""".stripMargin,
      tradesCte, securitiesCte)
  ) { (spark, dir) =>
    unionLegs(spark, dir)
      .groupBy(col("sec_code")).agg(sum(col("vol")).as("vol"))
      .orderBy(col("vol").desc, col("sec_code")).limit(10)
  }

  /** Q3 (GD:219) — net SELLS leaders: Q2 with the outer sum negated. */
  val q03 = QueryDef.sql(
    "q03_netto_sell_union",
    withCtes(
      s"""SELECT sec_code, SUM(vol) * -1 AS vol FROM ($unionLegsSql) legs
         |GROUP BY sec_code ORDER BY vol DESC, sec_code LIMIT 10""".stripMargin,
      tradesCte, securitiesCte)
  ) { (spark, dir) =>
    unionLegs(spark, dir)
      .groupBy(col("sec_code")).agg((sum(col("vol")) * -1).as("vol"))
      .orderBy(col("vol").desc, col("sec_code")).limit(10)
  }

  /** Q4 (GD:374) — "icebergs": single-lot buy trades re-aggregated with
    * HAVING. The reference groups by raw time; the fixture's synthetic times
    * are spread over years, so the time key is year-truncated to keep the
    * HAVING selective-but-nonempty at test SFs (shape preserved: time group
    * key + HAVING + ORDER BY time).
    */
  val q04 = QueryDef.sql(
    "q04_icebergs",
    withCtes(
      s"""SELECT date_trunc('year', time) AS time, sec_code, CAST(SUM(quantity) AS BIGINT) AS vol
         |FROM trades
         |WHERE quantity = 1 AND buy_sell = 'B'
         |GROUP BY 1, 2 HAVING SUM(quantity) > 1
         |ORDER BY time, sec_code""".stripMargin,
      tradesCte)
  ) { (spark, dir) =>
    trades(spark, dir)
      .filter(col("quantity") === 1 && col("buy_sell") === "B")
      .groupBy(date_trunc("year", col("time")).as("time"), col("sec_code"))
      .agg(sum(col("quantity")).as("vol"))
      .filter(col("vol") > 1)
      .orderBy(col("time"), col("sec_code"))
  }

  /** Q5 (GD:643) — net lots per interval for the selected codes (today). */
  private def netVolume(spark: SparkSession, dir: String,
      codeFilter: Column, dayShift: Boolean): DataFrame = {
    val t0 = trades(spark, dir)
    val t = if (dayShift) t0.withColumn("time", col("time") + expr("INTERVAL 1 DAY")) else t0
    t.filter(codeFilter)
      .groupBy(bucket(col("time"), IntervalSec).as("minute"), col("buy_sell"))
      .agg(sum(when(col("buy_sell") === "S", lit(-1)).otherwise(lit(1)) * col("quantity")).as("v"))
      .groupBy(col("minute")).agg(sum(col("v")).as("net"))
      .orderBy(col("minute"))
  }

  private def netVolumeSql(codePred: String, dayShift: Boolean): String = {
    val timeExpr = if (dayShift) "(time + INTERVAL 1 DAY)" else "time"
    s"""SELECT minute, CAST(SUM(v) AS BIGINT) AS net FROM (
       |  SELECT ${bucketSql(timeExpr, IntervalSec)} AS minute, buy_sell,
       |         CAST(SUM((CASE WHEN buy_sell = 'S' THEN -1 ELSE 1 END) * quantity) AS BIGINT) AS v
       |  FROM trades WHERE $codePred
       |  GROUP BY 1, 2) inner_agg
       |GROUP BY minute ORDER BY minute""".stripMargin
  }

  val q05 = QueryDef.sql("q05_net_vol_interval",
    withCtes(netVolumeSql(s"sec_code IN ${sqlList(SelCodes)}", dayShift = false), tradesCte)
  ) { (s, d) => netVolume(s, d, col("sec_code").isin(SelCodes: _*), dayShift = false) }

  /** Q6 (GD:794) — yesterday variant: `timestamp_add(day, 1, time)` BEFORE
    * bucketing (time-shifted self-comparison).
    */
  val q06 = QueryDef.sql("q06_net_vol_interval_yday",
    withCtes(netVolumeSql(s"sec_code IN ${sqlList(SelCodes)}", dayShift = true), tradesCte)
  ) { (s, d) => netVolume(s, d, col("sec_code").isin(SelCodes: _*), dayShift = true) }

  /** Q7 (GD:1069, FLAGSHIP) — per-interval buy turnover for selected codes.
    * Note the alias-in-WHERE semantics (SURVEY §7.5.4): the time-range filter
    * applies to the BUCKETED minute, so we bucket first, then filter.
    */
  private def turnoverInterval(spark: SparkSession, dir: String, side: String, sign: Int): DataFrame =
    joinedOnCode(spark, dir)
      .filter(col("t.sec_code").isin(SelCodes: _*) &&
        col("t.board") === "TQBR" && col("t.buy_sell") === side)
      .withColumn("minute", bucket(col("t.time"), IntervalSec))
      .filter(timeRange(col("minute"))) // alias-in-WHERE: filter the bucket
      .groupBy(col("minute"))
      .agg((sum(col("t.price") * col("t.quantity") * col("s.lotsize")) * sign).as("turnover"))
      .orderBy(col("minute"))

  private def turnoverIntervalSql(side: String, sign: Int): String =
    s"""SELECT minute, SUM(price * quantity * lotsize) * $sign AS turnover FROM (
       |  SELECT ${bucketSql("t.time", IntervalSec)} AS minute,
       |         t.price, t.quantity, s.lotsize
       |  FROM $joinCodeSql
       |  WHERE t.sec_code IN ${sqlList(SelCodes)} AND t.board = 'TQBR'
       |    AND t.buy_sell = '$side') bucketed
       |WHERE ${timeRangeSql("minute")}
       |GROUP BY minute ORDER BY minute""".stripMargin

  val q07 = QueryDef.sql("q07_buy_turnover_interval",
    withCtes(turnoverIntervalSql("B", 1), tradesCte, securitiesCte)
  ) { (s, d) => turnoverInterval(s, d, "B", 1) }

  /** Q8 (GD:1220) — sell leg, negated. */
  val q08 = QueryDef.sql("q08_sell_turnover_interval",
    withCtes(turnoverIntervalSql("S", -1), tradesCte, securitiesCte)
  ) { (s, d) => turnoverInterval(s, d, "S", -1) }

  /** Q9/Q10 (GD:1477,1628) — lots at raw (second) time granularity. */
  private def lotsByTime(spark: SparkSession, dir: String, side: String, sign: Int): DataFrame =
    trades(spark, dir)
      .filter(col("sec_code") === SingleSec && col("buy_sell") === side)
      .groupBy(col("time"))
      .agg((sum(col("quantity")) * sign).as("lots"))
      .orderBy(col("time"))

  private def lotsByTimeSql(side: String, sign: Int): String =
    s"""SELECT time, CAST(SUM(quantity) * $sign AS BIGINT) AS lots FROM trades
       |WHERE sec_code = '$SingleSec' AND buy_sell = '$side'
       |GROUP BY time ORDER BY time""".stripMargin

  val q09 = QueryDef.sql("q09_buy_lots_by_time",
    withCtes(lotsByTimeSql("B", 1), tradesCte))((s, d) => lotsByTime(s, d, "B", 1))
  val q10 = QueryDef.sql("q10_sell_lots_by_time",
    withCtes(lotsByTimeSql("S", -1), tradesCte))((s, d) => lotsByTime(s, d, "S", -1))

  /** Q11/Q12 (GD:1885,2036) — trade counts by raw time. */
  private def countByTime(spark: SparkSession, dir: String, side: String, sign: Int): DataFrame =
    trades(spark, dir)
      .filter(col("sec_code") === SingleSec && col("buy_sell") === side)
      .groupBy(col("time"))
      .agg((count(col("price")) * sign).as("trades_cnt"))
      .orderBy(col("time"))

  private def countByTimeSql(side: String, sign: Int): String =
    s"""SELECT time, CAST(COUNT(price) * $sign AS BIGINT) AS trades_cnt FROM trades
       |WHERE sec_code = '$SingleSec' AND buy_sell = '$side'
       |GROUP BY time ORDER BY time""".stripMargin

  val q11 = QueryDef.sql("q11_buy_count_by_time",
    withCtes(countByTimeSql("B", 1), tradesCte))((s, d) => countByTime(s, d, "B", 1))
  val q12 = QueryDef.sql("q12_sell_count_by_time",
    withCtes(countByTimeSql("S", -1), tradesCte))((s, d) => countByTime(s, d, "S", -1))

  /** Q13/Q14 (GD:2322,2473) — IMOEX net interest: Q5/Q6 with NOT IN
    * ETF-exclusion instead of single-sec selection.
    */
  val q13 = QueryDef.sql("q13_imoex_net_interval",
    withCtes(netVolumeSql(s"sec_code NOT IN ${sqlList(EtfCodes)}", dayShift = false), tradesCte)
  ) { (s, d) => netVolume(s, d, !col("sec_code").isin(EtfCodes: _*), dayShift = false) }

  val q14 = QueryDef.sql("q14_imoex_net_interval_yday",
    withCtes(netVolumeSql(s"sec_code NOT IN ${sqlList(EtfCodes)}", dayShift = true), tradesCte)
  ) { (s, d) => netVolume(s, d, !col("sec_code").isin(EtfCodes: _*), dayShift = true) }

  /** Q15-Q18 (GD:2748,2899,3174,3325) — interval turnover WITHOUT the
    * securities join (`sum(price*quantity)`), IN/NOT IN ETF list, bucketed
    * alias filtered in WHERE, LIMIT 10000.
    */
  private def turnoverNoJoin(spark: SparkSession, dir: String,
      side: String, sign: Int, codeFilter: Column): DataFrame =
    trades(spark, dir)
      .filter(codeFilter && col("buy_sell") === side)
      .withColumn("minute", bucket(col("time"), IntervalSec))
      .filter(timeRange(col("minute")))
      .groupBy(col("minute"))
      .agg((sum(col("price") * col("quantity")) * sign).as("turnover"))
      .orderBy(col("minute"))
      .limit(10000)

  private def turnoverNoJoinSql(side: String, sign: Int, codePred: String): String =
    s"""SELECT minute, SUM(price * quantity) * $sign AS turnover FROM (
       |  SELECT ${bucketSql("time", IntervalSec)} AS minute, price, quantity
       |  FROM trades WHERE $codePred AND buy_sell = '$side') bucketed
       |WHERE ${timeRangeSql("minute")}
       |GROUP BY minute ORDER BY minute LIMIT 10000""".stripMargin

  val q15 = QueryDef.sql("q15_imoex_turnover_b",
    withCtes(turnoverNoJoinSql("B", 1, s"sec_code NOT IN ${sqlList(EtfCodes)}"), tradesCte)
  ) { (s, d) => turnoverNoJoin(s, d, "B", 1, !col("sec_code").isin(EtfCodes: _*)) }

  val q16 = QueryDef.sql("q16_imoex_turnover_s",
    withCtes(turnoverNoJoinSql("S", -1, s"sec_code NOT IN ${sqlList(EtfCodes)}"), tradesCte)
  ) { (s, d) => turnoverNoJoin(s, d, "S", -1, !col("sec_code").isin(EtfCodes: _*)) }

  val q17 = QueryDef.sql("q17_etf_turnover_b",
    withCtes(turnoverNoJoinSql("B", 1, s"sec_code IN ${sqlList(EtfCodes)}"), tradesCte)
  ) { (s, d) => turnoverNoJoin(s, d, "B", 1, col("sec_code").isin(EtfCodes: _*)) }

  val q18 = QueryDef.sql("q18_etf_turnover_s",
    withCtes(turnoverNoJoinSql("S", -1, s"sec_code IN ${sqlList(EtfCodes)}"), tradesCte)
  ) { (s, d) => turnoverNoJoin(s, d, "S", -1, col("sec_code").isin(EtfCodes: _*)) }

  /** Q19/Q20 (GD:3584,3735) — IMOEX turnover at raw time granularity. */
  private def turnoverByTime(spark: SparkSession, dir: String, side: String, sign: Int): DataFrame =
    trades(spark, dir)
      .filter(!col("sec_code").isin(EtfCodes: _*) && col("buy_sell") === side)
      .groupBy(col("time"))
      .agg((sum(col("price") * col("quantity")) * sign).as("turnover"))
      .orderBy(col("time"))
      .limit(10000)

  private def turnoverByTimeSql(side: String, sign: Int): String =
    s"""SELECT time, SUM(price * quantity) * $sign AS turnover FROM trades
       |WHERE sec_code NOT IN ${sqlList(EtfCodes)} AND buy_sell = '$side'
       |GROUP BY time ORDER BY time LIMIT 10000""".stripMargin

  val q19 = QueryDef.sql("q19_imoex_turnover_by_time_b",
    withCtes(turnoverByTimeSql("B", 1), tradesCte))((s, d) => turnoverByTime(s, d, "B", 1))
  val q20 = QueryDef.sql("q20_imoex_turnover_by_time_s",
    withCtes(turnoverByTimeSql("S", -1), tradesCte))((s, d) => turnoverByTime(s, d, "S", -1))

  /** Q21 (GD:3766) — templating: distinct sec codes, sorted, LIMIT 1000. */
  val q21 = QueryDef.sql("q21_sec_codes",
    withCtes(
      "SELECT sec_code FROM trades GROUP BY sec_code ORDER BY sec_code ASC LIMIT 1000",
      tradesCte)
  ) { (s, d) =>
    trades(s, d).groupBy(col("sec_code")).agg(Map.empty[String, String])
      .orderBy(col("sec_code").asc).limit(1000)
  }

  /** Q22 (GD:3879) — templating: distinct ETF codes via trades semi-joined to
    * TQTF securities (semi-join-shaped distinct → `left_semi`).
    */
  val q22 = QueryDef.sql("q22_etf_codes",
    withCtes(
      """SELECT DISTINCT sec_code FROM trades t
        |WHERE EXISTS (SELECT 1 FROM securities s
        |              WHERE s.seccode = t.sec_code AND s.board = t.board
        |                AND s.board = 'TQTF')
        |ORDER BY sec_code""".stripMargin,
      tradesCte, securitiesCte)
  ) { (spark, dir) =>
    val t = trades(spark, dir).as("t")
    val s = securities(spark, dir).filter(col("board") === "TQTF").as("s")
    t.join(broadcast(s),
        col("t.sec_code") === col("s.seccode") && col("t.board") === col("s.board"),
        "left_semi")
      .select(col("sec_code")).distinct()
      .orderBy(col("sec_code"))
  }

  val all: Seq[QueryDef] = Seq(
    q01, q02, q03, q04, q05, q06, q07, q08, q09, q10, q11,
    q12, q13, q14, q15, q16, q17, q18, q19, q20, q21, q22)
}
