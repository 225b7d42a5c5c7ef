package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ch.ChDashboard
import graft.fixtures.Fixtures
import graft.queries.{ChQueries, TradeQueries}

/** Round 10 (r9 verdict item 6): the dashboard offers FOURTEEN
  * user-selectable `$interval` grains (GD:3784-3860, minutes); the
  * registered entries pin the selected default (5). This sweep proves the
  * whole grain surface on the representative turnover panel (q07, the
  * flagship): at EVERY grain the engine pipeline
  * ([[TradeQueries.turnoverInterval]], epoch-floor `bucket`), the
  * VERBATIM dashboard SQL run through the dialect front-end
  * (`toStartOfInterval(time, INTERVAL $interval MINUTE)` with the
  * template variable substituted to that grain), and an INDEPENDENT
  * floor-division arithmetic twin (the spelling DuckDB executes in the
  * driver's oracle — `bucketSql` is the same integer arithmetic) all
  * return identical rows.
  */
class GrainSweepSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  /** All 14 `$interval` options, verbatim from the dashboard JSON. */
  private val grainsMin = Seq(1, 3, 5, 10, 12, 15, 20, 24, 30, 48, 60, 120, 240, 480)

  private def render(df: DataFrame): Seq[(Long, Double)] =
    df.collect().map(r => (r.getTimestamp(0).getTime, r.getDouble(1)))
      .toSeq.sortBy(_._1)

  test("q07 at every user-selectable grain: engine ≡ verbatim dashboard SQL ≡ independent arithmetic") {
    graft.expr.GraftFunctions.register(spark)
    val raw = ChDashboard.rawSqls()(6)
    require(raw.contains("INTERVAL $interval MINUTE"),
      "dashboard panel 6 lost its $interval marker")
    // the grains list must BE the dashboard's option list — a reference
    // user can only select what the JSON offers
    val offered = {
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = om.readTree(new java.io.File(ChDashboard.path))
      val vars = root.path("templating").path("list")
      (0 until vars.size()).map(vars.get)
        .find(_.path("name").asText() == "interval").get
        .path("options").elements()
    }
    val offeredGrains = Iterator.continually(offered)
      .takeWhile(_.hasNext).map(_.next().path("value").asText().toInt).toSeq
    assert(offeredGrains == grainsMin, s"dashboard offers $offeredGrains")

    for (m <- grainsMin) {
      val sec = m * 60
      val engine = render(TradeQueries.turnoverInterval(spark, dir, "B", 1, sec))
      val verbatim = render(spark.sql(
        ChQueries.translateSql(spark, dir, raw, Map("interval" -> m.toString))))
      // independent twin: floor division instead of the engine's pmod
      // spelling, straight DataFrame ops, no engine helpers
      val t = Fixtures.trades(spark, dir).alias("t")
      val s = Fixtures.securities(spark, dir).alias("s")
      val indep = render(
        t.join(s, col("t.secid") === col("s.secid") && col("t.board") === col("s.board"))
          .filter(col("t.sec_code").isin(Fixtures.SelCodes: _*) &&
            col("t.board") === "TQBR" && col("t.buy_sell") === "B")
          .withColumn("minute", expr(
            s"timestamp_seconds(CAST(FLOOR(unix_seconds(t.time) / $sec) AS BIGINT) * $sec)"))
          .filter(col("minute") >= lit(Fixtures.TimeFrom).cast("timestamp") &&
            col("minute") <= lit(Fixtures.TimeTo).cast("timestamp"))
          .groupBy("minute")
          .agg(sum(expr("t.price * t.quantity * s.lotsize")).as("turnover")))
      assert(engine.nonEmpty, s"grain ${m}m produced no rows — vacuous sweep")
      assert(engine == verbatim, s"engine vs verbatim dashboard SQL diverge at grain ${m}m")
      assert(engine == indep, s"engine vs independent arithmetic diverge at grain ${m}m")
    }
  }
}
