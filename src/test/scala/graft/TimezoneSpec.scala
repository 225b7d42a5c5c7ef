package graft

import org.apache.spark.sql.functions._

import graft.queries.TradeQueries

/** Timezone parity (SURVEY §7.5.2): the reference deployment runs
  * Europe/Moscow end-to-end (/root/reference/db.go:23 formats wall-clock
  * with the process TZ); this engine standardizes on UTC. These tests
  * prove the choice is a pure display concern at the dashboard grains: a
  * deployment that parses wire wall-clock AND renders under Europe/Moscow
  * produces bucket edges, range filters, and aggregates that render
  * IDENTICALLY to the UTC run. Why: epoch-floor bucketing shifts every
  * instant by the fixed MSK offset (10 800 s — Moscow has had no DST
  * since 2014), and every dashboard grain (60/90/300/3600 s) divides
  * 10 800, so bucket edges land on the same wall-clock seconds. The
  * boundary of the claim is pinned too: a grain that does NOT divide the
  * offset (7 s) genuinely diverges — the parity is arithmetic, not
  * vacuous.
  */
class TimezoneSpec extends SparkSuite {

  // wall-clock trades straddling a 5-minute edge, the range bounds, and
  // midnight; the last row falls outside the filter window
  private val rows = Seq(
    ("2024-12-06 06:57:21", "SEC01", 100.0, 5L, "B"),
    ("2024-12-06 06:59:59", "SEC01", 101.0, 2L, "S"),
    ("2024-12-06 07:00:00", "SEC01", 102.0, 3L, "B"), // exact bucket edge
    ("2024-12-06 07:04:59", "SEC02", 50.0, 7L, "B"),
    ("2024-12-06 23:59:59", "SEC02", 51.0, 1L, "S"),
    ("2024-12-07 00:00:00", "SEC02", 52.0, 4L, "B"), // midnight edge
    ("2024-12-07 00:00:01", "SEC01", 103.0, 9L, "B")) // outside the range

  private val From = graft.fixtures.Fixtures.TimeFrom // the real $__fromTime
  private val To = "2024-12-07 00:00:00" // widened to cover the midnight edge

  /** Parse → inclusive range filter → epoch-floor bucket → signed agg →
    * render, all under session TZ `tz` — the dashboard pipeline in
    * miniature, using the engine's real [[TradeQueries.bucket]].
    */
  private def run(tz: String, grain: Int): Seq[String] = {
    val prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", tz)
    try {
      import spark.implicits._
      rows.toDF("time_str", "sec_code", "price", "quantity", "buy_sell")
        .withColumn("time", to_timestamp(col("time_str"), "yyyy-MM-dd HH:mm:ss"))
        .filter(col("time") >= lit(From).cast("timestamp") &&
          col("time") <= lit(To).cast("timestamp"))
        .withColumn("minute", TradeQueries.bucket(col("time"), grain))
        .groupBy("minute", "sec_code")
        .agg(sum(when(col("buy_sell") === "S", -col("price") * col("quantity"))
          .otherwise(col("price") * col("quantity"))).as("vol"))
        .select(date_format(col("minute"), "yyyy-MM-dd HH:mm:ss").as("m"),
          col("sec_code"), col("vol").cast("string"))
        .orderBy("m", "sec_code")
        .collect().map(_.mkString("|")).toSeq
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("Europe/Moscow session TZ renders identical buckets at every dashboard grain") {
    for (grain <- Seq(60, 90, TradeQueries.IntervalSec, 3600)) {
      val utc = run("UTC", grain)
      assert(utc.nonEmpty && utc == run("Europe/Moscow", grain), s"grain=$grain")
    }
  }

  test("parity boundary: a grain not dividing the 3h offset genuinely diverges") {
    assert(run("UTC", 7) != run("Europe/Moscow", 7))
  }
}
