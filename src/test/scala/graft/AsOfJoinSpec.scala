package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.plans.{AsOf, AsOfJoinExec}

/** The custom as-of join operator (LogicalPlan + Strategy + SparkPlan):
  * semantics pinned on a hand-built frame, full parity against the
  * window-based `qx_asof_trade_quote` spelling on the sf0.001 fixture,
  * and the physical-plan claims (AsOfJoinExec present, no WindowExec,
  * per-child sorts).
  */
class AsOfJoinSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s"2024-12-06 $s")

  test("as-of semantics: last right row at or before, ties to max ord") {
    val trades = Seq(
      (1, ts("10:00:05"), 1L), // before any quote -> NULL
      (1, ts("10:00:10"), 2L), // exactly at quote time -> that quote
      (1, ts("10:00:30"), 3L), // between quotes -> the 10:00:10 one
      (1, ts("10:01:00"), 4L), // two quotes at 10:01:00 -> max quote_seq
      (2, ts("10:00:20"), 5L)  // other key: only its own quotes count
    ).toDF("secid", "time", "trade_no")
    val quotes = Seq(
      (1, ts("10:00:10"), 100L, 101.0),
      (1, ts("10:01:00"), 101L, 102.0),
      (1, ts("10:01:00"), 102L, 103.0), // same ts, higher seq wins
      (1, ts("10:02:00"), 103L, 104.0), // future: never used
      (2, ts("10:00:15"), 104L, 55.0)
    ).toDF("secid", "time", "quote_seq", "price")

    val got = AsOf.join(trades, quotes, Seq("secid"), "time", "time",
        "quote_seq", "price", "quote_price")
      .orderBy("trade_no")
      .select("trade_no", "quote_price")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1)))
    assert(got.toSeq == Seq(1L -> null, 2L -> 101.0, 3L -> 101.0,
      4L -> 103.0, 5L -> 55.0))
  }

  test("custom exec ≡ the window-based qx_asof_trade_quote entry (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    graft.expr.GraftFunctions.register(spark)
    val want = graft.SparkEntry.queries("qx_asof_trade_quote")(spark, dir)
      .collect().map(_.toSeq).toSet
    val trades = graft.fixtures.Fixtures.trades(spark, dir)
      .selectExpr("secid", "time", "trade_no", "price AS tprice")
    val quotes = graft.fixtures.Fixtures.quotes(spark, dir)
      .select("secid", "time", "quote_seq", "price")
    val got = AsOf.join(trades, quotes, Seq("secid"), "time", "time",
        "quote_seq", "price", "quote_price")
      .select("secid", "trade_no", "time", "tprice", "quote_price")
      .collect().map(_.toSeq).toSet
    assert(got == want)
  }

  test("bucketed children satisfy the distribution: as-of joins with zero exchange") {
    val dir = "/root/testdata/sf0.001"
    // A crashed predecessor run can leave the warehouse LOCATION behind with
    // no catalog entry (the test catalog is in-memory per JVM), and
    // Overwrite then refuses with LOCATION_ALREADY_EXISTS — clear both.
    for (t <- Seq("graft_asof_t", "graft_asof_q")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
      val loc = new java.io.File(wh, t)
      if (loc.exists()) scala.reflect.io.Directory(loc).deleteRecursively()
    }
    graft.sources.Sinks.materializeBucketed(
      graft.fixtures.Fixtures.trades(spark, dir)
        .selectExpr("secid", "time", "trade_no"), "graft_asof_t", 4, "secid")
    graft.sources.Sinks.materializeBucketed(
      graft.fixtures.Fixtures.quotes(spark, dir)
        .select("secid", "time", "quote_seq", "price"), "graft_asof_q", 4, "secid")
    try {
      val df = AsOf.join(spark.table("graft_asof_t"), spark.table("graft_asof_q"),
        Seq("secid"), "time", "time", "quote_seq", "price", "quote_price")
      val plan = df.queryExecution.executedPlan.toString
      // the write-time bucket shuffle is amortized: the scans' output
      // partitioning satisfies ClusteredDistribution(secid) on both
      // sides, so only the per-child in-partition sorts remain
      assert(!plan.contains("Exchange"), s"bucketed as-of still shuffles:\n$plan")
      assert(plan.contains("Bucketed: true"), s"bucket scan not used:\n$plan")
      // and the merge still answers correctly from bucket-local streams
      val viaBuckets = df.select("trade_no", "quote_price")
        .collect().map(_.toSeq).toSet
      val direct = AsOf.join(
          graft.fixtures.Fixtures.trades(spark, dir)
            .selectExpr("secid", "time", "trade_no"),
          graft.fixtures.Fixtures.quotes(spark, dir)
            .select("secid", "time", "quote_seq", "price"),
          Seq("secid"), "time", "time", "quote_seq", "price", "quote_price")
        .select("trade_no", "quote_price").collect().map(_.toSeq).toSet
      assert(viaBuckets == direct)
      assert(viaBuckets.nonEmpty)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_asof_t")
      spark.sql("DROP TABLE IF EXISTS graft_asof_q")
    }
  }

  test("physical plan: AsOfJoinExec, per-child sorts, no WindowExec") {
    val dir = "/root/testdata/sf0.001"
    val trades = graft.fixtures.Fixtures.trades(spark, dir)
      .selectExpr("secid", "time", "trade_no")
    val quotes = graft.fixtures.Fixtures.quotes(spark, dir)
      .select("secid", "time", "quote_seq", "price")
    val df = AsOf.join(trades, quotes, Seq("secid"), "time", "time",
      "quote_seq", "price", "quote_price")
    val plan = df.queryExecution.executedPlan
    val s = plan.toString
    assert(s.contains("AsOfJoin"), s)
    assert(!s.contains("Window"), s"window crept back in:\n$s")
    // EnsureRequirements satisfied the declared distribution + ordering:
    // a sort on each side, keyed exchanges, and the exec's own output
    assert(s.linesIterator.count(_.trim.startsWith("+- Sort")) >= 2
      || s.linesIterator.count(_.contains("Sort [")) >= 2, s)
    // AQE hides the real plan behind AdaptiveSparkPlanExec
    val inner = plan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val execs = inner.collect { case e: AsOfJoinExec => e }
    assert(execs.nonEmpty)
  }

  // ---- guards + partitioning added by the round-5 self-review ----

  test("non-long-backed time column fails loudly, not with garbage rows") {
    val trades = Seq((1, "10:00:05", 1L)).toDF("secid", "time", "trade_no")
    val quotes = Seq((1, ts("10:00:10"), 100L, 101.0))
      .toDF("secid", "time", "quote_seq", "price")
    val ex = intercept[Exception] {
      AsOf.join(trades, quotes, Seq("secid"), "time", "time",
        "quote_seq", "price", "quote_price").collect()
    }
    assert(ex.getMessage.contains("must be TIMESTAMP or BIGINT")
      || Option(ex.getCause).exists(_.getMessage.contains("must be TIMESTAMP or BIGINT")))
  }

  test("array-typed value column is copied out of the reused row buffer") {
    val trades = Seq(
      (1, ts("10:00:20"), 1L), (1, ts("10:00:40"), 2L), (2, ts("10:00:40"), 3L)
    ).toDF("secid", "time", "trade_no")
    val quotes = Seq(
      (1, ts("10:00:10"), 100L, Seq(1L, 11L)),
      (1, ts("10:00:30"), 101L, Seq(2L, 22L)),
      (2, ts("10:00:30"), 102L, Seq(3L, 33L))
    ).toDF("secid", "time", "quote_seq", "depth")
    val got = AsOf.join(trades, quotes, Seq("secid"), "time", "time",
        "quote_seq", "depth", "quote_depth")
      .orderBy("trade_no").select("quote_depth")
      .collect().map(r => r.getSeq[Long](0))
    assert(got.toSeq == Seq(Seq(1L, 11L), Seq(2L, 22L), Seq(3L, 33L)))
  }

  test("downstream groupBy on the join key adds no exchange above the join") {
    val dir = "/root/testdata/sf0.001"
    val trades = graft.fixtures.Fixtures.trades(spark, dir)
      .selectExpr("secid", "time", "trade_no")
    val quotes = graft.fixtures.Fixtures.quotes(spark, dir)
      .select("secid", "time", "quote_seq", "price")
    val agged = AsOf.join(trades, quotes, Seq("secid"), "time", "time",
        "quote_seq", "price", "quote_price")
      .groupBy("secid").agg(max("quote_price"))
    agged.collect()
    val inner = agged.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    // the exec reports left partitioning, so the only exchanges are the
    // two BELOW the join that established the clustering
    def countAbove(p: org.apache.spark.sql.execution.SparkPlan): Int = p match {
      case _: AsOfJoinExec => 0
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike =>
        1 + p.children.map(countAbove).sum
      case _ => p.children.map(countAbove).sum
    }
    assert(countAbove(inner) == 0,
      s"unexpected exchange above the as-of join:\n$inner")
  }
}
