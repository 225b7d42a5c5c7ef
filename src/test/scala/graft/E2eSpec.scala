package graft

import graft.queries.{ChQueries, E2eQueries}

/** The north-star lineage (round 11): streaming ingest → JDBC store →
  * verbatim dashboard SQL must produce row-identical results to the same
  * panels run straight over the parquet fixtures. The driver gate hashes
  * each e2e entry against its DuckDB twin; this spec pins the
  * Spark-vs-Spark equivalence so a drift isolates to the ingest/store
  * edge rather than the dialect.
  */
class E2eSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("e2e streamed JDBC store reproduces the fixture-backed flagship panel") {
    assume(new java.io.File(graft.ch.ChDashboard.path).isFile)
    val viaJdbc = rows(E2eQueries.e2eDashboardJdbc.fn(spark, dir))
    val viaParquet = rows(ChQueries.chQ07.fn(spark, dir))
    assert(viaJdbc.nonEmpty)
    assert(viaJdbc == viaParquet)
  }

  test("e2e netto panel and templating variable match their parquet twins") {
    assume(new java.io.File(graft.ch.ChDashboard.path).isFile)
    assert(rows(E2eQueries.e2eDashboardJdbcNetto.fn(spark, dir)) ==
      rows(ChQueries.chQ01.fn(spark, dir)))
    assert(rows(E2eQueries.e2eDashboardJdbcCodes.fn(spark, dir)) ==
      rows(ChQueries.chQ21.fn(spark, dir)))
  }

  /** Doubles normalized to 9 significant digits before comparing: the
    * JDBC-store and parquet paths can legitimately sum a panel's doubles
    * in different partial-aggregation orders; 9 digits is far inside any
    * real divergence and far outside float-association noise.
    */
  private def norm(v: Any): Any = v match {
    // non-finite doubles pass through: BigDecimal(NaN) would throw and turn
    // a value divergence into an opaque conversion error (r12 review)
    case d: Double if d.isNaN || d.isInfinite => d
    case d: Double => BigDecimal(d).round(new java.math.MathContext(9)).toDouble
    case s: Seq[_] => s.map(norm)
    case r: org.apache.spark.sql.Row => r.toSeq.map(norm)
    case x => x
  }

  private def rowBag(df: org.apache.spark.sql.DataFrame): Map[Seq[Any], Int] =
    df.collect().toSeq.map(_.toSeq.map(norm))
      .groupBy(identity).view.mapValues(_.size).toMap

  test("full sweep: every dashboard panel + both templating vars over the " +
      "JDBC store match their parquet twins") {
    assume(new java.io.File(graft.ch.ChDashboard.path).isFile)
    // "any panel, any store": the three registered e2e entries prove the
    // lineage; this sweep closes the remaining 19 panels + templating vars
    // without 22 more driver entries (r11 verdict item 2)
    graft.expr.GraftFunctions.register(spark)
    val store = E2eQueries.readStore(spark, dir)
    val raws = graft.ch.ChDashboard.rawSqls()
    assert(raws.length >= 20)
    for ((raw, idx) <- raws.zipWithIndex) {
      // collect the JDBC-side result BEFORE translateSql re-points the
      // reference-named temp views at the parquet fixtures
      val viaJdbc = rowBag(spark.sql(ChQueries.translateSqlOver(spark, raw, store)))
      val viaParquet = rowBag(spark.sql(ChQueries.translateSql(spark, dir, raw)))
      assert(viaParquet.nonEmpty, s"panel $idx returned no rows")
      assert(viaJdbc == viaParquet, s"panel $idx diverged over the JDBC store")
    }
    for ((name, raw) <- graft.ch.ChDashboard.templatingSqls()) {
      val viaJdbc = rowBag(spark.sql(ChQueries.translateSqlOver(spark, raw, store)))
      val viaParquet = rowBag(spark.sql(ChQueries.translateSql(spark, dir, raw)))
      assert(viaParquet.nonEmpty && viaJdbc == viaParquet,
        s"templating '$name' diverged over the JDBC store")
    }
  }

  test("restart lineage: the exactly-once sink under a mid-ingest kill " +
      "reproduces the panel AND loses/duplicates nothing") {
    assume(new java.io.File(graft.ch.ChDashboard.path).isFile)
    val viaRestart = rows(E2eQueries.e2eJdbcRestart.fn(spark, dir))
    val viaParquet = rows(ChQueries.chQ05.fn(spark, dir))
    assert(viaRestart.nonEmpty)
    assert(viaRestart == viaParquet)
    // the store itself: exactly the fixture's trades, no replay residue
    // (the PK would have thrown on a double insert; equality pins no loss)
    val t = E2eQueries.readRestartStore(spark, dir)("transaq_trades")
    val expected = graft.fixtures.Fixtures.trades(spark, dir).count()
    assert(t.count() == expected)
    assert(t.select("trade_no").distinct().count() == expected)
  }

  test("pruned lineage: the exactly-once sink with periodic ledger " +
      "retention reproduces the panel from a horizon-bounded ledger") {
    assume(new java.io.File(graft.ch.ChDashboard.path).isFile)
    // the entry's own ingest REQUIREs the ledger ends at batches [6, 9]
    // with one claim + one marker each — running it IS the boundedness
    // assertion; the panel equality pins that pruning lost nothing
    val viaPruned = rows(E2eQueries.e2eJdbcPruned.fn(spark, dir))
    val viaParquet = rows(ChQueries.chQ13.fn(spark, dir))
    assert(viaPruned.nonEmpty)
    assert(viaPruned == viaParquet)
  }

  test("rebounce: scheduled multi-epoch stop/start ingest with a mid-epoch " +
      "kill lands the exact row set (r11 verdict item 8)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dbDir = java.nio.file.Files.createTempDirectory("rebounce_jdbc").toString
    val url = s"jdbc:derby:$dbDir/store;create=true"
    val props = E2eQueries.connProps()
    val conn = java.sql.DriverManager.getConnection(url)
    try conn.createStatement().executeUpdate(E2eQueries.TradesDdl)
    finally conn.close()
    graft.sources.Sinks.ensureEpochLedger(url, props)
    val all = graft.fixtures.Fixtures.trades(spark, dir)
      .as[graft.schema.TradeRow].collect()
      .sortBy(r => (r.time.getTime, r.time.getNanos, r.trade_no))
    val epochs = 3
    val perEpoch = 2
    // slice into EXACTLY epochs×perEpoch contiguous batches (round 13
    // advice: `grouped(n/6 + 1)` yields 6 groups only for some corpus
    // sizes — e.g. n=24 gives 5 — so the schedule silently broke if the
    // fixture shrank or a smaller SF was gated)
    val nBatches = epochs * perEpoch
    assert(all.length >= nBatches)
    val batches = (0 until nBatches).map(i =>
      all.slice(i * all.length / nBatches, (i + 1) * all.length / nBatches)).toSeq
    assert(batches.length == nBatches && batches.map(_.length).sum == all.length)
    val ms = MemoryStream[graft.schema.TradeRow](4)
    val faultKey = s"rebounce|$dbDir"
    graft.streaming.TransientFault.arm(faultKey, 1)
    var fed = 0
    val outcome = graft.streaming.Supervisor.rebounce(
      () => ms.toDS().repartition(1).writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$dbDir/ck")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[graft.schema.TradeRow],
            batchId: Long) =>
          graft.sources.Sinks.jdbcBatchIdempotent(
            b.toDF(), url, "transaq_trades", props, "rebounce_trades", batchId)
          // kill AFTER the store commit, BEFORE the checkpoint commit —
          // the same window the e2e restart entry exercises, here landing
          // mid-epoch so the retry re-enters the epoch that died
          graft.streaming.TransientFault.tripwire(faultKey)
        }
        .start(),
      epochs = epochs, backoff = java.time.Duration.ZERO) { (q, i) =>
      while (fed < (i + 1) * perEpoch) {
        ms.addData(batches(fed).toSeq); fed += 1; q.processAllAvailable()
      }
      q.processAllAvailable()
    }
    // exact schedule, not the tautological attempts = epochs + restarts
    // (rebounce constructs its Outcome that way — r12 review): ONE armed
    // fault -> exactly one restart, so 3 epochs take 4 attempts
    assert(outcome.restarts == 1, s"expected exactly one restart, got $outcome")
    assert(outcome.attempts == 4)
    val back = spark.read.jdbc(url, "transaq_trades", props)
    assert(back.count() == all.length)
    assert(back.select("trade_no").distinct().count() == all.length)
  }

  test("the JDBC store read is a partitioned scan, not one cursor") {
    assume(new java.io.File(graft.ch.ChDashboard.path).isFile)
    // the panel's trades side must arrive through the 8-way keyed-range
    // JDBC relation — the a24 scale shape — not a single-partition pull
    // (AQE hides physical leaves inside AdaptiveSparkPlanExec, so pin the
    // relation on the optimized logical plan, where the JDBC relation
    // prints its partition count)
    val df = E2eQueries.e2eDashboardJdbc.fn(spark, dir)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("JDBCRelation(transaq_trades) [numPartitions=8]"),
      s"expected an 8-way partitioned JDBC trades read in:\n$plan")
  }
}
