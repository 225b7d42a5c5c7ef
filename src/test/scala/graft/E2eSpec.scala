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
