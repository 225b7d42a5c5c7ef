package graft

/** Runtime Bloom-filter join pruning (round 6): for a shuffle join whose
  * dim side carries a SELECTIVE predicate, Spark can inject a Bloom
  * filter built from the dim keys into the FACT side's scan stage
  * (`InjectRuntimeFilter`), discarding non-joining fact rows before the
  * shuffle — at 100 TB this is the difference between shuffling the whole
  * fact table and shuffling the ~matching slice. The engine relies on
  * this being available for ad-hoc selective joins the way it relies on
  * AQE for unplanned skew (AqeSkewSpec) — this spec proves the
  * configuration actually engages it on the trades⋈securities shape and
  * that the filter is semantically invisible.
  *
  * Thresholds are lowered (the fixture scan is KBs, the defaults gate on
  * GBs); the injected mechanism is byte-for-byte the production one.
  */
class RuntimeFilterSpec extends SparkSuite {

  private val knobs = Seq(
    "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10MB",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1")

  private def selectiveJoin() = {
    val dir = "/root/testdata/sf0.001"
    val t = graft.fixtures.Fixtures.trades(spark, dir)
    val s = graft.fixtures.Fixtures.securities(spark, dir)
      .filter(org.apache.spark.sql.functions.col("lotsize") === 10) // selective dim predicate
    t.join(s, t("sec_code") === s("seccode"))
      .groupBy(t("sec_code"))
      .agg(org.apache.spark.sql.functions.sum(t("quantity")).as("q"))
  }

  test("a selective dim predicate injects a Bloom filter into the fact side") {
    val conf = spark.conf
    val saved = knobs.map { case (k, _) => k -> conf.getOption(k) }
    try {
      knobs.foreach { case (k, v) => conf.set(k, v) }
      val df = selectiveJoin()
      val rows = df.collect().map(_.toSeq).sortBy(_.toString)
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
        s"no runtime bloom filter injected:\n${plan.take(4000)}")

      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val without = selectiveJoin().collect().map(_.toSeq).sortBy(_.toString)
      assert(rows.toSeq == without.toSeq, "runtime filter changed the answer")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
