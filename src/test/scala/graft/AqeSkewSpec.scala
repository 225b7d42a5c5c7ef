package graft

/** The OTHER skew answer (round-6, VERDICT r5 item #7): the engine ships
  * manual salting for hand-identified hot keys (`qx_salted_turnover`,
  * SaltPlanSpec); for skew nobody pre-identified, the 100 TB lever is
  * Spark's built-in AQE skew-join — this spec proves the engine's
  * configuration actually engages it on a hot-key join shaped like the
  * turnover workload (one key owning most of the fact side), and that the
  * rewrite is semantically invisible.
  *
  * The driver fixture itself is uniform (sec_code = partkey % 60), so the
  * hot key is synthesized here: ~83% of a 300k-row fact table on one key.
  * Thresholds are lowered to make the fixture's partitions "large" —
  * the MECHANISM under test (skewed-partition split + join replication)
  * is identical at production sizes with default thresholds.
  */
class AqeSkewSpec extends SparkSuite {

  private val knobs = Seq(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1")

  private def hotJoin() = {
    // fact: 250k rows on key 0, 5k on each of 1..10 — the turnover-join
    // shape with an index heavyweight; dim: one row per key (forced to a
    // sort-merge join by the disabled broadcast threshold). The join
    // output is consumed WITHOUT re-shuffling on k: OptimizeSkewedJoin
    // (rightly) declines to split a skewed partition whose output
    // partitioning a downstream same-key aggregate still needs — the
    // split would buy the join's balance back at the price of a new
    // exchange. That declined case is exactly where the engine's MANUAL
    // salting (qx_salted_turnover: re-aggregate over key×salt partials)
    // remains the right tool; this spec pins the complementary case.
    val fact = spark.range(0, 300000).selectExpr(
      "CASE WHEN id < 250000 THEN CAST(0 AS BIGINT) ELSE id % 10 + 1 END AS k",
      "id AS v")
    val dim = spark.range(0, 11).selectExpr("id AS k", "id * 100 AS w")
    fact.join(dim, "k").selectExpr("v + w AS x")
      .agg(org.apache.spark.sql.functions.sum("x").as("sx"),
        org.apache.spark.sql.functions.count("*").as("c"))
  }

  test("AQE splits the hot-key partition and preserves the join's answer") {
    val conf = spark.conf
    val saved = knobs.map { case (k, _) => k -> conf.getOption(k) }
    try {
      knobs.foreach { case (k, v) => conf.set(k, v) }
      val df = hotJoin()
      val withAqe = df.collect().map(_.toSeq).sortBy(_.toString)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") || plan.contains("skewed"),
        s"no skew-join rewrite in final plan:\n${plan.take(4000)}")

      conf.set("spark.sql.adaptive.enabled", "false")
      val without = hotJoin().collect().map(_.toSeq).sortBy(_.toString)
      assert(withAqe.toSeq == without.toSeq, "skew rewrite changed the answer")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
