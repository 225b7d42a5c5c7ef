package graft

import org.apache.spark.sql.functions._

import graft.sources.Sinks

/** Bucketing proof (builder brief: "bucketing for co-located joins"):
  * two tables bucketed+sorted on the join key must join WITHOUT any
  * Exchange — the write-time shuffle is amortized over every later join.
  */
class BucketingSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("same-bucketed fact tables join with zero exchange and correct rows") {
    val trades = graft.fixtures.Fixtures.trades(spark, dir)
    val perCode = trades.groupBy("sec_code")
      .agg(sum("quantity").as("qty"), count(lit(1)).as("n"))
    val perCode2 = trades.filter(col("buy_sell") === "B").groupBy("sec_code")
      .agg(sum("quantity").as("bqty"))
    Sinks.materializeBucketed(perCode, "graft_bkt_a", 4, "sec_code")
    Sinks.materializeBucketed(perCode2, "graft_bkt_b", 4, "sec_code")
    // disable broadcast so the plan must co-locate by key — at the 100 TB
    // shape neither fact side is broadcastable, which is exactly the case
    // bucketing exists for (tiny test tables would otherwise broadcast)
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqeThresh = spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("graft_bkt_a").join(spark.table("graft_bkt_b"), "sec_code")
      val plan = joined.queryExecution.executedPlan.toString
      // bucket scans satisfy the join's distribution: no shuffle at all
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("Bucketed: true"), s"bucket scan not used:\n$plan")
      // and the bucketed round-trip is lossless vs joining the originals
      val got = joined.select("sec_code", "qty", "n", "bqty")
        .collect().map(_.toSeq).toSet
      val want = perCode.join(perCode2, "sec_code")
        .select("sec_code", "qty", "n", "bqty")
        .collect().map(_.toSeq).toSet
      assert(got == want)
      assert(got.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      prevAqeThresh match {
        case Some(v) => spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
      spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
    }
  }

  test("the registered layout_bucketed_join entry joins with zero exchange") {
    val df = graft.queries.IngestQueries.bucketedJoin(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // the merge hint + bucketed scans must satisfy the SMJ distribution
    // outright — any Exchange here means the write-time bucketing failed
    assert(!plan.contains("Exchange"), s"bucketed entry join shuffles:\n$plan")
    assert(plan.contains("Bucketed: true"), s"bucket scan not used:\n$plan")
    assert(plan.contains("SortMergeJoin"), s"not the fact-fact SMJ shape:\n$plan")
    val sfx = java.lang.Integer.toHexString(dir.hashCode)
    spark.sql(s"DROP TABLE IF EXISTS graft_bkt_facts_$sfx")
    spark.sql(s"DROP TABLE IF EXISTS graft_bkt_corr_$sfx")
  }
}
