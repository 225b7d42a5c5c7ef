package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Post-cap regime probe for guarded semantic dedup (round 16, r14
  * verdict item 4). `SemDedup.chooseK` caps the codebook at 2^20; beyond
  * N ≈ 2^20 · target (~37M vectors at target 35) the EXPECTED cluster
  * size exceeds the target and the split path (SubCap sub-clusters) plus
  * the capped/exact-dedup route must absorb the excess. No local corpus
  * reaches that N, so the probe simulates the SHAPE: a synthetic corpus
  * of C planted clusters whose sizes are x·target·⌈overshoot⌉ for
  * overshoot factors x, assigned with K FORCED to C (as if the cap
  * bound it), and measures per x:
  *
  *   - split share: members routed through the second-level quantizer
  *   - capped share: members whose refined cluster still exceeds max
  *     (excluded from the quadratic stage, routed to exact dedup)
  *   - pair volume of the pairwise stage vs the N·target/2 linear budget
  *   - exact-dedup route share (rows the cappedExactDedup fold handles)
  *
  * The planted geometry gives each cluster a distinct direction (two
  * deterministic basis dims per cluster) with per-member jitter in a
  * third dim, so the forced-K assignment reconstructs the plant and the
  * sub-quantizer has real within-cluster structure to split on.
  *
  *   sbt "Test/runMain graft.tools.PostCapProbe"
  */
object PostCapProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.expr.GraftFunctions.register(spark)

    val target = 35
    val maxSz = 550 // the registered entry's bound at ~16x target
    val numClusters = 16
    // overshoot x: expected cluster = x * target. x=1 is the at-cap
    // boundary; 16 crosses maxSz; 64 = SubCap * target (the split's
    // design point); 128 exceeds what ONE split level can absorb
    // (SubCap sub-clusters x target members each)
    for (x <- Seq(1, 4, 16, 64, 128)) {
      val perCluster = x * target
      val n = numClusters * perCluster
      // planted directions: cluster c points along dims (2c, 2c+1) of a
      // 40-dim space (wide enough for 16 clusters + jitter dims), member
      // jitter on dim 34..39 keyed by member index — integer-valued
      // doubles, the repo's exactness rule
      val emb0 = spark.range(n.toLong).selectExpr(
        "id AS vec_id",
        s"CAST(id % $numClusters AS INT) AS c",
        s"CAST(id DIV $numClusters AS INT) AS m")
        .selectExpr("vec_id",
          s"""transform(sequence(0, 39), i ->
             |  CAST(CASE WHEN i = 2 * c THEN 100 + (m % 7)
             |            WHEN i = 2 * c + 1 THEN 50
             |            WHEN i = 34 + (m % 6) THEN 1 + (m % 11)
             |            ELSE 0 END AS DOUBLE)) AS embedding""".stripMargin,
          "'x' AS label")
      val emb = graft.llm.Embed.prepared(emb0).cache()
      emb.count()
      val t0 = System.nanoTime()
      val assignment = graft.llm.SemDedup
        .guardedAssignWithK(emb, numClusters, target, maxSz)
        .cache()
      val total = assignment.count()
      val split = assignment.filter(col("split")).count()
      val capped = assignment.filter(col("capped")).count()
      val pairs = graft.llm.SemDedup.guardedPairs(emb, assignment, 0.5).count()
      val exactRows = graft.llm.SemDedup.cappedExactDedup(emb, assignment).count()
      val secs = (System.nanoTime() - t0) / 1e9
      val refined = assignment.groupBy("cluster_key").count()
        .agg(max("count"), avg("count")).collect()(0)
      val budget = n.toLong * target / 2
      println(f"[postcap] x=$x%3d n=$n%7d expCluster=$perCluster%6d " +
        f"splitShare=${split.toDouble / total}%.3f cappedShare=${capped.toDouble / total}%.3f " +
        f"maxRefined=${refined.getLong(0)} avgRefined=${refined.getDouble(1)}%.1f " +
        f"pairs=$pairs%9d pairBudget=$budget%9d ratio=${pairs.toDouble / budget}%.3f " +
        f"exactRouteRows=$exactRows wall=$secs%.1fs")
      assignment.unpersist(); emb.unpersist()
    }
    spark.stop()
  }
}
