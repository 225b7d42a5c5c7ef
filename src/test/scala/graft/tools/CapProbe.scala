package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (round 7): K=16 cluster-size distribution of the near-dup
  * embedding fixture at each correctness SF — picks the capped-cluster
  * threshold for `llm_semdedup_capped` so the exact-dedup fold fires
  * deterministically at every gated SF.
  */
object CapProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.expr.GraftFunctions.register(spark)
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val emb = graft.llm.Embed.prepared(
        graft.fixtures.Fixtures.embeddingsNearDup(spark, dir))
      val assigned = graft.llm.Ivf.assign(emb,
        graft.llm.Ivf.initCent(emb, 16, 0), 16)
      val sizes = assigned.groupBy("cent_id").agg(count(lit(1)).as("sz"))
        .orderBy(desc("sz")).collect()
      val zero = emb.filter(col("nrm") <= 0).count()
      println(s"[capprobe] $sf n=${emb.count()} zeroNorm=$zero sizes=" +
        sizes.map(r => s"${r.getInt(0)}:${r.getLong(1)}").mkString(","))
      // how many exact-dup groups inside clusters, at each re-quant divisor?
      for (d <- Seq(1, 4, 8, 16, 32, 64)) {
        val dups = assigned.join(emb.select("vec_id", "qv"), "vec_id")
          .groupBy(col("cent_id"), expr(s"transform(qv, x -> x div $d)").as("cq"))
          .agg(count(lit(1)).as("c"))
          .filter(col("c") > 1).agg(sum(col("c") - 1)).collect()(0)
        println(s"[capprobe] $sf div=$d collapsible=" +
          (if (dups.isNullAt(0)) 0L else dups.getLong(0)))
      }
    }
    spark.stop()
  }
}
