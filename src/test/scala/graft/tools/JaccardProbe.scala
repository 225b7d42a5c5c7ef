package graft.tools

import org.apache.spark.sql.SparkSession

/** Warm-time probe for the round-6 `llm_ngram_jaccard` reclaim (target
  * ≤ 2.5 s at sf0.1) + row-content sanity vs CORRECTNESS_r05 (1 row at
  * sf0.01). Run with `sbt "Test/runMain graft.tools.JaccardProbe"`.
  */
object JaccardProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val fn = graft.SparkEntry.queries("llm_ngram_jaccard")
    // content check at the driver's correctness SF
    val small = fn(spark, "/root/testdata/sf0.01").collect()
    println(s"[jp] sf0.01 rows=${small.length}: ${small.toSeq.map(_.toSeq).mkString("; ")}")

    def run(): Double = {
      val t0 = System.nanoTime()
      fn(spark, "/root/testdata/sf0.1")
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    run() // warmup
    val times = (1 to 5).map(_ => run())
    println(f"[jp] sf0.1 warm times: ${times.map(t => f"$t%.2f").mkString(", ")} " +
      f"median=${times.sorted.apply(2)}%.2f s")
    val big = fn(spark, "/root/testdata/sf0.1").collect()
    println(s"[jp] sf0.1 rows=${big.length}")
    spark.stop()
  }
}
