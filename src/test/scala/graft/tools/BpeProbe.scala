package graft.tools

import org.apache.spark.sql.SparkSession

/** One-JVM timing distribution for the iterative BPE entries: 6 reps
  * each with the bench's per-key cache clear, interleaved with a
  * map-side control, to separate real steady-state cost from
  * driver-loop scheduling/GC variance (the r7 bench flagged
  * llm_bpe_train warm 5.84 s vs cold 1.46 s — same code both lanes).
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def exec(n: String): Double = {
      graft.fixtures.Fixtures.clearDerivedCache(spark)
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val names = Seq("llm_bpe_train", "llm_bpe_apply", "llm_quality_score")
    names.foreach(exec) // JIT warmup
    val reps = for (r <- 1 to 6; n <- names) yield (n, exec(n))
    names.foreach { n =>
      val ts = reps.filter(_._1 == n).map(_._2)
      println(f"[bpeprobe] $n%-20s min=${ts.min}%6.2f med=${ts.sorted.apply(ts.size / 2)}%6.2f max=${ts.max}%6.2f  all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
