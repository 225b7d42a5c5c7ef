package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: warm per-query timing for named entries at sf0.1 —
  * `sbt "Test/runMain graft.tools.QProbe llm_ngram_jaccard"`.
  */
object QProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Seq("llm_ngram_jaccard")
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      (1 to 8).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        println(f"[qprobe] $n #$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
