package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Round-15 measurement helper (guide §1/§7): run ONE entry under the
  * bench config and print every Spark job's wall time, so an
  * overhead-bound key's cost is attributable to jobs (broadcast builds,
  * eager checkpoints, the final action) rather than guessed.
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "Test/runMain graft.tools.JobBreakdown <entry>"
  */
object JobBreakdown {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: JobBreakdown <entryName>")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = args(0)
    def run(): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    run() // warmup (JIT + memo tables)
    graft.fixtures.Fixtures.clearDerivedCache(spark)
    run() // rep1 (cold-ish, builds entry caches)
    // instrument rep2 — the steady-state rep the warm lane reports
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts.put(js.jobId, (js.time, js.stageInfos.map(_.numTasks).sum))
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val (t0, tasks) = starts.getOrDefault(je.jobId, (je.time, 0))
        lines.add(f"  job=${je.jobId}%3d ${(je.time - t0) / 1000.0}%6.2fs tasks=$tasks%4d")
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t = run()
    spark.sparkContext.removeSparkListener(listener)
    Thread.sleep(500)
    println(f"[jobbreakdown] $n rep2 total ${t}%.2fs, jobs:")
    lines.forEach(l => println(l))
    spark.stop()
  }
}
