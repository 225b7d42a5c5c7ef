package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe (round 7, verdict item 6): where does a16_candles_batch's
  * 6.4 s COLD time go? Candidates: the memoized ticks cache materializes
  * ALL tick columns (cache defeats column pruning — the HH:mm:ss string
  * concat and tick_no arithmetic are paid even though batchCandles reads
  * five columns), vs the aggregation itself. Run with
  * `sbt "Test/runMain graft.tools.ColdProbe"`.
  */
object ColdProbe {
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

    def timed(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[coldprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // JIT warmup
    noop(graft.ingest.CandleBuilder.batchCandles(graft.fixtures.Fixtures.ticks(spark, dir)))

    (1 to 3).foreach { i =>
      graft.fixtures.Fixtures.clearDerivedCache(spark)
      timed(s"cold a16 entry (memoized cache path) #$i") {
        noop(graft.ingest.CandleBuilder.batchCandles(graft.fixtures.Fixtures.ticks(spark, dir)))
      }
    }
    (1 to 3).foreach { i =>
      graft.fixtures.Fixtures.clearDerivedCache(spark)
      timed(s"cold ticks cache materialize only #$i") {
        noop(graft.fixtures.Fixtures.ticks(spark, dir))
      }
    }
    // pruned path: same agg over a NON-cached ticks scan — Catalyst prunes
    // the unused wire columns (time string concat, open, secid) to the scan
    val pruned = graft.fixtures.Fixtures.ticksUncached(spark, dir)
    noop(graft.ingest.CandleBuilder.batchCandles(pruned)) // JIT
    (1 to 3).foreach { i =>
      graft.fixtures.Fixtures.clearDerivedCache(spark)
      timed(s"cold a16 over uncached pruned scan #$i") {
        noop(graft.ingest.CandleBuilder.batchCandles(graft.fixtures.Fixtures.ticksUncached(spark, dir)))
      }
    }
    (1 to 3).foreach { i =>
      timed(s"warm a16 over uncached pruned scan #$i") {
        noop(graft.ingest.CandleBuilder.batchCandles(graft.fixtures.Fixtures.ticksUncached(spark, dir)))
      }
    }
    spark.stop()
  }
}
