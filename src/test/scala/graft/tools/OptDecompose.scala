package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, to_date}

/** Round-10 decomposition for `layout_optimize_compact`'s second-decade
  * reading (13.4 at ×10 — ScaleProbe2): the registered entry compacts
  * with `maxFiles = 2`, so at sf10 the compaction rewrite is TWO tasks
  * externally sorting 30M rows each — the fixture's knob, not the
  * operator's ceiling (r9 verdict already flagged this framing; this
  * probe makes it a measured number). Times the fragmentation write and
  * the compaction at maxFiles = 2 vs a volume-sized maxFiles, per scale.
  * `sbt "Test/runMain graft.tools.OptDecompose [sfDir ...]"`.
  */
object OptDecompose {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/tmp/graft_sf1b", "/tmp/graft_sf10")
    val spark: SparkSession = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    for (dir <- dirs) {
      graft.fixtures.Fixtures.clearDerivedCache(spark)
      val t = graft.fixtures.Fixtures.trades(spark, dir)
      val days = t.select(to_date(col("time")).as("d")).distinct()
        .collect().map(_.getDate(0)).toSeq
      val out = java.nio.file.Files.createTempDirectory("opt_decomp").toString
      def fragment(): Unit =
        t.withColumn("trade_date", to_date(col("time")))
          .repartition(48)
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .partitionBy("trade_date").parquet(out)
      val tFrag = timed(fragment())
      val t2 = timed(graft.sources.Sinks.compactPartitions(spark, out, days, maxFiles = 2))
      fragment() // re-fragment so the second compaction pays the same input
      val t32 = timed(graft.sources.Sinks.compactPartitions(spark, out, days, maxFiles = 32))
      println(f"[optdecomp] ${dir.split('/').last}%12s fragment=$tFrag%8.2f s " +
        f"compact(maxFiles=2)=$t2%8.2f s compact(maxFiles=32)=$t32%8.2f s")
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(out))
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
    spark.stop()
  }
}
