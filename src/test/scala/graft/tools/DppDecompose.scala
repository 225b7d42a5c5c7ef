package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off decomposition of layout_dpp_prune's second-decade ratio:
  * which leg is superlinear — the day-partitioned layout WRITE, or the
  * pruned READ+join? Run after ScaleProbe2 has materialized
  * /tmp/graft_sf1b and /tmp/graft_sf10.
  */
object DppDecompose {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    for (dir <- Seq("/tmp/graft_sf1b", "/tmp/graft_sf10")) {
      graft.fixtures.Fixtures.clearDerivedCache(spark)
      val t = graft.fixtures.Fixtures.trades(spark, dir)
      t.count() // materialize the fixture cache (parity with the probe's warmup)
      val out = s"/tmp/dpp_decomp_${dir.split('/').last}"
      val wWrite = (1 to 2).map(_ =>
        timed(graft.sources.Sinks.materializeTrades(t, out))).min
      val fact = spark.read.parquet(out)
      val dim = t.select(to_date(col("time")).as("trade_date")).distinct()
        .filter(dayofmonth(col("trade_date")) % 2 === 0)
      def readJoin(): Unit =
        fact.join(broadcast(dim), "trade_date")
          .groupBy("trade_date")
          .agg(count(lit(1)).as("n_trades"), sum("quantity").as("qty"))
          .write.format("noop").mode("overwrite").save()
      val wRead = (1 to 2).map(_ => timed(readJoin())).min
      println(f"[dpp-decomp] $dir%-18s write $wWrite%8.3f s   read+join $wRead%8.3f s")
    }
    spark.stop()
  }
}
