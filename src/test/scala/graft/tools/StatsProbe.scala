package graft.tools
import org.apache.spark.sql.SparkSession
object StatsProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- Seq("trades", "ticks", "documents", "embeddings", "embeddings_neardup", "embeddings_redelivered")) {
      val df = n match {
        case "trades" => graft.fixtures.Fixtures.trades(spark, dir)
        case "ticks" => graft.fixtures.Fixtures.ticks(spark, dir)
        case "documents" => graft.fixtures.Fixtures.documents(spark, dir)
        case "embeddings" => graft.fixtures.Fixtures.embeddings(spark, dir)
        case "embeddings_neardup" => graft.fixtures.Fixtures.embeddingsNearDup(spark, dir)
        case _ => graft.fixtures.Fixtures.embeddingsRedelivered(spark, dir)
      }
      println(f"[statsprobe] $n%-24s parts=${df.rdd.getNumPartitions}%3d rows=${df.count()}%8d")
    }
    spark.stop()
  }
}
