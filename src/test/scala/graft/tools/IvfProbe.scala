package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.{Embed, Ivf}

/** Dev probe: IVF recall@3 vs brute force across Lloyd iteration counts
  * and probe widths. `sbt "Test/runMain graft.tools.IvfProbe"`.
  */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.expr.GraftFunctions.register(spark) // vec_* kernels in Embed.prepared

    val emb = Embed.prepared(graft.fixtures.Fixtures.embeddings(spark, dir)).cache()
    val numQueries = 50
    import org.apache.spark.sql.expressions.Window
    val q = emb.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("qv").as("qqv"), col("nrm").as("qnrm"))
    val truth = emb.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cos_sim", expr(Embed.cosineSql(Embed.dotExpr("qqv", "qv"), "qnrm", "nrm")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col("vec_id"))))
      .filter(col("rank") <= 3).select("query_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    for (off <- Seq(50, 100); iters <- 0 to 3; nprobe <- Seq(2)) {
      val init = emb.filter(col("vec_id") >= off && col("vec_id") < off + 16)
        .select((col("vec_id") - off).cast("int").as("cent_id"),
          col("qv").as("cqv"), col("nrm").as("cnrm"))
      val cent = (1 to iters).foldLeft(init)(
        (c, _) => Ivf.lloydIter(emb, c, 16))
      val got = Ivf.search(emb, cent, 16, numQueries, nprobe, 3)
        .select("query_id", "vec_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val hit = (got & truth).size
      println(f"[ivfprobe] iters=$iters nprobe=$nprobe recall@3=${hit}/${truth.size}")
    }
    spark.stop()
  }
}
