package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Ad-hoc timing probe (dev scaffolding, test scope — not part of the
  * driver contract). Its round-3 measurements justified keeping
  * `Dedup.lastWriteWins` as a single max_by aggregation: the window and
  * join-back alternatives both measured slower at sf0.1. Run with
  * `sbt "Test/runMain graft.tools.Probe"`.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val keys = graft.schema.Schemas.tradesKey
    val seqCol = "ingest_seq"
    val df = graft.fixtures.Fixtures.tradesVersioned(spark, dir)
    println(s"[probe] rows=${df.count()}")
    val others = df.columns.filterNot(keys.contains).toSeq

    // current: max_by(struct) -> SortAggregate
    val v1 = df.groupBy(keys.map(col): _*)
      .agg(max_by(struct(others.map(col): _*), col(seqCol)).as("_latest"))
      .select(keys.map(col) ++ others.map(o => col("_latest").getField(o).as(o)): _*)
    timed("max_by struct #1")(noop(v1))
    timed("max_by struct #2")(noop(v1))

    // alt: hash max(seq) + join back
    val latest = df.groupBy(keys.map(col): _*).agg(max(col(seqCol)).as(seqCol))
    val v2 = df.join(latest, keys :+ seqCol)
    timed("max+joinback #1")(noop(v2))
    timed("max+joinback #2")(noop(v2))

    // alt: window row_number
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(seqCol).desc)
    val v3 = df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
    timed("window rn #1")(noop(v3))
    timed("window rn #2")(noop(v3))

    println(s"[probe] v1=${v1.count()} v2=${v2.count()} v3=${v3.count()}")
    spark.stop()
  }
}
