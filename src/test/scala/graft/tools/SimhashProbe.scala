package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe for `llm_simhash_neardup` on a fixture that respects the
  * operator's precondition.
  *
  * The shared ScaleProbe corpus scales by seeded Fisher–Yates word
  * shuffles — designed so SHINGLE-based pipelines don't see replicas as
  * near-dups. SimHash over DISTINCT tokens is order-invariant, so there
  * every replica group is 10/100 exact bag-of-words duplicates with one
  * shared signature: all six pigeonhole blocks of such a group exceed
  * the cap and are dropped (measured: 0 pairs at sf10) — the cap doing
  * its job on a corpus that violates the documented precondition that
  * exact/bag-of-words dedup (`llm_exact_dedup`) runs first.
  *
  * This probe scales instead by TOKEN SUBSTITUTION: replica r of a doc
  * replaces each word w with `w_r` when `md5(w|r)` lands in a 1/5
  * bucket — replicas keep ~80% token overlap (realistic near-dup
  * density) but distinct token SETS, so signatures spread and the
  * blocking has real work to do at every scale.
  *
  * Run: `sbt "Test/runMain graft.tools.SimhashProbe"`.
  */
object SimhashProbe {
  private val IdStride = 10000000L

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out1 = "/tmp/graft_simhash_sf1"
    val out10 = "/tmp/graft_simhash_sf10"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.get("SIMHASH_SHUFFLE_PARTITIONS").map(_.toInt).getOrElse(32))
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    materialize(spark, base, out1, 10)
    materialize(spark, base, out10, 100)

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val results = for (dir <- Seq(out1, out10)) yield {
      graft.fixtures.Fixtures.clearDerivedCache(spark)
      val df = () => graft.SparkEntry.queries("llm_simhash_neardup")(spark, dir)
      val rows = df().count()
      val t = (1 to 2).map(_ =>
        timed(df().write.format("noop").mode("overwrite").save())).min
      println(f"[simhash-probe] ${dir.split('/').last}%22s $t%8.3f s $rows%9d pairs")
      (t, rows)
    }
    val ((t0, r0), (t1, r1)) = (results(0), results(1))
    println(f"[simhash-probe] t-ratio ${t1 / t0}%.2f on 10x data (pairs $r0%d -> $r1%d)")
    spark.stop()
  }

  /** Documents table only; token-substitution replicas (see scaladoc). */
  private def materialize(spark: SparkSession, base: String, out: String,
      reps: Int): Unit = {
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(s"$out/documents.parquet")))
      return
    val subst = udf { (text: String, r: Int) =>
      if (r == 0) text
      else text.split(' ').map { w =>
        val h = scala.util.hashing.MurmurHash3.stringHash(s"$w|$r")
        if (math.floorMod(h, 5) == 0) s"${w}_$r" else w
      }.mkString(" ")
    }
    val repDf = spark.range(0, reps).select(col("id").cast("int").as("r"))
    spark.read.parquet(s"$base/documents.parquet")
      .crossJoin(broadcast(repDf))
      .select(
        (col("doc_id") + col("r") * IdStride).as("doc_id"),
        subst(col("text"), col("r")).as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    println(s"[simhash-probe] materialized $out (documents x$reps, token substitution)")
  }
}
