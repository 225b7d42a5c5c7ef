package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B bisect for the round-5 bench regressions (VERDICT r5 "What's wrong"
  * #1): `llm_minhash_lsh` +22%, `q01_netto_buy_topk` +23%,
  * `llm_ann_ivf[_trained]` +25/23% vs round 4. The one session-wide change
  * in round 5 was `spark.sql.objectHashAggregate.sortBased.fallbackThreshold
  * = 4M` (added for `graft_last_by`), which alters EVERY
  * ObjectHashAggregate's fallback behavior — this probe interleaves timed
  * reps of the affected queries (plus two controls that did NOT regress)
  * under the stock threshold vs 4M in one JVM, so JIT state and cache
  * residency are identical across arms and only the knob differs.
  *
  * The conf is a runtime SQLConf, so flipping it per-rep is legitimate
  * (verified: `spark.conf.set` succeeds, and ObjectHashAggregateExec reads
  * it at execution time from the active session).
  *
  * Run with `sbt "Test/runMain graft.tools.AbProbe"`.
  */
object AbProbe {
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

    val knob = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val stock = "128" // Spark default
    val r5 = "4194304"

    val queries = Seq(
      "llm_minhash_lsh", "q01_netto_buy_topk", "llm_ann_ivf",
      "llm_ann_ivf_trained",
      // controls: one ObjectHashAggregate-free and one that improved in r5
      "q06_net_vol_interval_yday", "q07_buy_turnover_interval")

    def run(n: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // warmup (JIT + memoized base tables), both knob values exercised
    for (v <- Seq(stock, r5); n <- queries) { spark.conf.set(knob, v); run(n) }

    val reps = 7
    val times = scala.collection.mutable.Map[(String, String), Vector[Double]]()
      .withDefaultValue(Vector.empty)
    for (r <- 1 to reps; v <- Seq(stock, r5); n <- queries) {
      spark.conf.set(knob, v)
      val t = run(n)
      times((n, v)) :+= t
    }

    def median(xs: Vector[Double]): Double = xs.sorted.apply(xs.length / 2)
    println(f"[ab] ${"query"}%-28s ${"stock"}%8s ${"4M"}%8s  delta")
    for (n <- queries) {
      val a = median(times((n, stock))); val b = median(times((n, r5)))
      println(f"[ab] $n%-28s $a%8.3f $b%8.3f  ${100 * (b - a) / a}%+6.1f%%")
    }
    spark.stop()
  }
}
