package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-8 A/B probe for the `Fixtures.memo` cached-table parallelism
  * normalization: the r8 bench showed broad COLD improvements (the
  * single-file fixture scan no longer serializes derivation) but a
  * cluster of small-table entries moved +0.5–2.2 s WARM vs the r7
  * artifact. Two candidate explanations: (a) 32 scheduled tasks per job
  * over a tiny cached table is real per-rep overhead for multi-job
  * entries, or (b) cross-run noise (the r7 comparison point is the
  * driver's run on a shared machine). Interleave cache-cleared rep
  * pairs with the normalization ON vs OFF in ONE JVM — same JIT, same
  * GC state — and read the per-key delta directly.
  *
  * Run with `sbt "Test/runMain graft.tools.MemoAbProbe [entries...]"`.
  */
object MemoAbProbe {
  private val Default = Seq(
    "llm_semdedup_guarded", "llm_ccnet_bucket", "llm_ann_ivf_trained",
    "llm_bloom_dedup", "llm_lang_classify", "llm_curation",
    "llm_exact_dedup", "llm_ngram_jaccard", "llm_lm_score")

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Default

    def warmPair(n: String): Double = {
      graft.fixtures.Fixtures.clearDerivedCache(spark)
      (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
    }

    // one untimed warmup pass (JIT + codegen) per key, normalization on
    names.foreach(warmPair)

    val rounds = 5
    val results = for (r <- 1 to rounds; n <- names) yield {
      sys.props -= "graft.memo.noNormalize"
      val on = warmPair(n)
      sys.props("graft.memo.noNormalize") = "1"
      val off = warmPair(n)
      sys.props -= "graft.memo.noNormalize"
      println(f"[memoab] r$r $n%-24s on=$on%6.3f off=$off%6.3f")
      (n, on, off)
    }
    println(f"[memoab] ${"entry"}%-24s ${"on med"}%8s ${"off med"}%8s ${"delta"}%8s")
    for (n <- names) {
      val ons = results.collect { case (`n`, a, _) => a }.sorted
      val offs = results.collect { case (`n`, _, b) => b }.sorted
      val (mOn, mOff) = (ons(ons.size / 2), offs(offs.size / 2))
      println(f"[memoab] $n%-24s $mOn%8.3f $mOff%8.3f ${mOn - mOff}%+8.3f")
    }
    spark.stop()
  }
}
