package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-7 accounting for VERDICT r6 item 4: `qx_asof_custom` cold moved
  * 2.15 s (r5) → 2.61 s (r6), +21%, the only shared key beyond ±10%, and
  * it never got the AbProbe treatment the r5 regressions did.
  *
  * Same interleaved A/B standard: alternate COLD reps (derived-fixture
  * cache dropped before every rep, exactly like the bench cold lane) of
  * the custom-operator form against its window-form twin — same oracle,
  * same inputs, same fixture-derivation cost — plus a decomposition rep
  * that materializes the fixtures alone, so the cold time splits into
  * "derive trades+quotes" vs "asof operator itself". Medians over
  * interleaved reps in one JVM: JIT state and block-manager pressure are
  * identical across arms, only the operator differs.
  *
  * Run with `sbt "Test/runMain graft.tools.AsofColdProbe"`.
  */
object AsofColdProbe {
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

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def coldRep(f: => Unit): Double = {
      graft.fixtures.Fixtures.clearDerivedCache(spark)
      timed(f)
    }

    val arms: Seq[(String, () => Unit)] = Seq(
      "qx_asof_custom" ->
        (() => noop(graft.SparkEntry.queries("qx_asof_custom")(spark, dir))),
      "qx_asof_trade_quote" ->
        (() => noop(graft.SparkEntry.queries("qx_asof_trade_quote")(spark, dir))),
      // decomposition: the shared input derivation alone (trades + quotes
      // parse/materialize) — cold(entry) − cold(fixtures) ≈ operator cost
      "fixtures_only" -> (() => {
        noop(graft.fixtures.Fixtures.trades(spark, dir))
        noop(graft.fixtures.Fixtures.quotes(spark, dir))
      }))

    // JIT warmup, all arms
    arms.foreach { case (_, f) => coldRep(f()) }

    val reps = 7
    val times = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    for (_ <- 1 to reps; (n, f) <- arms) times(n) :+= coldRep(f())

    def stats(xs: Vector[Double]): (Double, Double, Double) =
      (xs.min, xs.sorted.apply(xs.length / 2), xs.max)
    println(f"[asofcold] ${"arm"}%-22s ${"min"}%7s ${"med"}%7s ${"max"}%7s  (reps=$reps, interleaved, cache-dropped)")
    for ((n, _) <- arms) {
      val (mn, md, mx) = stats(times(n))
      println(f"[asofcold] $n%-22s $mn%7.3f $md%7.3f $mx%7.3f")
    }
    spark.stop()
  }
}
