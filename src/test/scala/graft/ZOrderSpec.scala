package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expr.ZOrder
import graft.fixtures.Fixtures

/** The multi-dimensional layout contract: a Z-order-clustered
  * materialization gives every file granule a bounded range in BOTH
  * clustered dimensions, so box predicates can skip granules on either —
  * where a single-key (time-sorted) layout answers time predicates well
  * but keeps the full secid width in every granule.
  *
  * The clustering key interleaves NORMALIZED bucket ids (each dimension
  * range-mapped to 2^5 buckets), not raw values: with raw bits the wider
  * dimension's constant-zero high bits would leave the curve sorted by
  * the narrow dimension alone — the same reason production Z-order
  * implementations interleave per-column range-partition ids. Pruning is
  * quantified the way a 100 TB reader would: from the min/max column
  * statistics of each written file granule.
  */
class ZOrderSpec extends SparkSuite {

  private val Granules = 32

  // fixture trade-time domain: 07:00..16:00 -> minute-of-day 420..960
  private def prepared(): DataFrame =
    Fixtures.trades(spark, "/root/testdata/sf0.001")
      .selectExpr("CAST(secid AS BIGINT) AS secid",
        "CAST(hour(time) * 60 + minute(time) AS BIGINT) AS minute_of_day")
      .selectExpr("secid", "minute_of_day",
        "CAST((secid - 1) * 32 div 60 AS BIGINT) AS sbkt",
        "CAST((minute_of_day - 420) * 32 div 541 AS BIGINT) AS mbkt")
      .withColumn("zkey", expr(ZOrder.zkeySql("sbkt", "mbkt", 5, ZOrder.sparkShift)))

  /** Write `Granules` range-partitioned files clustered by `key`, then
    * return each file's (min,max) of both dimensions — the granule stats.
    */
  private def granuleStats(df: DataFrame, key: String): Seq[(Long, Long, Long, Long)] = {
    val dir = Files.createTempDirectory("zorder_layout").toString
    df.repartitionByRange(Granules, col(key)).sortWithinPartitions(key)
      .write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
      .groupBy(input_file_name())
      .agg(min("secid").as("slo"), max("secid").as("shi"),
        min("minute_of_day").as("mlo"), max("minute_of_day").as("mhi"))
      .collect().toSeq
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
  }

  test("z-order layout prunes on the dimension a time sort cannot") {
    val base = prepared().cache()
    val byTime = granuleStats(base, "minute_of_day")
    val byZ = granuleStats(base, "zkey")
    assert(byTime.length == Granules && byZ.length == Granules)

    def overlapSec(stats: Seq[(Long, Long, Long, Long)]): Int =
      stats.count { case (slo, shi, _, _) => slo <= 8L && shi >= 1L }
    def overlapMin(stats: Seq[(Long, Long, Long, Long)]): Int =
      stats.count { case (_, _, mlo, mhi) => mlo <= 899L && mhi >= 840L }

    // secid-only box (8 of 60 ids): every time-sorted granule spans the
    // full id width; z granules bound it
    val tSec = overlapSec(byTime)
    val zSec = overlapSec(byZ)
    assert(tSec > Granules * 3 / 4, s"time layout unexpectedly id-selective: $tSec")
    assert(zSec * 2 <= tSec, s"z-order read $zSec/$Granules granules vs $tSec for time sort")

    // minute-only box (1 h of 9): the time sort is near-optimal here and
    // z-order must stay bounded (the documented trade: balanced, not free)
    val tMin = overlapMin(byTime)
    val zMin = overlapMin(byZ)
    assert(tMin <= Granules / 4, s"time layout should excel on minutes: $tMin")
    assert(zMin < Granules * 3 / 4, s"z-order minute range must stay bounded: $zMin")

    // correctness: clustering is layout-only — the written rows round-trip
    val dir = Files.createTempDirectory("zorder_rows").toString
    base.repartitionByRange(Granules, col("zkey")).sortWithinPartitions("zkey")
      .write.mode("overwrite").parquet(dir)
    assert(spark.read.parquet(dir).count() == base.count())
    base.unpersist()
  }

  test("the morton key interleaves bits exactly") {
    val rows = spark.range(1).selectExpr(
      s"${ZOrder.zkeySql("CAST(5 AS BIGINT)", "CAST(3 AS BIGINT)", 3, ZOrder.sparkShift)} AS k")
      .collect()
    // a=5=0b101 -> even positions 0,4; b=3=0b011 -> odd positions 1,3
    // => 0b011011 = 27
    assert(rows.head.getLong(0) == 27L)
  }
}
