package graft

import org.apache.spark.sql.functions._

import graft.llm.SemDedup

/** Pins the round-6 semantic-dedup scale guards ([[graft.llm.SemDedup]]):
  * K derived from the corpus size, oversized clusters split by the
  * second-level quantizer, unsplittable (identical-vector) clusters
  * flagged `capped` and excluded from the quadratic pair stage — on a
  * deliberately skewed fixture where one direction owns half the corpus.
  *
  * Fixture geometry (dim 4, quantized ints): 5 seed vectors (ids 0-4,
  * which initCent makes the coarse centroids), a 51-member skewed group on
  * the d0 axis in three separable sub-variants A/B/C, and 52 IDENTICAL
  * vectors on the d2 axis. target=25, max=50 → K = ceil(108/25) = 5; the
  * d0 cluster (52 members) must SPLIT into ≥3 bounded sub-clusters; the
  * identical d2 cluster (53) cannot split (all cosines tie) and must come
  * out `capped`.
  */
class SemDedupSpec extends SparkSuite {

  private val A = Seq(1000L, 300L, 0L, 0L)
  private val B = Seq(1000L, -300L, 0L, 0L)
  private val C = Seq(1000L, 0L, 300L, 0L)

  private lazy val emb = {
    graft.expr.GraftFunctions.register(spark)
    val seeds: Seq[(Long, Seq[Long])] = Seq(
      0L -> Seq(1000L, 0L, 0L, 0L),
      1L -> Seq(0L, 1000L, 0L, 0L),
      2L -> Seq(0L, 0L, 1000L, 0L),
      3L -> Seq(0L, 0L, 0L, 1000L),
      4L -> Seq(0L, 700L, 700L, 0L))
    val skew = (5L to 55L).map(i => i -> Seq(A, B, C)((i - 5).toInt % 3))
    val ident = (56L to 107L).map(i => i -> Seq(0L, 0L, 1000L, 0L))
    // one all-zero vector: no cosine geometry — must surface flagged,
    // never vanish
    val zero = Seq(108L -> Seq(0L, 0L, 0L, 0L))
    import spark.implicits._
    (seeds ++ skew ++ ident ++ zero).toDF("vec_id", "qv")
      .withColumn("nrm", expr(graft.llm.Embed.normExprOf("qv")))
      .cache()
  }

  private lazy val assignment =
    SemDedup.guardedAssign(emb, targetClusterSize = 25, maxClusterSize = 50).cache()

  test("chooseK scales with the corpus and matches the fixture entry's K") {
    assert(SemDedup.chooseK(550, 35) == 16) // the oracled entry's shape
    assert(SemDedup.chooseK(108, 25) == 5)
    assert(SemDedup.chooseK(1, 25) == 4) // floor
    assert(SemDedup.chooseK(1000000000L, 1000) == 1000000)
    assert(SemDedup.chooseK(Long.MaxValue / 4, 1000) == (1 << 20)) // cap
  }

  test("every vector is assigned exactly once — including the zero-norm one") {
    val ids = assignment.select("vec_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == (0L to 108L))
    val z = assignment.filter(col("vec_id") === 108L).collect()
    assert(z.length == 1 && z(0).getLong(1) == -1L && z(0).getBoolean(3),
      "zero-norm vector must land in the reserved capped cluster -1")
  }

  test("the skewed d0 cluster splits into bounded, variant-pure sub-clusters") {
    val rows = assignment.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3)))
    val skewIds = (0L +: (5L to 55L)).toSet // seed 0 rides with its group
    val skewRows = rows.filter(r => skewIds.contains(r._1))
    assert(skewRows.forall(_._3), "d0 members must be marked split")
    assert(skewRows.forall(!_._4), "d0 sub-clusters must not be capped")
    val keys = skewRows.map(_._2).distinct
    assert(keys.length >= 3, s"expected >=3 sub-clusters, got ${keys.toSeq}")
    // bounded: no refined non-capped cluster exceeds the max
    val bySize = rows.filterNot(_._4).groupBy(_._2).map(_._2.length)
    assert(bySize.forall(_ <= 50), s"oversized non-capped cluster: $bySize")
    // variant-pure: each A/B/C variant lands in ONE sub-cluster
    def keyOf(ids: Seq[Long]): Set[Long] =
      skewRows.filter(r => ids.contains(r._1)).map(_._2).toSet
    val aIds = (5L to 55L).filter(i => (i - 5) % 3 == 0)
    val bIds = (5L to 55L).filter(i => (i - 5) % 3 == 1)
    val cIds = (5L to 55L).filter(i => (i - 5) % 3 == 2)
    assert(keyOf(aIds).size == 1 && keyOf(bIds).size == 1 && keyOf(cIds).size == 1)
    assert(Set(keyOf(aIds), keyOf(bIds), keyOf(cIds)).size == 3)
  }

  test("the identical-vector cluster cannot split and is flagged capped — loudly") {
    val identRows = assignment.filter(
      (col("vec_id") >= 56 && col("vec_id") <= 107) || col("vec_id") === 2)
      .collect().map(r => (r.getLong(1), r.getBoolean(3)))
    assert(identRows.forall(_._2), "identical d2 cluster must be capped")
    assert(identRows.map(_._1).distinct.length == 1)
    val capped = SemDedup.cappedClusters(assignment).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(capped.size == 2, s"identical cluster + zero-norm reserve: $capped")
    assert(capped(-1L) == 1L && capped.values.toSeq.contains(53L))
  }

  test("cappedExactDedup collapses the identical capped cluster and keeps the zero vector") {
    val verdicts = SemDedup.cappedExactDedup(emb, assignment).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    // every capped member — the identical d2 cluster (seed 2 + 56..107)
    // and the zero-norm reserve — gets a verdict, nobody else does
    assert(verdicts.keySet == (56L to 107L).toSet + 2L + 108L)
    // the identical vectors collapse to the lowest id (seed 2), which is kept
    assert(verdicts(2L)._2 == -1L && !verdicts(2L)._3)
    for (i <- 56L to 107L)
      assert(verdicts(i) == ((verdicts(2L)._1, 2L, true)), s"member $i")
    // the zero vector is alone in its qv group: kept, never dropped
    assert(verdicts(108L) == ((-1L, -1L, false)))
  }

  test("guardedPairs covers the split clusters and excludes the capped quadratic") {
    val pairs = SemDedup.guardedPairs(emb, assignment, threshold = 0.99).cache()
    // within-variant cosines are exactly 1.0: C(17,2) pairs per variant
    assert(pairs.count() == 3 * 17 * 16 / 2)
    // nothing from the capped cluster sneaks into the pair stage
    val cappedIds = (56L to 107L).toSet + 2L
    val touched = pairs.select("a").unionAll(pairs.select("b"))
      .collect().map(_.getLong(0)).toSet
    assert(touched.intersect(cappedIds).isEmpty)
  }
}
