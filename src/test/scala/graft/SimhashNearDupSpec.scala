package graft

/** `llm_simhash_neardup` against an independent in-memory reference: the
  * entry's pair set must be SOUND (every reported pair really is within
  * Hamming 2 — recomputed from the signatures) and must match, exactly,
  * a from-scratch Scala implementation of the capped band-pair blocking
  * (pigeonhole over C(4,2) band pairs, blocks above the cap dropped) —
  * so the equi-join spelling can never silently diverge from the
  * blocking design it claims to implement.
  */
class SimhashNearDupSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"
  private val Cap = 64

  private val BandPairs = Seq((0, 1L, 16L), (1, 1L, 256L), (2, 1L, 4096L),
    (3, 16L, 256L), (4, 16L, 4096L), (5, 256L, 4096L))

  private lazy val sigs: Map[Long, Long] =
    SparkEntry.queries("llm_simhash")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private lazy val reported: Set[(Long, Long, Long)] =
    SparkEntry.queries("llm_simhash_neardup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  /** The blocking design, re-implemented from scratch (no Spark). */
  private lazy val reference: Set[(Long, Long, Long)] = {
    val cands = scala.collection.mutable.Set[(Long, Long)]()
    for ((_, di, dj) <- BandPairs) {
      val blocks = sigs.toSeq.groupBy { case (_, s) =>
        (s / di % 16) * 16 + (s / dj % 16)
      }
      for ((_, members) <- blocks if members.size <= Cap) {
        val ids = members.map(_._1).sorted
        for (i <- ids.indices; j <- (i + 1) until ids.length)
          cands += ((ids(i), ids(j)))
      }
    }
    (for {
      (a, b) <- cands.toSeq
      h = java.lang.Long.bitCount(sigs(a) ^ sigs(b)) if h <= 2
    } yield (a, b, h.toLong)).toSet
  }

  test("fixture exercises both regimes: some blocks capped, most not") {
    val sizes = (for ((_, di, dj) <- BandPairs; (_, s) <- sigs.toSeq)
      yield ((di, dj), (s / di % 16) * 16 + (s / dj % 16)))
      .groupBy(identity).map(_._2.size).toSeq
    assert(sizes.exists(_ > Cap), "at least one block must trip the cap here")
    assert(sizes.count(_ <= Cap) > sizes.count(_ > Cap),
      "most blocks must stay under the cap")
  }

  test("soundness: every reported pair is within Hamming 2 of its twin") {
    assert(reported.nonEmpty)
    for ((a, b, h) <- reported) {
      assert(a < b, s"pair order: ($a, $b)")
      assert(java.lang.Long.bitCount(sigs(a) ^ sigs(b)).toLong == h && h <= 2,
        s"($a, $b): claimed $h, actual ${java.lang.Long.bitCount(sigs(a) ^ sigs(b))}")
    }
  }

  test("the entry equals the from-scratch capped blocking, exactly") {
    assert(reported == reference,
      s"missing: ${(reference -- reported).take(5)}; extra: ${(reported -- reference).take(5)}")
  }
}
