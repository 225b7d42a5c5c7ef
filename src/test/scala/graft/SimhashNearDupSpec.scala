package graft

/** `llm_simhash_neardup` against a fully independent in-memory reference
  * built straight from the document TEXT (no Spark, no shared helpers):
  * 60-bit md5 token hashes → bit balances → assembled signature → mask
  * to the corpus-adaptive width → capped band-pair pigeonhole blocking →
  * popcount verify. Asserts per-pair soundness and exact set equality,
  * so neither the signature arithmetic nor the blocking can silently
  * diverge from the design. Width adaptivity exists because the first
  * 10× probe measured the fixed 16-bit variant returning ZERO pairs at
  * 500k docs (constant key space, growing corpus — every block tripped
  * the cap); the reference reproduces the same width rule.
  */
class SimhashNearDupSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"
  private val Cap = 64
  private val Target = 16
  private val MaxW = 60

  private def md5HexPrefix15(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
    val h = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    (0 until 15).foldLeft(0L) { (v, i) =>
      val b = h(i >> 1) & 0xff
      (v << 4) | (if ((i & 1) == 0) b >> 4 else b & 0xf)
    }
  }

  private def bandBits(n: Long): Int = {
    val q = math.max(1L, (n + Target - 1) / Target)
    val f = math.floor(math.log(q.toDouble) / math.log(2.0)).toInt
    val c = if (math.pow(2.0, f) < q.toDouble) f + 1 else f
    math.min(MaxW / 4, math.max(4, (c + 1) / 2))
  }

  private lazy val texts: Map[Long, String] =
    graft.fixtures.Fixtures.documents(spark, dir)
      .select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  private lazy val b = bandBits(texts.size.toLong)

  /** Reference signatures from raw text, masked to 4·b bits. */
  private lazy val sigs: Map[Long, Long] = texts.map { case (id, text) =>
    val hs = text.split(' ').distinct.map(md5HexPrefix15)
    var sig = 0L
    for (i <- 0 until MaxW) {
      val bal = hs.map(h => if (((h >> i) & 1L) == 1L) 1 else -1).sum
      if (bal >= 0) sig |= (1L << i)
    }
    id -> (sig % (1L << (4 * b)))
  }

  private lazy val reference: Set[(Long, Long, Long)] = {
    val cands = scala.collection.mutable.Set[(Long, Long)]()
    for ((bi, bj) <- Seq((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3))) {
      val blocks = sigs.toSeq.groupBy { case (_, s) =>
        (s >> (b * bi)) % (1L << b) * (1L << b) + (s >> (b * bj)) % (1L << b)
      }
      for ((_, members) <- blocks if members.size <= Cap) {
        val ids = members.map(_._1).sorted
        for (i <- ids.indices; j <- (i + 1) until ids.length)
          cands += ((ids(i), ids(j)))
      }
    }
    (for {
      (a, c) <- cands.toSeq
      h = java.lang.Long.bitCount(sigs(a) ^ sigs(c)) if h <= 2
    } yield (a, c, h.toLong)).toSet
  }

  private lazy val reported: Set[(Long, Long, Long)] =
    SparkEntry.queries("llm_simhash_neardup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("width rule lands on 16 bits at fixture scale (the reference fingerprint width)") {
    assert(b == 4, s"b = $b")
  }

  test("soundness: every reported pair is within Hamming 2 on the reference sigs") {
    assert(reported.nonEmpty)
    for ((a, c, h) <- reported) {
      assert(a < c, s"pair order: ($a, $c)")
      assert(java.lang.Long.bitCount(sigs(a) ^ sigs(c)).toLong == h && h <= 2,
        s"($a, $c): claimed $h, actual ${java.lang.Long.bitCount(sigs(a) ^ sigs(c))}")
    }
  }

  test("the entry equals the from-text reference, exactly") {
    assert(reported == reference,
      s"missing: ${(reference -- reported).take(5)}; extra: ${(reported -- reference).take(5)}")
  }

  test("the adaptive width grows with the corpus (the zero-pairs-at-scale fix)") {
    assert(bandBits(500) == 4)      // fixture: 16-bit signature
    assert(bandBits(500000) == 8)   // 500k docs: 32-bit signature
    assert(bandBits(50000000) == 11) // 50M docs: 44-bit signature
    // occupancy stays ≈ Target: n / 2^(2b) ≤ Target at every step
    for (n <- Seq(500L, 5000L, 500000L, 50000000L)) {
      val bb = bandBits(n)
      assert(bb == MaxW / 4 || n.toDouble / math.pow(2, 2 * bb) <= Target,
        s"n=$n b=$bb occupancy ${n.toDouble / math.pow(2, 2 * bb)}")
    }
  }
}
