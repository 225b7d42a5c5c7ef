package graft

import org.apache.spark.sql.functions.col

/** Round-9 operator invariants, each checked against an INDEPENDENT
  * in-test derivation (plain Scala over collected fixture data — the
  * CdcExprPropertySpec pattern):
  *
  *  - `llm_kn_lm_score`: the quantized Kneser–Ney q-table recomputed
  *    from raw counts in Scala, plus the smoothing property that
  *    separates KN from the add-k model (continuation mass follows
  *    context diversity, not raw frequency).
  *  - `llm_pagerank_hosts`: three power iterations replayed in exact
  *    integer arithmetic over the derived edge set; hub dominance.
  *  - `llm_neyman_sample`: allocation replayed from exact moments;
  *    budget and per-stratum caps.
  *  - `llm_embed_outliers`: the flag is exactly the documented
  *    mean-margin predicate; flagged fraction is a tail, not a third.
  */
class Round9OpsSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.01"

  // ---- Kneser–Ney ----

  test("kn q-table replay: fluency recomputed from raw Scala counts matches") {
    val docs = graft.fixtures.Fixtures.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(' ').toSeq))
    val bigrams = docs.flatMap { case (_, tk) => tk.sliding(2).filter(_.size == 2).map(_.mkString(" ")) }
    val c2 = bigrams.groupBy(identity).map { case (bg, xs) => bg -> xs.length.toLong }
    val c1 = c2.groupBy(_._1.split(' ')(0)).map { case (w, m) => w -> m.values.sum }
    val n1f = c2.groupBy(_._1.split(' ')(0)).map { case (w, m) => w -> m.size.toLong }
    val n1b = c2.groupBy(_._1.split(' ')(1)).map { case (w, m) => w -> m.size.toLong }
    val nTypes = c2.size.toLong
    val Q = 1000000L
    def q(bg: String): Long = {
      val w1 = bg.split(' ')(0); val w2 = bg.split(' ')(1)
      ((4 * c2(bg) - 3) * Q) / (4 * c1(w1)) +
        (((3 * n1f(w1) * Q) / (4 * c1(w1))) * n1b(w2)) / nTypes
    }
    val expected = docs.map { case (id, tk) =>
      val bgs = tk.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
      val sumQ = bgs.map(q).sum
      id -> ((bgs.size.toLong, sumQ, if (bgs.nonEmpty) sumQ / bgs.size else 0L))
    }.toMap
    val got = SparkEntry.queries("llm_kn_lm_score")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
  }

  test("kn separates context diversity from raw frequency (the smoothing point)") {
    // two unseen-context words with equal raw frequency: the one that
    // completes MORE DISTINCT bigram types must carry more continuation
    // mass — the property the add-k lmScore model cannot express.
    import spark.implicits._
    val docs = Seq(
      // "common" follows 4 distinct contexts, once each;
      // "burst" follows 1 context 4 times — equal raw frequency 4.
      (0L, "a common b common c common d common"),
      (1L, "e burst e burst e burst e burst"),
      (2L, "x y z x y z")).toDF("doc_id", "text")
    val bigrams = docs.collect().flatMap(
      _.getString(1).split(' ').sliding(2).map(_.mkString(" ")))
    val c2 = bigrams.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n1b = c2.keys.groupBy(_.split(' ')(1)).view.mapValues(_.size.toLong).toMap
    assert(n1b("common") == 4 && n1b("burst") == 1)
  }

  // ---- PageRank ----

  test("pagerank replay: exact integer power iteration over the derived edges") {
    val docIds = graft.fixtures.Fixtures.documents(spark, dir)
      .select("doc_id").collect().map(_.getLong(0))
    val links = docIds.flatMap { id =>
      val src = id % 97
      Seq(Some((id * 31) % 97),
        if (id % 2 == 0) Some((id * 53) % 97) else None,
        if (id % 4 == 0) Some(id % 5) else None)
        .flatten.filter(_ != src).map(d => (src, d))
    }.distinct
    val deg = links.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = (links.map(_._1) ++ links.map(_._2)).distinct
    val Q = 1000000000000L
    val base = Q * 15 / 100
    var r = nodes.map(_ -> Q).toMap
    for (_ <- 1 to 3) {
      val inflow = links.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => (85 * r(u)) / (100 * deg(u)) }.sum).toMap
      r = nodes.map(n => n -> (base + inflow.getOrElse(n, 0L))).toMap
    }
    val got = SparkEntry.queries("llm_pagerank_hosts")(spark, dir).collect()
      .map(row => row.getString(0) -> ((row.getLong(1), row.getLong(2)))).toMap
    val expected = nodes.map(n =>
      s"h$n" -> ((deg.getOrElse(n, 0L), r(n)))).toMap
    assert(got == expected)
    // hub dominance: all five hub hosts rank inside the top 6 (a
    // non-hub with lucky in-links may edge past the weakest hub, but
    // the hub set as a whole must sit at the top)
    val topSix = got.toSeq.sortBy(-_._2._2).take(6).map(_._1).toSet
    assert(Set("h0", "h1", "h2", "h3", "h4").subsetOf(topSix), s"top6 was $topSix")
  }

  // ---- Neyman ----

  test("neyman allocation: replayed from exact moments; budget and caps hold") {
    val rows = SparkEntry.queries("llm_neyman_sample")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    val byStratum = rows.groupBy(_._2)
    // replay: w_h = floor(sqrt(N_h·Σx² − (Σx)²)), alloc = min((n/10·w)//Σw, N_h)
    val moments = byStratum.view.mapValues { xs =>
      val n = xs.length.toLong
      val sx = xs.map(_._3).sum
      val sxx = xs.map(t => t._3 * t._3).sum
      (n, math.sqrt((n * sxx - sx * sx).toDouble).floor.toLong)
    }.toMap
    val wsum = moments.values.map(_._2).sum
    val nTotal = rows.length.toLong
    for ((src, xs) <- byStratum) {
      val (nH, w) = moments(src)
      val expectAlloc = math.min((nTotal / 10) * w / wsum, nH)
      assert(xs.head._5 == expectAlloc, s"$src alloc ${xs.head._5} vs $expectAlloc")
      // kept set = exactly the alloc_n smallest-hash ranks
      assert(xs.count(_._6) == expectAlloc)
      assert(xs.filter(_._6).map(_._4).sorted.toSeq == (1L to expectAlloc))
    }
    // total sample within budget
    assert(rows.count(_._6) <= nTotal / 10)
    // the seam produces a genuinely differential allocation
    assert(rows.map(_._5).distinct.length >= 3)
  }

  // ---- multi-epoch expansion ----

  test("epoch_expand replay: repeat factors from token parity; manifest complete") {
    val docs = graft.fixtures.Fixtures.documents(spark, dir)
      .selectExpr("doc_id", "lang", "CAST(size(split(text, ' ')) AS BIGINT) AS n")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val langTok = docs.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val maxTok = langTok.values.max
    val rep = langTok.view.mapValues(t => math.min((maxTok + t - 1) / t, 4L)).toMap
    val rows = SparkEntry.queries("llm_epoch_expand")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // every doc appears exactly repeat_n(lang) times, epochs 1..r contiguous
    val byDoc = rows.groupBy(_._1)
    for ((id, lang, _) <- docs) {
      val inst = byDoc(id)
      assert(inst.length == rep(lang).toInt, s"doc $id")
      assert(inst.map(_._5).sorted.toSeq == (1L to rep(lang)))
      assert(inst.forall(_._4 == rep(lang)))
    }
    assert(rows.length == docs.map(d => rep(d._2)).sum)
    // shards span the full 0..15 range and are deterministic per (doc, epoch)
    assert(rows.map(_._6).distinct.sorted.toSeq == (0L to 15L))
    // the fixture imbalance genuinely exercises the cap and the floor
    assert(rep.values.min == 1L && rep.values.max == 4L)
  }

  // ---- dataset card ----

  test("dataset_card replay: counts, dup detection, ppm-floored mean quality") {
    val docs = graft.fixtures.Fixtures.documents(spark, dir)
      .selectExpr("source", "lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def qPpm(text: String): Long = {
      val tk = text.split(' ')
      val n = tk.length.toDouble
      val uniq = tk.distinct.length
      val stop = tk.count(t => t == "the" || t == "a")
      val prior = if (text.length >= 200) 1.0 else if (text.length >= 100) 0.5 else 0.0
      math.floor((uniq.toDouble / n * 0.5
        + (1.0 - stop.toDouble / n) * 0.3 + prior * 0.2) * 1000000).toLong
    }
    val got = SparkEntry.queries("llm_dataset_card")(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    for ((src, xs) <- docs.groupBy(_._1)) {
      val nDocs = xs.length.toLong
      val nTok = xs.map(_._3.split(' ').length.toLong).sum
      val nLangs = xs.map(_._2).distinct.length.toLong
      val nDup = nDocs - xs.map(x => md5hex(x._3)).distinct.length
      val meanQ = xs.map(x => qPpm(x._3)).sum / nDocs
      assert(got(src) == ((nDocs, nTok, nLangs, nDup, meanQ)), s"src $src")
    }
  }

  // ---- unigram tokenizer fertility ----

  test("unigram replay: Viterbi DP over distinct words recomputed in Scala") {
    val docs = graft.fixtures.Fixtures.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(' ').toSeq))
    val allWords = docs.flatMap(_._2)
    val wf = allWords.groupBy(identity).view.mapValues(_.length.toLong).toMap
      .filter(_._1.length <= 16)
    // piece freq = sum of word counts over every (pos, len<=4) occurrence
    val pieceFreq = scala.collection.mutable.Map.empty[String, Long]
    for ((w, cnt) <- wf; s <- 0 until w.length; l <- 1 to 4 if s + l <= w.length)
      pieceFreq(w.substring(s, s + l)) = pieceFreq.getOrElse(w.substring(s, s + l), 0L) + cnt
    val totBits = java.lang.Long.toBinaryString(pieceFreq.values.sum).length.toLong
    def cost(p: String): Long = totBits - java.lang.Long.toBinaryString(pieceFreq(p)).length
    def dpKey(w: String): Long = {
      val best = Array.fill(w.length + 1)(Long.MaxValue)
      best(0) = 0L
      for (i <- 1 to w.length; l <- 1 to math.min(4, i) if best(i - l) != Long.MaxValue) {
        val k = best(i - l) + cost(w.substring(i - l, i)) * 64 + 1
        if (k < best(i)) best(i) = k
      }
      best(w.length)
    }
    val keys = wf.keys.map(w => w -> dpKey(w)).toMap
    val expected = docs.map { case (id, tk) =>
      val ks = tk.filter(_.length <= 16).map(keys)
      val nPieces = ks.map(_ % 64).sum
      id -> ((ks.size.toLong, nPieces, ks.map(_ / 64).sum,
        nPieces * 1000000 / ks.size))
    }.toMap
    val got = SparkEntry.queries("llm_unigram_fertility")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expected)
    // the DP genuinely segments: fertility strictly between all-singles
    // (ppm = mean word length) and the one-piece floor
    assert(got.values.exists(_._4 < 2000000) && got.values.forall(_._4 >= 1000000))
  }

  // ---- interval join ----

  test("session concurrency replay: naive range count over sf0.001 matches") {
    val small = "/root/testdata/sf0.001"
    val evts = graft.fixtures.Fixtures.events(spark, small)
      .select("ts").collect().map(_.getTimestamp(0).getTime)
    val got = SparkEntry.queries("evt_session_concurrency")(spark, small).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getTimestamp(2).getTime,
        r.getLong(3), r.getLong(4)))
    assert(got.nonEmpty)
    for ((_, start, end, nEvents, nConc) <- got) {
      val expect = evts.count(t => t >= start && t < end).toLong
      assert(nConc == expect, s"[$start,$end): $nConc vs $expect")
      assert(nConc >= nEvents) // own events are inside the window
    }
    // concurrency genuinely exceeds own-session counts somewhere
    assert(got.exists { case (_, _, _, ne, nc) => nc > ne })
    // and the retained pair-producing form (the general interval JOIN)
    // answers the same counts as the registered rank-difference path
    val pairForm = graft.queries.EventQueries.sessionConcurrencyPairJoin(spark, small)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        r.getTimestamp(2).getTime, r.getLong(3), r.getLong(4))).sorted.toSeq
    assert(pairForm == got.sorted.toSeq)
  }

  // ---- embedding outliers ----

  test("outlier flag is exactly the mean-margin predicate; flagged set is a tail") {
    val rows = SparkEntry.queries("llm_embed_outliers")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    val margin = 164926744166L
    for ((_, _, cosQ, _, avgQ, out) <- rows)
      assert(out == (cosQ < avgQ - margin))
    // per-cell mean replay
    for ((_, cell) <- rows.groupBy(_._2)) {
      val mean = cell.map(_._3).sum / cell.length // shift cancels in the diff
      assert(math.abs(cell.head._5 - mean) <= 1) // ±1: integer div on shifted values
      assert(cell.head._4 == cell.length.toLong)
    }
    val frac = rows.count(_._6).toDouble / rows.length
    assert(frac > 0 && frac < 0.10, s"outlier fraction $frac")
  }
}
