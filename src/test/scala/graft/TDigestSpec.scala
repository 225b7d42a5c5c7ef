package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.expr.TDigestBuffer

/** t-digest kernel: rank accuracy, merge associativity, wire format. */
class TDigestSpec extends AnyFunSuite {

  private def digestOf(xs: Seq[Double]): TDigestBuffer = {
    val b = new TDigestBuffer(200.0)
    xs.foreach(b.add)
    b
  }

  /** Exact rank (fraction ≤ v) of a value in the sample. */
  private def rank(xs: Seq[Double], v: Double): Double =
    xs.count(_ <= v).toDouble / xs.size

  test("quantiles of a deterministic skewed sample are rank-accurate") {
    // heavy-tailed deterministic data: i^2 pattern stresses the tails
    val xs = (1 to 20000).map(i => (i.toLong * i % 99991).toDouble)
    val d = digestOf(xs)
    for (p <- Seq(0.01, 0.1, 0.5, 0.9, 0.99)) {
      val v = d.quantile(p)
      val lo = xs.count(_ < v).toDouble / xs.size
      val hi = rank(xs, v)
      assert(lo - 0.01 <= p && p <= hi + 0.01,
        s"p=$p: approx $v has rank bracket [$lo, $hi]")
    }
  }

  test("merged partial digests match a single digest's guarantee") {
    val xs = (1 to 30000).map(i => ((i * 2654435761L) % 100000).toDouble)
    // simulate 16 partitions merging pairwise (Spark's partial/final path)
    val parts = xs.grouped(xs.size / 16 + 1).map(digestOf).toSeq
    val merged = parts.reduce { (a, b) => a.merge(b); a }
    for (p <- Seq(0.05, 0.5, 0.95)) {
      val v = merged.quantile(p)
      val lo = xs.count(_ < v).toDouble / xs.size
      val hi = rank(xs, v)
      assert(lo - 0.015 <= p && p <= hi + 0.015,
        s"merged p=$p: $v bracket [$lo, $hi]")
    }
    // centroid count stays O(compression) + an O(log n) edge fringe
    // (the q(1-q) limit shrinks to zero at the extremes), never O(rows)
    merged.compress()
    assert(merged.means.length < 1200, s"digest grew to ${merged.means.length}")
  }

  test("serialization round-trips the digest exactly") {
    val d = digestOf((1 to 5000).map(_.toDouble))
    val r = TDigestBuffer.read(TDigestBuffer.write(d))
    assert(r.means.toSeq == { d.compress(); d.means.toSeq })
    assert(r.weights.toSeq == d.weights.toSeq)
    assert(r.quantile(0.5) == d.quantile(0.5))
  }

  test("edge digests: empty is NaN, singleton is itself, duplicates collapse") {
    assert(new TDigestBuffer(200.0).quantile(0.5).isNaN)
    assert(digestOf(Seq(42.0)).quantile(0.99) == 42.0)
    val dup = digestOf(Seq.fill(10000)(7.0))
    assert(dup.quantile(0.5) == 7.0)
    dup.compress()
    assert(dup.means.length == 1) // equal points merge into one centroid
  }
}
