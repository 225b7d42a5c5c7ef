package graft

/** `llm_distinct_sketch` (deterministic KMV cardinality estimator)
  * invariants: the exact path engages exactly when the vocabulary fits
  * the sketch, the estimation path lands within KMV's expected error
  * envelope (~1/√k ≈ 6% at k=256; asserted at a loose 15%), and the
  * kept k-th minimum is genuinely the k-th smallest hash — recomputed
  * from raw text in plain Scala for one group.
  */
class DistinctSketchSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.01"
  private val K = 256

  private lazy val rows =
    SparkEntry.queries("llm_distinct_sketch")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))).toMap

  test("both regimes present: tokens exact (vocab < k), bigrams estimated") {
    val (tn, tk, _, test_, terr) = rows(("token", "en"))
    assert(tk == tn && tk < K && test_ == tn.toDouble && terr == 0.0,
      s"token grain must be exact: $tn/$tk/$test_/$terr")
    val (bn, bk, _, _, _) = rows(("bigram", "en"))
    assert(bk == K && bn > K, s"bigram grain must engage the sketch: $bn/$bk")
  }

  test("estimation error stays inside the KMV envelope on every sketch group") {
    for (((g, l), (n, k, _, est, errPpm)) <- rows if k == K) {
      assert(math.abs(est - n) / n <= 0.15, s"($g,$l): est $est vs $n")
      assert(math.abs(errPpm - math.abs(est - n) / n * 1e6) < 1e-6)
    }
  }

  test("kth_min is the k-th smallest 60-bit md5 over the group, recomputed from text") {
    val texts = graft.fixtures.Fixtures.documents(spark, dir)
      .filter(org.apache.spark.sql.functions.col("lang") === "en")
      .select("text").collect().map(_.getString(0))
    def h60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
      val h = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      (0 until 15).foldLeft(0L) { (v, i) =>
        val b = h(i >> 1) & 0xff
        (v << 4) | (if ((i & 1) == 0) b >> 4 else b & 0xf)
      }
    }
    val bigrams = texts.flatMap(_.split(' ').sliding(2).filter(_.length == 2)
      .map(_.mkString(" "))).distinct
    val hashes = bigrams.map(h60).distinct.sorted
    val (_, _, kth, _, _) = rows(("bigram", "en"))
    assert(kth == hashes(K - 1),
      s"kth_min $kth vs recomputed ${hashes(K - 1)} (${hashes.length} distinct)")
  }
}
