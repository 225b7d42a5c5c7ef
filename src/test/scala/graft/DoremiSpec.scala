package graft

import org.apache.spark.sql.functions._

/** DoReMi-style domain reweighting (`llm_doremi_weight`) on the fixture
  * corpus plus structural invariants a mixture consumer relies on: one
  * row per source, ppm weights that sum to ≤ 1e6 (integer-floor slack
  * only), every domain sampleable (weight ≥ the floor's share), and the
  * excess-loss signal actually ordering weights — a domain the corpus LM
  * fits worse than average must weigh more than one it fits better.
  */
class DoremiSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private lazy val rows = {
    val df = SparkEntry.queries("llm_doremi_weight")(spark, dir)
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5)))
  }

  test("one row per source, all docs accounted for") {
    val nDocs = graft.fixtures.Fixtures.documents(spark, dir).count()
    assert(rows.map(_._1).distinct.length == rows.length)
    assert(rows.map(_._2).sum == nDocs)
  }

  test("weights are a normalized mixture: sum ≤ 1e6 with only floor slack") {
    val total = rows.map(_._6).sum
    // integer floor loses < 1 ppm per domain
    assert(total <= 1000000L && total > 1000000L - rows.length,
      s"ppm total $total")
  }

  test("every domain stays sampleable (no zero weights)") {
    assert(rows.forall(_._6 > 0), rows.filter(_._6 == 0).mkString(", "))
  }

  test("higher excess loss ⇒ strictly higher weight; zero excess ⇒ the floor share") {
    val byExcess = rows.sortBy(_._5)
    for (w <- byExcess.sliding(2).map(_.toSeq) if w.length == 2; Seq(a, b) = w) {
      if (a._5 < b._5) assert(a._6 < b._6, s"$a vs $b")
      if (a._5 == b._5) assert(a._6 == b._6, s"$a vs $b")
    }
    val floorRows = rows.filter(_._5 == 0L)
    assert(floorRows.map(_._6).distinct.length <= 1,
      "all zero-excess domains share the floor weight")
  }

  test("a planted unpredictable domain is upweighted over a fluent one") {
    import spark.implicits._
    graft.expr.GraftFunctions.register(spark)
    // fluent: one phrase every doc repeats — same continuations every
    // time, the self-trained bigram model fits it near-perfectly.
    // unpredictable: a SHARED 11-word vocabulary in a different stride
    // permutation per doc — every unigram is common (c1 = 10) but every
    // bigram is unique (c2 = 1), so conditional probabilities are low.
    // (Fully unique words would backfire: singleton unigrams make every
    // continuation deterministic and the model fits them PERFECTLY.)
    val fluent = (0 until 10).map(i =>
      (i.toLong, "the cat sat on the mat again and again", "en", "fluent"))
    val gib = (0 until 10).map { i =>
      val s = i + 1
      val words = (0 until 11).map(k => s"w${(k * s) % 11}").mkString(" ")
      (100L + i, words, "en", "gib")
    }
    // a domain with NO bigram evidence (all single-token docs): must
    // still appear in the ledger at the floor share, not vanish
    // (round-8 review finding: the inner persrc join dropped it)
    val mono = (0 until 4).map(i => (200L + i, s"solo$i", "en", "mono"))
    val docs = (fluent ++ gib ++ mono).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val tmp = java.nio.file.Files.createTempDirectory("doremi").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = SparkEntry.queries("llm_doremi_weight")(spark, tmp)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(4), r.getLong(5)))).toMap
    val w = rows.map { case (s, (_, _, ppm)) => s -> ppm }
    assert(w("gib") > w("fluent"),
      s"gibberish domain must be upweighted: $w")
    // the bigram-less domain stays in the ledger: zero evidence, zero
    // excess, the floor share — sampleable, never silently dropped
    val (monoBg, monoExcess, monoPpm) = rows("mono")
    assert(monoBg == 0 && monoExcess == 0 && monoPpm > 0, s"mono: ${rows("mono")}")
    assert(monoPpm == w.values.min, "no-evidence domain draws exactly the floor share")
  }
}
