package graft

/** Matryoshka truncation recall (`llm_mrl_recall`) invariants on the
  * planted-structure fixture: full-width prefix IS the exact ranking
  * (control recall 1.0), recall is monotone non-decreasing in prefix
  * width, and the memory column is the prefix-bytes arithmetic.
  */
class MrlRecallSpec extends SparkSuite {

  private lazy val rows = {
    val df = SparkEntry.queries("llm_mrl_recall")(spark, "/root/testdata/sf0.001")
    df.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
  }

  test("one row per width; full-width control has recall exactly 1.0") {
    assert(rows.keySet == Set("mrl16", "mrl32", "mrl64"))
    val (nx, nh, rq, _, _) = rows("mrl64")
    assert(nh == nx && rq == 1000000L, s"control: $nh/$nx ($rq)")
  }

  test("recall is monotone non-decreasing in prefix width") {
    assert(rows("mrl16")._3 <= rows("mrl32")._3 &&
      rows("mrl32")._3 <= rows("mrl64")._3, rows.toString)
  }

  test("memory column is the prefix-bytes arithmetic") {
    for ((m, bytes) <- Seq(("mrl16", 64L), ("mrl32", 128L), ("mrl64", 256L))) {
      val (_, _, _, b, ratio) = rows(m)
      assert(b == bytes && ratio == 256000000L / bytes, s"$m: $b/$ratio")
    }
  }
}
