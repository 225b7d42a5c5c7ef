package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The map-side [[graft.expr.CdcChunks]] fold against an INDEPENDENT
  * implementation — the pre-rewrite window-form pipeline spelled
  * entirely in Spark SQL built-ins (`md5`, `conv`, prefix-sum windows).
  * The two paths share no code: the fold hashes through JVM
  * MessageDigest over UTF8String bytes, the reference through Spark's
  * codegen'd md5/conv. Equality over a corpus that includes accents,
  * CJK, emoji and mixed-width tokens pins the UTF-8 handling the
  * ASCII-only fixture corpus (and therefore the DuckDB oracle) cannot
  * exercise.
  */
class CdcExprPropertySpec extends SparkSuite {

  private val Mod = 8

  /** Deterministic pseudo-random multilingual corpus. */
  private def corpus: Seq[(Long, String)] = {
    val alphabet = Vector(
      "alpha", "beta", "the", "données", "café", "straße", "日本語",
      "データ", "模型", "🙂", "naïve", "Ωmega", "x1", "y2", "ключ",
      "значение", "emoji🚀mix", "ÅÄÖ")
    val rnd = new scala.util.Random(20260814L)
    (0 until 60).map { i =>
      val n = 1 + rnd.nextInt(40)
      (i.toLong, (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.size))).mkString(" "))
    }
  }

  test("map-side fold ≡ window-form pipeline on a multilingual corpus") {
    graft.expr.GraftFunctions.register(spark)
    import spark.implicits._
    val docs = corpus.toDF("doc_id", "text")

    // the expression under test
    val fold = docs
      .select(col("doc_id"), explode(expr(s"cdc_chunks(split(text, ' '), $Mod)")).as("c"))
      .select(col("doc_id"), col("c.sig").as("sig"), col("c.len").as("len"),
        col("c.start").cast("long").as("start"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    // the independent reference: the pre-rewrite window-form plan,
    // Spark SQL built-ins end to end
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val byChunk = Window.partitionBy("doc_id", "chunk_no")
    val ref = docs
      .withColumn("tk", split(col("text"), " "))
      .select(col("doc_id"), posexplode(col("tk")).as(Seq("pos0", "w")))
      .withColumn("pos", col("pos0") + 1)
      .withColumn("bnd", expr(
        s"CASE WHEN CAST(conv(substr(md5(w), 1, 8), 16, 10) AS BIGINT) % $Mod = 0 THEN 1 ELSE 0 END"))
      .withColumn("chunk_no", sum("bnd").over(byDoc) - col("bnd"))
      .withColumn("off", col("pos") - min("pos").over(byChunk))
      .groupBy("doc_id", "chunk_no")
      .agg(
        sum(expr("CAST(conv(substr(md5(concat(off, '|', w)), 1, 10), 16, 10) AS BIGINT)")).as("sig"),
        count(lit(1)).as("len"),
        min("pos").cast("long").as("start"))
      .select("doc_id", "sig", "len", "start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    assert(fold.nonEmpty && fold == ref,
      s"fold-only: ${(fold -- ref).take(3)}; ref-only: ${(ref -- fold).take(3)}")
  }

  test("null tokens are skipped, not NPE: positions preserved, no len contribution") {
    graft.expr.GraftFunctions.register(spark)
    // Direct-SQL users can feed array<string> with nulls (containsNull is
    // not constrained); defined behavior: a null occupies its position
    // but contributes no term, no len, and can't be a boundary. Reference:
    // simulate that contract in the test using Spark's own md5/conv for
    // the hashes (independent of the expression's MessageDigest path).
    val tokens: Seq[String] = Seq("alpha", null, "beta", "the", null, "café", null)
    val sqlArray = tokens.map {
      case null => "CAST(NULL AS STRING)"
      case w    => s"'$w'"
    }.mkString("array(", ", ", ")")
    val got = spark.sql(s"SELECT cdc_chunks($sqlArray, $Mod) AS c")
      .selectExpr("explode(c) AS c").selectExpr("c.sig", "c.len", "c.start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq

    def hexInt(s: String, digits: Int): Long = spark.sql(
      s"SELECT CAST(conv(substr(md5('$s'), 1, $digits), 16, 10) AS BIGINT) AS v")
      .collect().head.getLong(0)
    val expected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
    var sig = 0L; var len = 0L; var start = 1
    tokens.zipWithIndex.foreach { case (w, i) =>
      val pos = i + 1
      if (w != null) {
        sig += hexInt(s"${pos - start}|$w", 10)
        len += 1
        if (hexInt(w, 8) % Mod == 0) {
          expected += ((sig, len, start)); sig = 0L; len = 0L; start = pos + 1
        }
      }
    }
    if (len > 0) expected += ((sig, len, start))
    assert(got == expected.toSeq)
  }

  test("chunks partition every document: lengths sum to token count") {
    graft.expr.GraftFunctions.register(spark)
    import spark.implicits._
    val docs = corpus.toDF("doc_id", "text")
    val sums = docs
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"),
        expr(s"aggregate(cdc_chunks(split(text, ' '), $Mod), CAST(0 AS BIGINT), (a, c) -> a + c.len)").as("s"))
    assert(sums.filter(col("n") =!= col("s")).count() == 0)
  }
}
