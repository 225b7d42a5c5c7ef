package graft

import java.sql.Timestamp

import graft.expr.GraftFunctions

/** SQL surface of the custom functions — the two non-ANSI constructs of
  * the reference dialect (SURVEY §2.C).
  */
class FunctionsSpec extends SparkSuite {

  test("to_start_of_interval floors like ClickHouse toStartOfInterval") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT to_start_of_interval(TIMESTAMP '2024-12-06 10:03:45', 300) AS m,
        |       to_start_of_interval(TIMESTAMP '2024-12-06 10:05:00', 300) AS e""".stripMargin)
      .collect().head
    assert(r.getTimestamp(0) == Timestamp.valueOf("2024-12-06 10:00:00"))
    assert(r.getTimestamp(1) == Timestamp.valueOf("2024-12-06 10:05:00"))
  }

  test("graft_topk works from SQL and respects count-desc/value-asc order") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq("a", "b", "b", "c", "c", "c").toDF("v").createOrReplaceTempView("tkv")
    val got = spark.sql("SELECT graft_topk(v, 2) FROM tkv").collect().head.getSeq[String](0)
    assert(got == Seq("c", "b"))
  }

  test("graft_topk handles more distinct values than k and merges across partitions") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val vs = (1 to 200).flatMap(i => Seq.fill(i % 7 + 1)(s"v${i % 13}"))
    vs.toDF("v").repartition(8).createOrReplaceTempView("tkv2")
    val exact = vs.groupBy(identity).view.mapValues(_.size).toSeq
      .sortBy { case (v, c) => (-c, v) }.take(5).map(_._1)
    val got = spark.sql("SELECT graft_topk(v, 5) FROM tkv2").collect().head.getSeq[String](0)
    assert(got == exact)
  }

  // the interpreted higher-order spellings char_ngrams/word_ngrams replaced
  private val charNgramsInterp = (n: Int) =>
    s"""CASE WHEN length(text) >= $n THEN
       |  transform(sequence(1, length(text) - ${n - 1}), i -> substring(text, i, $n))
       |ELSE array() END""".stripMargin
  private val bigramsInterp =
    """CASE WHEN size(tk) >= 2 THEN array_distinct(
      |  transform(sequence(1, size(tk) - 1),
      |    i -> concat(element_at(tk, i), ' ', element_at(tk, i + 1))))
      |ELSE array() END""".stripMargin

  test("char_ngrams matches the interpreted transform spelling incl. edges and unicode") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val texts = Seq("", "a", "ab", "abc", "abcd", "the quick brown fox",
      "aaaaaa", "héllo wörld ünïcode ß", "日本語のテキスト", "x y")
    texts.toDF("text").createOrReplaceTempView("ngt")
    for (n <- Seq(2, 3, 8)) {
      val rows = spark.sql(
        s"""SELECT char_ngrams(text, $n, false) AS fast, ${charNgramsInterp(n)} AS slow,
           |       char_ngrams(text, $n, true) AS fastd,
           |       array_distinct(${charNgramsInterp(n)}) AS slowd
           |FROM ngt""".stripMargin).collect()
      rows.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1), s"n=$n plain")
        assert(r.getSeq[String](2) == r.getSeq[String](3), s"n=$n dedup")
      }
    }
  }

  test("word_ngrams matches the interpreted bigram spelling") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val texts = Seq("", "one", "one two", "one two three",
      "a b a b a", "the the the", "x y z x y z")
    texts.toDF("text").createOrReplaceTempView("wgt")
    val rows = spark.sql(
      s"""SELECT word_ngrams(tk, 2, true) AS fast, $bigramsInterp AS slow
         |FROM (SELECT split(text, ' ') AS tk FROM wgt)""".stripMargin).collect()
    rows.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
  }

  test("graft_last_by ≡ max_by across partitions, null ords ignored") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // many groups + shuffled arrival order forces partial/final merge;
    // ord 0 carries a NULL ord variant via the CASE below
    val rows = (1 to 500).flatMap { g =>
      (1 to 4).map(s => (g, s.toLong, s"v$g-$s", s * 1.5))
    }
    new scala.util.Random(42).shuffle(rows).toDF("g", "seq", "name", "x")
      .repartition(7).createOrReplaceTempView("lbt")
    val got = spark.sql(
      """SELECT g,
        |  graft_last_by(struct(name, x), CAST(CASE WHEN seq = 4 THEN NULL ELSE seq END AS BIGINT)) AS lb,
        |  max_by(struct(name, x), CASE WHEN seq = 4 THEN NULL ELSE seq END) AS mb
        |FROM lbt GROUP BY g""".stripMargin).collect()
    assert(got.length == 500)
    got.foreach { r =>
      assert(r.getStruct(1) == r.getStruct(2), s"group ${r.get(0)}")
      assert(r.getStruct(1).getString(0).endsWith("-3")) // seq 4 is NULL-ord
    }
    // and the plan is the point: ObjectHashAggregate, not SortAggregate
    val plan = spark.sql(
      "SELECT g, graft_last_by(struct(name, x), seq) FROM lbt GROUP BY g")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
  }
}
