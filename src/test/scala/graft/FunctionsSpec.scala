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

  test("graft_last_by resolves equal ords deterministically (byte tiebreak)") {
    // the 'ord unique per group' contract used to fail SILENTLY (round-5
    // advice): equal ords kept whichever row a partitioning happened to
    // see first. Now the winner is the max serialized value bytes — the
    // same row under EVERY partitioning/arrival order.
    GraftFunctions.register(spark)
    import spark.implicits._
    for (parts <- Seq(1, 2, 5)) {
      Seq((1, 7L, "b"), (1, 7L, "a"), (1, 3L, "z"), (2, 1L, "q"))
        .toDF("g", "seq", "v").repartition(parts).createOrReplaceTempView("lbdup")
      val got = spark.sql(
        "SELECT g, graft_last_by(v, seq) AS w FROM lbdup GROUP BY g ORDER BY g")
        .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
      assert(got == Seq((1, "b"), (2, "q")), s"parts=$parts")
    }
  }

  test("graft_capped_longs: complete at/under the cap, NULL over it, merges across partitions") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // group 1: 5 values (< cap) — complete list
    // group 2: 40 values (> cap 8) — truncated: NULL, never a partial
    //   prefix an unpaired caller could mistake for data (round-7 contract)
    // group 3: exactly 8 values (== cap) — full but NOT truncated: complete
    val rows = (1 to 5).map(i => (1, i.toLong)) ++ (1 to 40).map(i => (2, i.toLong)) ++
      (1 to 8).map(i => (3, i.toLong))
    new scala.util.Random(7).shuffle(rows).toDF("g", "v")
      .repartition(5).createOrReplaceTempView("cl")
    val got = spark.sql(
      """SELECT g, sort_array(graft_capped_longs(v, 8)) AS l, count(1) AS c
        |FROM cl GROUP BY g""".stripMargin)
      .collect().map(r => (r.getInt(0), Option(r.getSeq[Long](1)), r.getLong(2))).sortBy(_._1)
    assert(got(0)._2.contains(1L to 5L) && got(0)._3 == 5L)
    assert(got(1)._2.isEmpty, "over-cap group must evaluate to NULL")
    assert(got(1)._3 == 40L) // the paired exact count still gates the filter
    assert(got(2)._2.contains(1L to 8L) && got(2)._3 == 8L)
    // stays on the object-hash path alongside a declarative count
    val plan = spark.sql(
      "SELECT g, graft_capped_longs(v, 8), count(1) FROM cl GROUP BY g")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
  }

  test("graft_capped_longs: NULL or non-positive cap literal fails at analysis, loudly") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq((1, 1L)).toDF("g", "v").createOrReplaceTempView("cl0")
    for (capSql <- Seq("CAST(NULL AS INT)", "0", "-3")) {
      val e = intercept[Exception] {
        spark.sql(s"SELECT graft_capped_longs(v, $capSql) FROM cl0 GROUP BY g").collect()
      }
      assert(e.getMessage.contains("graft_capped_longs cap"),
        s"cap=$capSql raised: ${e.getMessage}")
    }
  }

  test("graft_tdigest_quantiles: analysis-time type checks, SQL round-trip") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // a non-numeric column must fail ANALYSIS, not CCE at execution
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq("a").toDF("s")
        .selectExpr("graft_tdigest_quantiles(s, array(0.5D)) AS q").collect()
    }
    assert(e.getMessage.toLowerCase.contains("numeric"), e.getMessage)
    // and the happy path answers through plain SQL on integers (update
    // path accepts any numeric runtime box)
    val q = spark.range(1, 101)
      .selectExpr("graft_tdigest_quantiles(id, array(0.5D)) AS q")
      .collect().head.getSeq[Double](0)
    assert(q.head > 40 && q.head < 61, s"median of 1..100 was ${q.head}")
  }

  test("graft_tdigest_*: NULL quantile elements fail at analysis, not NPE at execution") {
    GraftFunctions.register(spark)
    val states = spark.range(1, 10)
      .selectExpr("graft_tdigest_state(id) AS st")
    for (ps <- Seq("array(0.5D, CAST(NULL AS DOUBLE))", "CAST(NULL AS ARRAY<DOUBLE>)")) {
      val e1 = intercept[org.apache.spark.sql.AnalysisException] {
        spark.range(1, 10).selectExpr(s"graft_tdigest_quantiles(id, $ps) AS q").collect()
      }
      assert(e1.getMessage.contains("must not be NULL"), s"quantiles/$ps: ${e1.getMessage}")
      val e2 = intercept[org.apache.spark.sql.AnalysisException] {
        states.selectExpr(s"graft_tdigest_merge(st, $ps) AS q").collect()
      }
      assert(e2.getMessage.contains("must not be NULL"), s"merge/$ps: ${e2.getMessage}")
    }
  }
}
