package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ch.{ChDashboard, ChDialect}
import graft.queries.{ChQueries, TradeQueries}

/** The complete-front-end proof: every one of the reference dashboard's 20
  * `rawSql` panels, read from the dashboard JSON and translated by
  * [[graft.ch.ChDialect]], returns exactly the rows of the corresponding
  * hand-transliterated Q-series query (q01..q20, FIDELITY.md mapping) on
  * the same fixture tables. Spark-vs-Spark equality here composes with the
  * Q-series' DuckDB-green oracles to certify the translator end to end.
  *
  * Rendering accommodations (mirroring the Q-series' own harness notes):
  *   - panel 3 (q04): the verbatim `topK(10)(sec_code)` yields an array
  *     column; it is rendered through the same `concat_ws` the q04 entry
  *     uses before comparing.
  *   - panels 0-2 (q01-q03): `ORDER BY vol DESC LIMIT 10` is
  *     tie-sensitive; the Q-series adds a deterministic tiebreaker, the
  *     verbatim SQL cannot. The comparison is therefore on the sorted
  *     top-10 measure values plus the tie-free prefix of keys.
  */
class ChDialectSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  // TradeQueries.all leads with q01..q22 in dashboard order
  private lazy val refs = TradeQueries.all.take(20)

  private def translated(i: Int): DataFrame =
    spark.sql(ChQueries.translatePanel(spark, dir, i))

  private def rows(df: DataFrame): Seq[Seq[String]] =
    df.collect().toSeq.map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("\u0000"))

  test("the dashboard exposes exactly the 20 studied panels") {
    assert(ChDashboard.rawSqls().length == 20)
    graft.expr.GraftFunctions.register(spark)
  }

  for (i <- 0 until 20) {
    val ref = refs(i)
    test(s"panel $i verbatim ≡ ${ref.name}") {
      graft.expr.GraftFunctions.register(spark)
      val want = ref.fn(spark, dir)
      val gotRaw = translated(i)
      val got =
        if (i == 3) gotRaw.select(col(gotRaw.columns(0)),
          concat_ws(",", col(gotRaw.columns(1))), col(gotRaw.columns(2)))
        else gotRaw
      assert(got.columns.length == want.columns.length,
        s"schema arity: ${got.columns.toSeq} vs ${want.columns.toSeq}")
      val aligned = got.toDF(want.columns: _*)
      if (i <= 2) {
        // tie-sensitive top-10: measures must agree exactly; keys must
        // agree wherever the measure is unique
        val w = want.collect().map(r => (String.valueOf(r.get(0)), String.valueOf(r.get(1))))
        val g = aligned.collect().map(r => (String.valueOf(r.get(0)), String.valueOf(r.get(1))))
        assert(g.map(_._2).sorted.toSeq == w.map(_._2).sorted.toSeq, "top-10 measure multiset")
        val uniq = w.groupBy(_._2).filter(_._2.length == 1).values.flatten.toSet
        val gSet = g.toSet
        for (p <- uniq) assert(gSet.contains(p), s"unique-measure row $p missing")
      } else {
        assert(rows(aligned) == rows(want))
      }
    }
  }

  // the other half of the dashboard's query surface: the SQL template
  // variables (q21/q22), verbatim — q22 exercises the left-preference
  // rule on its unqualified `board` under a secid-only join
  for ((name, qIdx) <- Seq("sec_code" -> 20, "sec_code_etf" -> 21)) {
    val ref = TradeQueries.all(qIdx)
    test(s"templating variable $name verbatim ≡ ${ref.name}") {
      graft.expr.GraftFunctions.register(spark)
      val want = ref.fn(spark, dir)
      val got = ChQueries.runTemplating(spark, dir, name).toDF(want.columns: _*)
      assert(rows(got) == rows(want))
    }
  }

  // ---- plan accountability (round 7, r6 verdict item 1) ----
  // The transliterated Q-series pins broadcast(securities) explicitly;
  // the verbatim SQL path must get the same physical shape from Catalyst
  // on its own (the dim is ≤65k rows in the reference, db.go:35 — a
  // sort-merge join here would shuffle the 100 TB fact side). Assert it
  // for every panel + templating query that joins the securities view.
  test("every translated panel joins securities via broadcast, never sort-merge") {
    graft.expr.GraftFunctions.register(spark)
    val translatedAll: Seq[(String, String)] =
      (0 until 20).map(i => s"panel $i" -> ChQueries.translatePanel(spark, dir, i)) ++
        ChDashboard.templatingSqls().map { case (n, raw) =>
          s"templating $n" -> ChQueries.translateSql(spark, dir, raw)
        }
    val joining: Seq[(String, DataFrame)] = translatedAll
      .collect { case (n, sql) if sql.contains("transaq_securities") =>
        n -> spark.sql(sql)
      }
    assert(joining.size >= 10) // most panels + both templating queries join
    val fmt = org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for ((label, df) <- joining) {
      val plan = df.queryExecution.explainString(fmt)
      assert(plan.contains("BroadcastHashJoin"),
        s"panel $label: securities join is not broadcast:\n$plan")
      assert(!plan.contains("SortMergeJoin"),
        s"panel $label: sort-merge join in the verbatim path:\n$plan")
    }
  }

  test("translate rejects nothing it shouldn't: ANSI SQL passes through") {
    val ansi = "SELECT sec_code, sum(quantity) AS q FROM transaq_trades GROUP BY sec_code"
    val out = ChDialect.translate(ansi, ChQueries.params,
      Map("transaq_trades" -> Set("sec_code", "quantity")))
    assert(out == ansi)
  }

  // ---- hardening pinned by the round-5 self-review ----

  private val twoTables = Map(
    "transaq_trades" -> Set("secid", "board", "note"),
    "transaq_securities" -> Set("secid", "board"))

  test("explicit INNER JOIN does not get mistaken for a table alias") {
    val out = ChDialect.translate(
      "SELECT board FROM default.transaq_trades INNER JOIN default.transaq_securities s " +
        "ON transaq_trades.secid = s.secid WHERE board = 'TQBR'",
      Map.empty, twoTables)
    assert(out.contains("WHERE transaq_trades.board = 'TQBR'"))
    assert(out.contains("SELECT transaq_trades.board"))
    assert(!out.toLowerCase.contains("inner.board"))
  }

  test("string literals survive every rewrite") {
    val out = ChDialect.translate(
      "SELECT note FROM default.transaq_trades JOIN default.transaq_securities s " +
        "ON transaq_trades.secid = s.secid " +
        "WHERE note = 'default.board (minute' AND board IN ['US$1', 'B']",
      Map.empty, twoTables)
    assert(out.contains("'default.board (minute'"), out)
    assert(out.contains("transaq_trades.board IN ('US$1', 'B')"), out)
  }

  // ---- hardening pinned by the round-5 ADVICE ----

  test("a table name that is only a PREFIX of a longer identifier is not 'present'") {
    // transaq_trades_v2 must not count as transaq_trades: with only one
    // real table in FROM there is no ambiguity and `board` stays bare
    val out = ChDialect.translate(
      "SELECT board FROM transaq_trades_v2 JOIN other o ON transaq_trades_v2.secid = o.secid " +
        "WHERE board = 'TQBR'",
      Map.empty, twoTables)
    assert(out.contains("WHERE board = 'TQBR'"), out)
    assert(!out.contains("transaq_trades.board"), out)
  }

  test("a table name inside a FROM string literal is not 'present'") {
    val out = ChDialect.translate(
      "SELECT board, note FROM transaq_securities " +
        "WHERE note = 'from transaq_trades join x'",
      Map.empty, twoTables)
    // only one REAL table → no ambiguity qualification anywhere
    assert(out.contains("SELECT board, note"), out)
  }

  test("a macro that prefixes an unknown variable does not clobber it") {
    val out = ChDialect.substituteMacros(
      "SELECT $interval, $intervalx, ${interval}", Map("interval" -> "5"))
    assert(out == "SELECT 5, $intervalx, 5", out)
  }

  test("unbalanced parentheses fail loudly, not out of bounds") {
    assertThrows[IllegalArgumentException] {
      ChDialect.translate("SELECT a FROM t WHERE (a > 1", Map.empty, Map.empty)
    }
  }

  test("property: dialect-free SQL is always a fixed point of translate") {
    import org.scalacheck.{Gen, Prop, Test => PTest}
    val ident = Gen.choose(1, 3).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    val literal = Gen.oneOf(
      Gen.choose(0, 9999).map(_.toString),
      ident.map(s => s"'$s with space$$ (x'")) // quotes shield even $ and (
    val predicate = for { c <- ident; v <- literal; op <- Gen.oneOf("=", ">", "<=") }
      yield s"$c $op $v"
    val query = for {
      cols <- Gen.choose(1, 3).flatMap(Gen.listOfN(_, ident))
      tbl <- ident
      preds <- Gen.choose(0, 2).flatMap(Gen.listOfN(_, predicate))
      grouped <- Gen.oneOf(true, false)
    } yield {
      val where = if (preds.isEmpty) "" else preds.mkString(" WHERE ", " AND ", "")
      val group = if (grouped) s" GROUP BY ${cols.head}" else ""
      s"SELECT ${cols.mkString(", ")} FROM $tbl$where$group"
    }
    val prop = Prop.forAll(query) { q =>
      ChDialect.translate(q, ChQueries.params, Map("transaq_trades" -> Set("a"))) == q
    }
    val r = PTest.check(PTest.Parameters.default.withMinSuccessfulTests(100), prop)
    assert(r.passed, r.status.toString)
  }
}
