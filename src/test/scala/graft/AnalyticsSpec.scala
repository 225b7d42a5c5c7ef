package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.queries.EventQueries

/** ClickHouse-analytics-family invariants (evt_funnel / evt_retention /
  * evt_sequence_match / llm_cms_sketch), each checked against an
  * INDEPENDENT in-test derivation — brute-force chain search for the
  * funnel (the DP's correctness witness), plain Scala replays for the
  * rest (the Round9OpsSpec pattern).
  */
class AnalyticsSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.01"
  private val W = 86400000000L

  private def stepEvents: Map[Long, Seq[(Long, Int)]] = {
    val steps = Map("view" -> 1, "click" -> 2, "purchase" -> 3)
    graft.fixtures.Fixtures.events(spark, dir)
      .select(col("user_id"), expr("unix_micros(ts)"), col("event_type"))
      .collect()
      .flatMap(r => steps.get(r.getString(2)).map(s => (r.getLong(0), r.getLong(1), s)))
      .groupBy(_._1)
      .view.mapValues(_.map(e => (e._2, e._3)).sortBy(identity).toSeq).toMap
  }

  // brute-force max chain level: exists t1<=t2<=...<=tk, step i at ti,
  // tk - t1 <= W (non-strict order — the operator's documented semantics)
  private def bruteLevel(ev: Seq[(Long, Int)]): Int = {
    val v = ev.filter(_._2 == 1).map(_._1)
    val c = ev.filter(_._2 == 2).map(_._1)
    val p = ev.filter(_._2 == 3).map(_._1)
    val l3 = v.exists(tv => c.exists(tc => tc >= tv &&
      p.exists(tp => tp >= tc && tp - tv <= W)))
    if (l3) 3
    else if (v.exists(tv => c.exists(tc => tc >= tv && tc - tv <= W))) 2
    else if (v.nonEmpty) 1
    else 0
  }

  test("funnel DP == brute-force chain search on the fixture (every user)") {
    val expected = stepEvents.values.map(bruteLevel)
      .filter(_ >= 1).toSeq
      .flatMap(l => 1 to l)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = SparkEntry.queries("evt_funnel")(spark, dir).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("funnel DP keeps the LATE chain the greedy-earliest fold loses") {
    // greedy-min-start: view@0 → click@1h → purchase@50h busts the 24 h
    // window; the valid chain starts at view@40h. start[i] = MAX chain
    // start is exactly what rescues it.
    import spark.implicits._
    val h = 3600000000L
    val ev = Seq((0 * h, 1), (1 * h, 2), (40 * h, 1), (41 * h, 2), (50 * h, 3))
    val lvl = Seq(ev).toDF("raw")
      .select(expr("transform(raw, x -> named_struct('t', x._1, 's', x._2))").as("a"))
      .select(expr(EventQueries.funnelLevelExpr(W, 3)).as("lvl"))
      .head().getInt(0)
    assert(lvl == 3)
    // and the window genuinely binds: drop the late chain → level 2
    val lvl2 = Seq(ev.take(2) :+ ((50 * h, 3))).toDF("raw")
      .select(expr("transform(raw, x -> named_struct('t', x._1, 's', x._2))").as("a"))
      .select(expr(EventQueries.funnelLevelExpr(W, 3)).as("lvl"))
      .head().getInt(0)
    assert(lvl2 == 2)
  }

  test("funnel window edge: chain spanning exactly W is in, W+1µs is out") {
    import spark.implicits._
    def lvlOf(ev: Seq[(Long, Int)]): Int = Seq(ev).toDF("raw")
      .select(expr("transform(raw, x -> named_struct('t', x._1, 's', x._2))").as("a"))
      .select(expr(EventQueries.funnelLevelExpr(W, 3)).as("lvl"))
      .head().getInt(0)
    assert(lvlOf(Seq((0L, 1), (1L, 2), (W, 3))) == 3)
    assert(lvlOf(Seq((0L, 1), (1L, 2), (W + 1, 3))) == 2)
    // same-instant chain (non-strict semantics): all three at t=7 count
    assert(lvlOf(Seq((7L, 1), (7L, 2), (7L, 3))) == 3)
    // order matters: purchase before click never chains
    assert(lvlOf(Seq((0L, 1), (5L, 3), (9L, 2))) == 2)
  }

  test("retention replay: cohort matrix recomputed from collected events") {
    val days = graft.fixtures.Fixtures.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val cohort = days.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val offsets = Set(0L, 1L, 3L, 7L, 14L)
    val expected = days
      .map { case (u, d) =>
        (cohort(u), java.time.temporal.ChronoUnit.DAYS.between(cohort(u), d)) }
      .filter(x => offsets(x._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = SparkEntry.queries("evt_retention")(spark, dir).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getInt(1).toLong) -> r.getLong(2)).toMap
    assert(got == expected)
    // day-0 row of every cohort counts the full cohort
    val sizes = cohort.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    sizes.foreach { case (day, n) => assert(got((day, 0L)) == n) }
  }

  test("sequence-match replay: single sorted scan per user") {
    val evs = graft.fixtures.Fixtures.events(spark, dir)
      .select(col("user_id"), expr("unix_micros(ts)"), col("event_type"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .groupBy(_._1)
    val expected = evs.collect { case (u, rows) =>
      var (sg, er) = (Option.empty[Long], Option.empty[Long])
      var (np, nc, first) = (0L, 0L, -1L)
      rows.sortBy(r => (r._2, r._3, r._4)).foreach { case (_, t, ty, _) =>
        if (ty == "purchase") {
          np += 1
          val clean = sg.isDefined && (er.isEmpty || sg.get > er.get)
          if (clean) { nc += 1; if (first < 0) first = t }
        }
        if (ty == "signup") sg = Some(sg.fold(t)(math.max(_, t)))
        if (ty == "error") er = Some(er.fold(t)(math.max(_, t)))
      }
      u -> ((np, nc, first))
    }.filter(_._2._1 > 0)
    val got = SparkEntry.queries("evt_sequence_match")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected.toMap)
  }

  test("cms replay + the count-min theorem (never underestimates)") {
    val md = MessageDigest.getInstance("MD5")
    def h60(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val bigrams = graft.fixtures.Fixtures.documents(spark, dir)
      .select("text").collect()
      .flatMap(_.getString(0).split(' ').sliding(2).filter(_.length == 2).map(_.mkString(" ")))
    val cnt = bigrams.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val buckets = cnt.toSeq
      .flatMap { case (tok, n) => (0 until 4).map(r => ((r, h60(s"$r:$tok") % 256), n)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    def est(tok: String): Long =
      (0 until 4).map(r => buckets((r, h60(s"$r:$tok") % 256))).min
    val top = cnt.toSeq.sortBy { case (t, n) => (-n, t) }.take(50)
    val expected = top.map { case (t, n) => t -> ((n, est(t), est(t) - n)) }.toMap
    val got = SparkEntry.queries("llm_cms_sketch")(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
    got.values.foreach { case (exact, e, over) =>
      assert(e >= exact && over == e - exact) // CMS one-sided error
    }
    assert(got.values.count(_._3 > 0) > 10) // the fixture exercises collisions
  }
}
