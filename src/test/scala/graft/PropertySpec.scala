package graft

import java.sql.Timestamp

import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}

import graft.expr.TopKBuffer
import graft.ingest.{CandleBuilder, Dedup}

/** Property-based invariants (SURVEY §5.3): candle OHLC ordering, dedup
  * idempotence / last-write-wins, TopK exactness in the small-cardinality
  * regime.
  */
class PropertySpec extends SparkSuite {

  import spark.implicits._

  private val params = Parameters.default.withMinSuccessfulTests(30)
  private def assertProp(p: Prop): Unit = {
    val r = check(params, p)
    assert(r.passed, r.status.toString)
  }

  // ---- candle invariants -------------------------------------------------

  private val tickGen: Gen[PT] = for {
    sec <- Gen.oneOf("A", "B", "C")
    no <- Gen.choose(1L, 1000000L)
    last <- Gen.frequency(5 -> Gen.choose(1, 500).map(_.toDouble), 1 -> Gen.const(0.0))
    qty <- Gen.choose(1L, 50L)
    sec_off <- Gen.choose(0, 600) // ten minutes
  } yield PT(sec, no, last, qty,
    Timestamp.valueOf(s"2024-12-06 10:0${sec_off / 60 % 10}:${10 + sec_off % 50}"))

  test("batchCandles: low <= open/close <= high; volume = sum of quantities") {
    assertProp(Prop.forAll(Gen.listOfN(40, tickGen)) { ticks =>
      val df = ticks.toDF()
      val out = CandleBuilder.batchCandles(df).collect()
      val volByGroup = ticks.groupBy(t =>
        (t.sec_code, t.ts.getTime / 60000)).view.mapValues(_.map(_.quantity).sum)
      out.forall { r =>
        val (o, c, h, l, v) = (r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6), r.getLong(7))
        val key = (r.getString(1), r.getTimestamp(0).getTime / 60000)
        l <= o && o <= h && l <= c && c <= h && volByGroup(key) == v
      }
    })
  }

  // ---- dedup -------------------------------------------------------------

  private val verGen: Gen[PV] = for {
    k1 <- Gen.choose(0, 5)
    k2 <- Gen.oneOf("x", "y")
    p <- Gen.choose(0, 1000).map(_.toDouble)
    seq <- Gen.choose(1L, 100L)
  } yield PV(k1, k2, p, seq)

  test("dedup: idempotent, one row per key, winner has the max seq") {
    assertProp(Prop.forAll(Gen.listOfN(30, verGen)) { rows0 =>
      // make seq unique per key (the operator's documented precondition)
      val rows = rows0.zipWithIndex.map { case (v, i) => v.copy(seq = v.seq * 1000 + i) }
      val df = rows.toDF()
      val once = Dedup.lastWriteWins(df, Seq("k1", "k2"), "seq")
      val twice = Dedup.lastWriteWins(once, Seq("k1", "k2"), "seq")
      val got = once.collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(3)).toMap
      val want = rows.groupBy(v => (v.k1, v.k2)).view.mapValues(_.map(_.seq).max).toMap
      got == want && twice.collect().length == once.collect().length
    })
  }

  // ---- TopK sketch -------------------------------------------------------

  test("TopKBuffer is exact while distinct values fit the capacity") {
    assertProp(Prop.forAll(Gen.listOf(Gen.oneOf("a", "b", "c", "d", "e", "f"))) { vs =>
      val buf = new TopKBuffer(64)
      vs.foreach(buf.add)
      val exact = vs.groupBy(identity).view.mapValues(_.size.toLong).toSeq
        .sortBy { case (v, c) => (-c, v) }.map(_._1).take(3)
      buf.topK(3).toSeq == exact
    })
  }

  test("TopKBuffer merge is exact in the small regime") {
    assertProp(Prop.forAll(
      Gen.listOf(Gen.oneOf("a", "b", "c")), Gen.listOf(Gen.oneOf("b", "c", "d"))) { (l, r) =>
      val b1 = new TopKBuffer(64); l.foreach(b1.add)
      val b2 = new TopKBuffer(64); r.foreach(b2.add)
      b1.merge(b2)
      val exact = (l ++ r).groupBy(identity).view.mapValues(_.size.toLong).toSeq
        .sortBy { case (v, c) => (-c, v) }.map(_._1).take(2)
      b1.topK(2).toSeq == exact
    })
  }

  // ---- salting -----------------------------------------------------------

  test("salted two-stage sum equals direct groupBy sum for any distribution") {
    assertProp(Prop.forAll(Gen.listOfN(60, verGen)) { rows =>
      val df = rows.toDF()
      val direct = df.groupBy("k1", "k2")
        .agg(org.apache.spark.sql.functions.sum("payload").as("sum_payload"))
        .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getDouble(2)).toMap
      val salted = graft.ingest.Salt
        .saltedSum(df, Seq("k1", "k2"), "payload",
          org.apache.spark.sql.functions.col("seq"), buckets = 7)
        .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getDouble(2)).toMap
      salted == direct
    })
  }

  // ---- round-6 aggregate laws --------------------------------------------

  /** The capped collect's contract: paired with the exact count, the
    * `count <= cap` filter yields COMPLETE, partitioning-invariant lists;
    * over-cap groups evaluate to NULL (round 7 — a partition-dependent
    * prefix must never be readable as data).
    */
  test("graft_capped_longs + count law: complete under cap, NULL over, partition-invariant") {
    graft.expr.GraftFunctions.register(spark)
    val rowGen = for {
      g <- Gen.choose(0, 4)
      v <- Gen.choose(0L, 1000L)
    } yield PG(g, v)
    assertProp(Prop.forAll(Gen.listOfN(40, rowGen), Gen.oneOf(1, 3, 7)) { (rows, parts) =>
      val cap = 6
      val got = rows.toDF().repartition(parts)
        .createOrReplaceTempView("pg")
      val out = spark.sql(
        s"SELECT g, sort_array(graft_capped_longs(v, $cap)) AS l, count(1) AS c " +
          "FROM pg GROUP BY g")
        .collect().map(r => r.getInt(0) -> (Option(r.getSeq[Long](1)), r.getLong(2))).toMap
      val want = rows.groupBy(_.g).view.mapValues(_.map(_.v).sorted).toMap
      out.forall { case (g, (l, c)) =>
        c == want(g).length &&
          (if (c <= cap) l.contains(want(g)) // at/under cap: complete
           else l.isEmpty) // over cap: NULL, partition-invariantly
      }
    })
  }

  /** The last-by tiebreak law: even with DUPLICATE ords (contract
    * violation), the winner is a pure function of the data — identical
    * under every partitioning.
    */
  test("graft_last_by is partitioning-invariant even under duplicate ords") {
    graft.expr.GraftFunctions.register(spark)
    val rowGen = for {
      g <- Gen.choose(0, 3)
      ord <- Gen.choose(0L, 5L) // small range → frequent collisions
      v <- Gen.alphaStr.map(_.take(6))
    } yield PV(g, v, 0d, ord)
    assertProp(Prop.forAll(Gen.listOfN(25, rowGen)) { rows =>
      def run(parts: Int): Map[Int, String] = {
        rows.toDF().repartition(parts).createOrReplaceTempView("pld")
        spark.sql("SELECT k1, graft_last_by(k2, seq) FROM pld GROUP BY k1")
          .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
      }
      val a = run(1)
      Seq(2, 5).forall(run(_) == a)
    })
  }

  // ---- the dashboard's own internal redundancy (Q1 vs Q2) ----------------

  test("Q1 and Q2 agree on net notional for shared leaders (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val q1 = graft.queries.TradeQueries.q01.fn(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val q2 = graft.queries.TradeQueries.q02.fn(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val shared = q1.keySet intersect q2.keySet
    assert(shared.nonEmpty)
    shared.foreach { sec => assert(q1(sec) == q2(sec), s"sec $sec") }
  }

  // ---- collapse invariants ------------------------------------------------

  /** Per key: how many versions were written, and whether the last one
    * was finally cancelled outright.
    */
  private val chainGen: Gen[Map[Long, (Int, Boolean)]] =
    Gen.mapOfN(8, for {
      k <- Gen.choose(1L, 50L)
      n <- Gen.choose(1, 4)
      cancelled <- Gen.oneOf(true, false)
    } yield k -> (n, cancelled))

  test("collapse: random correction chains — FINALs agree and match the chain spec") {
    assertProp(Prop.forAll(chainGen, Gen.choose(0L, 100L)) { (chains, shuffleSeed) =>
      // the write discipline: state v at seq 2v-1, its cancel at seq 2v
      val rows = chains.toSeq.flatMap { case (k, (n, cancelled)) =>
        (1 to n).flatMap { v =>
          val state = CollapseIn(k, 100.0 + v, 1, v, 2L * v - 1)
          val cancel = CollapseIn(k, 100.0 + v, -1, v, 2L * v)
          if (v < n || cancelled) Seq(state, cancel) else Seq(state)
        }
      }
      // mapOfN collapses duplicate keys but never below one chain, and
      // every chain emits at least its v1 state row
      locally {
        val df = rows.toDF()
        val expect = chains.collect {
          case (k, (n, false)) => k -> (100.0 + n)
        }
        val cmt = graft.ingest.Collapse
          .finalState(df.drop("version"), Seq("k"), "sign", "seq")
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        // versioned collapse must not care about arrival order
        val shuffled = df.orderBy(org.apache.spark.sql.functions.rand(shuffleSeed))
        val vc = graft.ingest.Collapse
          .versionedFinal(shuffled.drop("seq"), Seq("k"), "sign", "version")
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        cmt == expect && vc == expect
      }
    })
  }
}

/** Top-level for Spark encoder derivation. */
case class PT(sec_code: String, tick_no: Long, last: Double,
    quantity: Long, ts: Timestamp)
case class PV(k1: Int, k2: String, payload: Double, seq: Long)
case class PG(g: Int, v: Long)
case class CollapseIn(k: Long, price: Double, sign: Int, version: Int, seq: Long)
