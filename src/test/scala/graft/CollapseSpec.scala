package graft

import org.apache.spark.sql.functions._

import graft.fixtures.Fixtures
import graft.ingest.Collapse

/** CollapsingMergeTree / VersionedCollapsingMergeTree semantics and plan
  * shape over the sign-column correction fixture.
  */
class CollapseSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"
  private val pack = Set("sec_code", "board", "buy_sell", "period")

  private def fx = Fixtures.tradesCollapsing(spark, dir)

  test("finalState: amended keys resolve to the new state, cancelled keys vanish") {
    val base = Fixtures.trades(spark, dir)
    val got = Collapse.finalState(fx.drop("version"),
      Seq("trade_no"), "sign", "ingest_seq", pack)
    val rows = got.select("trade_no", "price").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = base.select("trade_no", "price").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rows.keySet == want.keySet.filterNot(_ % 100 == 0))
    rows.foreach { case (k, p) =>
      val expected = if (k % 10 == 0) want(k) + 1 else want(k)
      assert(p == expected, s"trade $k: got $p want $expected")
    }
    assert(rows.nonEmpty)
  }

  test("versionedFinal is arrival-order-free and agrees with finalState") {
    val cmt = Collapse.finalState(fx.drop("version"),
      Seq("trade_no"), "sign", "ingest_seq", pack)
    // scramble arrival: versioned collapse never reads ingest_seq, so a
    // shuffled delivery must produce the identical relation
    val scrambled = fx.drop("ingest_seq").orderBy(rand(42)).repartition(7)
    val vc = Collapse.versionedFinal(scrambled,
      Seq("trade_no"), "sign", "version", pack)
    val a = cmt.collect().map(_.toSeq).toSet
    val b = vc.drop("version").select(cmt.columns.map(col): _*)
      .collect().map(_.toSeq).toSet
    assert(a == b)
    assert(a.nonEmpty)
    // and the surviving version column is 2 exactly for amended keys
    val versions = vc.select("trade_no", "version").collect()
      .map(r => r.getLong(0) -> r.getInt(1))
    versions.foreach { case (k, v) =>
      assert(v == (if (k % 10 == 0) 2 else 1), s"trade $k version $v")
    }
  }

  test("an in-flight cancel (net -1) is excluded from the versioned FINAL") {
    import spark.implicits._
    // state v1 arrives, then a cancel for v2 whose state row is still in
    // flight: FINAL must show v1, not the dangling v2 cancel
    val df = Seq(
      (1L, 10.0, 1, 1), // key 1, v1 state
      (1L, 11.0, -1, 2), // key 1, v2 cancel, state not yet delivered
      (2L, 20.0, 1, 1)
    ).toDF("k", "price", "sign", "version")
    val got = Collapse.versionedFinal(df, Seq("k"), "sign", "version")
      .select("k", "price", "version").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSet
    assert(got == Set((1L, 10.0, 1), (2L, 20.0, 1)))
  }

  test("streaming position tracker equals the batch sign-weighted aggregate") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = fx.select(col("secid"), col("price"), col("quantity"), col("sign"))
      .as[(Int, Double, Long, Int)].collect()
      .map { case (s, p, q, g) => graft.streaming.CollapseRow(s, p, q, g) }
    val ms = MemoryStream[graft.streaming.CollapseRow]
    val q = graft.streaming.PositionStream.positions(ms.toDS().toDF())
      .writeStream.outputMode("complete").format("memory")
      .queryName("pos_parity").start()
    try {
      // several micro-batches so corrections land in LATER batches than
      // the states they cancel — the case the running fold exists for
      rows.grouped(rows.length / 5 + 1).foreach(b => ms.addData(b.toSeq))
      q.processAllAvailable()
      val got = spark.table("pos_parity").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
      val want = graft.streaming.PositionStream.positions(
        fx.select("secid", "price", "quantity", "sign")).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
      assert(got == want)
      assert(got.size == 60)
    } finally q.stop()
  }

  test("both collapse plans stay on hash aggregation — no sort-agg, no window") {
    val p1 = Collapse.finalState(fx.drop("version"),
      Seq("trade_no"), "sign", "ingest_seq", pack)
      .queryExecution.executedPlan.toString
    val p2 = Collapse.versionedFinal(fx.drop("ingest_seq"),
      Seq("trade_no"), "sign", "version", pack)
      .queryExecution.executedPlan.toString
    for ((p, n) <- Seq(p1 -> "finalState", p2 -> "versionedFinal")) {
      assert(p.contains("HashAggregate"), s"$n lost the hash path:\n$p")
      assert(!p.contains("SortAggregate"), s"$n fell to SortAggregate:\n$p")
      assert(!p.contains("Window"), s"$n uses a window:\n$p")
    }
  }
}
