package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming document-ingest parity ([[graft.streaming.DocStream]]):
  * the stream gate must agree with the batch curation surface on every
  * verdict it emits, suppress re-deliveries, and hold the windowed
  * profile to the batch aggregate on on-time data.
  */
case class DocEvent(docId: Long, ts: Timestamp, lang: String, text: String)

class DocStreamSpec extends SparkSuite {

  private def t(min: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-12-06 10:$min%02d:$sec%02d")

  private def fixtureEvents: Seq[DocEvent] = {
    import spark.implicits._
    graft.fixtures.Fixtures.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("lang"), col("text")).as[(Long, String, String)]
      .collect().toSeq
      .map { case (id, lang, text) => DocEvent(id, t((id % 30).toInt), lang, text) }
  }

  test("streaming-only contract: both operators reject batch frames loudly") {
    val batch = graft.fixtures.Fixtures.documents(spark, "/root/testdata/sf0.001")
      .withColumn("ts", lit(t(0)))
    for (f <- Seq(
        () => graft.streaming.DocStream.curationGate(batch, "ts", "10 minutes"),
        () => graft.streaming.DocStream.windowStats(batch, "ts", "1 minute", "1 minute"))) {
      val e = intercept[IllegalArgumentException](f())
      assert(e.getMessage.contains("streaming operator"))
    }
  }

  test("curation gate: one verdict per distinct content, quality ≡ batch, dups suppressed") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val events = fixtureEvents
    val redelivered = events.filter(_.docId % 5 == 0) // at-least-once sink replays

    val ms = MemoryStream[DocEvent]
    val q = graft.streaming.DocStream
      .curationGate(ms.toDF(), "ts", "10 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("doc_gate").start()
    Seq(events, redelivered).foreach { b => ms.addData(b); q.processAllAvailable() }
    q.stop()

    val got = spark.table("doc_gate")
      .select("text_hash", "quality", "keep").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getBoolean(2)))

    // exactly one row per distinct content, re-deliveries suppressed
    val batch = graft.fixtures.Fixtures.documents(spark, "/root/testdata/sf0.001")
    val nHashes = batch.select(md5(col("text"))).distinct().count()
    assert(got.length == nHashes,
      s"expected one verdict per distinct content ($nHashes), got ${got.length}")
    assert(got.map(_._1).distinct.length == got.length)

    // per-content quality must equal the batch llm_quality_score signal
    // (same text => same score regardless of WHICH arrival survived)
    val want = SparkEntry.queries("llm_quality_score")(spark, "/root/testdata/sf0.001")
      .join(batch.select(col("doc_id"), md5(col("text")).as("text_hash")), "doc_id")
      .select("text_hash", "quality", "keep").distinct().collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getBoolean(2))).toSet
    assert(got.toSet.subsetOf(want), "stream verdicts must match the batch signal")
  }

  test("windowed profile: on-time windows ≡ batch aggregate, late doc dropped") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val onTime = Seq(
      DocEvent(1, t(0, 10), "en", "a b c"),
      DocEvent(2, t(0, 40), "en", "d e"),
      DocEvent(3, t(1, 5), "de", "f g h i"))
    val advance = Seq(DocEvent(4, t(8, 0), "en", "j k"))
    // watermark now 10:07:00 — this document is LATE for window 10:00
    val late = DocEvent(5, t(0, 50), "en", "x x x x x x")
    val flush = Seq(late, DocEvent(6, t(20, 0), "en", "l"))

    val ms = MemoryStream[DocEvent]
    val q = graft.streaming.DocStream
      .windowStats(ms.toDF(), "ts", "1 minute", "1 minute")
      .writeStream.outputMode("append").format("memory")
      .queryName("doc_windows").start()
    Seq(onTime, advance, flush).foreach { b => ms.addData(b); q.processAllAvailable() }
    q.stop()

    val want = (onTime ++ advance).toDF()
      .withColumn("win_start", date_trunc("minute", col("ts")))
      .groupBy("win_start", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
      .filter(col("win_start") < t(20, 0))
      .collect().map(_.toSeq).toSet
    val got = spark.table("doc_windows")
      .filter(col("win_start") < t(20, 0))
      .collect().map(_.toSeq).toSet
    assert(got == want, s"got=$got\nwant=$want")
    // the late doc's 6 tokens are absent from the closed 10:00/en window
    val w0 = spark.table("doc_windows")
      .filter(col("win_start") === t(0) && col("lang") === "en")
      .select("n_docs", "n_tokens").collect()
    assert(w0.length == 1 && w0(0).getLong(0) == 2L && w0(0).getLong(1) == 5L)
  }
}
