package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The EventQueries claim that `session_window` drives the STREAMING form
  * unchanged: watermark + session merge across micro-batches, append-mode
  * emission once the watermark passes a session's end.
  */
case class SessEvt(user_id: Long, ts: Timestamp)

class SessionsSpec extends SparkSuite {

  private def evt(u: Long, t: String) = SessEvt(u, Timestamp.valueOf(s"2024-12-06 $t"))

  test("streaming session_window merges across micro-batches and emits on watermark") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val ms = MemoryStream[SessEvt]
    val query = ms.toDS()
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("s"), col("sw.end").as("e"),
        col("n_events"))
      .writeStream.outputMode("append").format("memory")
      .queryName("stream_sessions").start()

    // batch 1 opens two sessions; batch 2 EXTENDS user 1's session across
    // the micro-batch boundary; batch 3 advances the watermark past both
    // session ends so they finalize and append
    Seq(
      Seq(evt(1, "10:00:00"), evt(1, "10:10:00"), evt(2, "10:05:00")),
      Seq(evt(1, "10:20:00")),
      Seq(evt(9, "13:00:00"))
    ).foreach { b => ms.addData(b); query.processAllAvailable() }
    query.stop()

    val got = spark.table("stream_sessions")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3))).toSet
    val want = Set(
      (1L, Timestamp.valueOf("2024-12-06 10:00:00"),
        Timestamp.valueOf("2024-12-06 10:50:00"), 3L),
      (2L, Timestamp.valueOf("2024-12-06 10:05:00"),
        Timestamp.valueOf("2024-12-06 10:35:00"), 1L))
    assert(got == want, s"got=$got")
  }
}
