package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Round-10 dev probe: just the doc_gate and stream_join bench lanes at
  * their NEW defaults (builder-sized state shards, 40 k trigger batch,
  * partitioned MemoryStream) — a fast iteration signal for the r9
  * verdict item 1 target (both ≥ 15 k rows/s) without paying the full
  * 25-minute bench. `sbt "Test/runMain graft.tools.StreamLaneProbe"`.
  */
object StreamLaneProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark: SparkSession = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.streaming.numRecentProgressUpdates", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckRoot = java.nio.file.Files.createTempDirectory("probe_ck")

    // doc gate at defaults
    val docGateBase = java.sql.Timestamp.valueOf("2024-12-06 10:00:00")
    val docRows = graft.fixtures.Fixtures.documents(spark, sfDir)
      .selectExpr("doc_id", "lang", "text").collect()
    val docEvents = (0 until 20).flatMap { r =>
      docRows.map { row =>
        (row.getLong(0) + r * 1000000L,
          new java.sql.Timestamp(docGateBase.getTime + r * 60000L),
          row.getString(1), row.getString(2))
      }
    }
    val prevSp = spark.conf.get("spark.sql.shuffle.partitions")
    locally {
      val ms = MemoryStream[(Long, java.sql.Timestamp, String, String)](64)
      val ck = java.nio.file.Files.createTempDirectory(ckRoot, "ck").toString
      val q = graft.streaming.DocStream
        .curationGate(ms.toDS().toDF("doc_id", "ts", "lang", "text"), "ts", "10 minutes")
        .writeStream.outputMode("append")
        .format("noop").option("checkpointLocation", ck).start()
      try {
        val docBatches = docEvents.grouped(40000).toSeq
        ms.addData(docBatches.head)
        q.processAllAvailable()
        val t0 = System.nanoTime()
        docBatches.tail.foreach { b => ms.addData(b); q.processAllAvailable() }
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[probe] doc_gate shards=${spark.conf.get("spark.sql.shuffle.partitions")} " +
          f"rows/s=${(docEvents.length - docBatches.head.length) / sec}%.0f")
      } finally q.stop()
    }
    spark.conf.set("spark.sql.shuffle.partitions", prevSp)

    // stream-stream join at defaults
    val tickRows = graft.fixtures.Fixtures.ticks(spark, sfDir).selectExpr(
      "secid AS secId", "sec_code AS secCode", "ts", "time", "last",
      "open", "quantity", "tick_no AS tickNo").as[graft.schema.Tick]
      .collect().sortBy(t => (t.ts.getTime, t.tickNo))
    val batches = tickRows.grouped(50000).toSeq
    val joinShards = sys.env.get("PROBE_JOIN_SHARDS").map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(0)) // 0 = builder default
    joinShards.foreach { sh =>
      if (sh > 0) spark.conf.set("spark.sql.shuffle.partitions", sh.toString)
      val ms1 = MemoryStream[graft.schema.Tick](16)
      val ms2 = MemoryStream[graft.schema.Tick](16)
      val ck = java.nio.file.Files.createTempDirectory(ckRoot, "ck").toString
      val q = (if (sh > 0)
        graft.streaming.EnrichJoin.tradeQuoteWindow(
          ms1.toDS().toDF(), ms2.toDS().toDF(), "30 SECONDS", "1 minute", expectedKeys = 0L)
      else graft.streaming.EnrichJoin.tradeQuoteWindow(
        ms1.toDS().toDF(), ms2.toDS().toDF(), "30 SECONDS", "1 minute"))
        .writeStream.outputMode("append")
        .format("noop").option("checkpointLocation", ck).start()
      try {
        val jb = batches.take(5)
        ms1.addData(jb.head.toSeq); ms2.addData(jb.head.toSeq)
        q.processAllAvailable()
        val after = q.lastProgress.batchId
        val t0 = System.nanoTime()
        jb.tail.foreach { b =>
          ms1.addData(b.toSeq); ms2.addData(b.toSeq); q.processAllAvailable()
        }
        val sec = (System.nanoTime() - t0) / 1e9
        val rows = jb.tail.map(_.length * 2).sum
        val ps = q.recentProgress.filter(_.batchId > after)
        def dur(k: String) = ps.map(p =>
          Option(p.durationMs.get(k)).map(_.longValue).getOrElse(0L)).sum
        val ops = ps.flatMap(p => Option(p.stateOperators).toSeq.flatten)
        println(f"[probe] stream_join shards=${spark.conf.get("spark.sql.shuffle.partitions")} " +
          f"rows/s=${rows / sec}%.0f add_batch=${dur("addBatch")}ms " +
          f"commit=${ops.map(_.commitTimeMs).sum}ms update=${ops.map(_.allUpdatesTimeMs).sum}ms " +
          f"evict=${ops.map(_.allRemovalsTimeMs).sum}ms")
      } finally q.stop()
      spark.conf.set("spark.sql.shuffle.partitions", prevSp)
    }
    spark.stop()
  }
}
