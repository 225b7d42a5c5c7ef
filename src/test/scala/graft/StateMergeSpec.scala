package graft

import java.nio.file.Files

import org.apache.spark.sql.{Row, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType, TimestampType}

import graft.expr.{GraftFunctions, TopKBuffer}
import graft.sources.{Sinks, Sources}

/** The incremental-aggregation family (round 9): ClickHouse
  * `-State`/`-Merge` combinators ([[graft.expr.TopKState]] /
  * [[graft.expr.TopKMerge]]), the SummingMergeTree parts rollup
  * ([[Sinks.materializeSummingParts]] in its PRODUCTION Append mode —
  * the registered entry only exercises Overwrite), and the text-format
  * ingest edge on inputs the fixture corpus can't produce (embedded
  * newlines, quotes, commas, nulls).
  */
class StateMergeSpec extends SparkSuite {

  private def registered() = { GraftFunctions.register(spark); spark }

  // ---- TopKState / TopKMerge ----

  test("state->persist->merge equals direct topk in the exact regime") {
    val s = registered()
    import s.implicits._
    // 40 distinct values (< capacity 64) spread over 4 parts
    val rows = (1 to 2000).map(i => (i % 4, s"v${i % 40}"))
    val df = rows.toDF("part", "v")
    df.createOrReplaceTempView("smoke")
    val direct = s.sql("SELECT graft_topk(v, 10) AS arr FROM smoke")
      .head().getSeq[String](0)
    val out = Files.createTempDirectory("graft_states_").toString
    s.sql("SELECT part, graft_topk_state(v, 10) AS st FROM smoke GROUP BY part")
      .write.mode(SaveMode.Overwrite).parquet(out)
    val merged = s.read.parquet(out)
      .selectExpr("graft_topk_merge(st, 10) AS arr")
      .head().getSeq[String](0)
    assert(merged == direct)
  }

  test("over-capacity merge keeps the true heavy hitters (SpaceSaving bound)") {
    val s = registered()
    import s.implicits._
    // 200 distinct values (> capacity 64) in each of 4 parts; 5 planted
    // heavy hitters at 100x the tail frequency survive any SpaceSaving
    // eviction schedule
    val tail = for { p <- 0 until 4; i <- 1 to 200 } yield (p, s"t$i")
    val heavy = for { p <- 0 until 4; h <- 1 to 5; _ <- 1 to 100 } yield (p, s"H$h")
    val df = (tail ++ heavy).toDF("part", "v")
    df.createOrReplaceTempView("skewed")
    val top5 = s.sql(
      """SELECT slice(arr, 1, 5) AS top5 FROM (
        |  SELECT graft_topk_merge(st, 10) AS arr FROM (
        |    SELECT part, graft_topk_state(v, 10) AS st FROM skewed GROUP BY part))""".stripMargin)
      .head().getSeq[String](0).toSet
    assert(top5 == Set("H1", "H2", "H3", "H4", "H5"))
  }

  test("wire format is canonical: equal sketches give identical bytes") {
    val b1 = new TopKBuffer(8)
    val b2 = new TopKBuffer(8)
    Seq("a", "b", "a", "c").foreach(b1.add)
    Seq("c", "a", "b", "a").foreach(b2.add) // different insertion order
    assert(TopKBuffer.write(b1).sameElements(TopKBuffer.write(b2)))
    val rt = TopKBuffer.read(TopKBuffer.write(b1))
    assert(rt.capacity == 8 && rt.counters == b1.counters)
  }

  test("merge folds into the wider buffer, never truncating a part state") {
    // Part A (capacity 200): 100 values at count 100, plus "z" at count 40
    // — z ranks BELOW the top 64, so folding A into the default 64-wide
    // merge buffer would silently drop its mass. Part B: z at count 70.
    // True total: z = 110, the global #1; a fold that truncated A first
    // would answer a1 (100). The wider-wins fold must keep z on top.
    val a = new TopKBuffer(200)
    for (i <- 1 to 100; _ <- 1 to 100) a.add(f"a$i%03d")
    for (_ <- 1 to 40) a.add("z")
    val b = new TopKBuffer(200)
    for (_ <- 1 to 70) b.add("z")
    val s = registered()
    import s.implicits._
    Seq(TopKBuffer.write(a), TopKBuffer.write(b)).toDF("st")
      .createOrReplaceTempView("mixedcap")
    val arr = s.sql("SELECT graft_topk_merge(st, 10) AS arr FROM mixedcap")
      .head().getSeq[String](0)
    assert(arr.head == "z")
  }

  // ---- SummingMergeTree parts rollup, production Append mode ----

  test("per-batch Append parts merge to the one-shot aggregate") {
    val s = registered()
    import s.implicits._
    val out = Files.createTempDirectory("graft_summing_").toString
    val b1 = Seq(("A", 1L), ("A", 2L), ("B", 5L)).toDF("k", "q")
    val b2 = Seq(("A", 10L), ("C", 7L)).toDF("k", "q")
    // two deliveries arrive separately — each appends ONE part
    Sinks.materializeSummingParts(b1.withColumn("part", lit(1)), "part",
      Seq("k"), Seq("qty" -> sum(col("q")), "cnt" -> count(lit(1))), out)
    Sinks.materializeSummingParts(b2.withColumn("part", lit(2)), "part",
      Seq("k"), Seq("qty" -> sum(col("q")), "cnt" -> count(lit(1))), out)
    val merged = Sinks.readSummingMerged(s, out, Seq("k"), Seq("qty", "cnt"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(merged.toSeq == Seq(("A", 13L, 3L), ("B", 5L, 1L), ("C", 7L, 1L)))
    // the rollup holds KEYS x PARTS rows, not facts
    assert(s.read.parquet(out).count() == 4)
  }

  // ---- streaming materialized-view maintenance ----

  test("streaming micro-batches maintain a topKState MV answering the batch query") {
    // the AggregatingMergeTree STREAMING shape: each micro-batch appends
    // ONE state row to the MV parts table (foreachBatch = the insert
    // trigger); any reader answers top-k from states without seeing the
    // stream — and must get exactly what a batch topk over all rows says
    val s = registered()
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val mv = java.nio.file.Files.createTempDirectory("graft_mv_").toString
    val q = ms.toDS().toDF("v").writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        batch.selectExpr(s"CAST($id AS BIGINT) AS part", "graft_topk_state(v, 3) AS st")
          .write.mode(SaveMode.Append).parquet(mv)
      }
      .start()
    val b1 = Seq("a", "a", "b", "c")
    val b2 = Seq("b", "b", "b", "d")
    ms.addData(b1); q.processAllAvailable()
    ms.addData(b2); q.processAllAvailable()
    q.stop()
    val merged = s.read.parquet(mv)
      .selectExpr("graft_topk_merge(st, 3) AS arr").head().getSeq[String](0)
    val direct = (b1 ++ b2).toDF("v")
      .selectExpr("graft_topk(v, 3) AS arr").head().getSeq[String](0)
    assert(merged == direct && merged == Seq("b", "a", "c"))
    assert(s.read.parquet(mv).count() == 2) // one state row per micro-batch
  }

  // ---- text-format edge on hostile inputs ----

  test("csv round-trips embedded newlines, quotes, commas and unicode") {
    val s = registered()
    import s.implicits._
    val hostile = Seq(
      (1L, "plain words"),
      (2L, "comma, separated, values"),
      (3L, "a \"quoted\" phrase"),
      (4L, "line one\nline two\r\nline three"),
      (5L, "trailing space "),
      (6L, "кириллица и \"ещё\", запятые\nперенос"))
    val df = hostile.toDF("id", "text")
    val out = Files.createTempDirectory("graft_csv_").toString
    Sources.writeCsv(df, out)
    val back = Sources.readCsv(s, out, df.schema).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(back.toSeq == hostile)
  }

  test("json round-trips nulls, timestamps and doubles; csv maps empty->null (documented)") {
    val s = registered()
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("t", TimestampType),
      StructField("txt", StringType)))
    val rows = Seq(
      Row(1L, java.sql.Timestamp.valueOf("2024-12-04 10:21:33"), "x"),
      Row(2L, null, null),
      Row(3L, java.sql.Timestamp.valueOf("1969-07-20 20:17:00"), ""))
    val df = s.createDataFrame(s.sparkContext.parallelize(rows, 1), schema)
    val jout = Files.createTempDirectory("graft_json_").toString
    Sources.writeJsonl(df, jout)
    val jback = Sources.readJsonl(s, jout, schema).orderBy("id").collect()
    assert(jback.toSeq == rows)
    // CSV: same rows, but the empty string comes back null — the
    // documented format limit (Sources scaladoc)
    val cout = Files.createTempDirectory("graft_csv2_").toString
    Sources.writeCsv(df, cout)
    val cback = Sources.readCsv(s, cout, schema).orderBy("id").collect()
    assert(cback(0) == rows(0) && cback(1) == rows(1))
    assert(cback(2).getTimestamp(1) == rows(2).getTimestamp(1)
      && cback(2).isNullAt(2))
  }
}
