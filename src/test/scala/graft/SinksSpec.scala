package graft

import java.nio.file.Files

import graft.fixtures.Fixtures
import graft.schema.Schemas
import graft.sources.{Sinks, Sources}

/** A2/A4 round-trip: key-clustered batch append + explicit-schema read. */
class SinksSpec extends SparkSuite {

  test("batchAppend clusters by key and round-trips through Sources.batch") {
    val dir = Files.createTempDirectory("sink_spec").toString
    val trades = Fixtures.trades(spark, "/root/testdata/sf0.001")
    Sinks.batchAppend(trades, dir, Schemas.tradesKey)

    val back = Sources.batch(spark, dir, Schemas.trades)
    // parquet reads surface as nullable; names+types must match the DDL
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Schemas.trades.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.count() == trades.count())

    // clustered layout: within each file, rows are sorted by the key
    // prefix, so min/max row-group stats can prune key ranges
    import spark.implicits._
    val perFileSorted = back
      .select(org.apache.spark.sql.functions.input_file_name().as("f"),
        org.apache.spark.sql.functions.col("secid"))
      .as[(String, Int)].collect().groupBy(_._1).values
    assert(perFileSorted.forall { rows =>
      val ids = rows.map(_._2).toSeq
      ids == ids.sorted
    })
  }

  // ---- JDBC sink (A4/A5 production parity), against embedded Derby ----
  // (the Derby jars ship with Spark for the Hive metastore, so the driver
  // is on the unmanaged classpath — no new dependency)

  private def derbyProps: java.util.Properties = {
    val p = new java.util.Properties()
    p.setProperty("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    p
  }

  test("jdbcAppend round-trips through an embedded Derby database") {
    import org.apache.spark.sql.functions.col
    val url = s"jdbc:derby:${Files.createTempDirectory("derby").toString}/graftdb;create=true"
    val df = Fixtures.trades(spark, "/root/testdata/sf0.001")
      .filter(col("sec_code") === "SEC03")
    Sinks.jdbcAppend(df, url, "trades_jdbc", derbyProps)

    val back = spark.read.jdbc(url, "trades_jdbc", derbyProps)
    val key = (r: org.apache.spark.sql.Row) => r.mkString("|")
    assert(back.select(df.columns.map(col): _*).collect().map(key).sorted.toSeq ==
      df.collect().map(key).sorted.toSeq)
  }

  test("jdbcStreamAppend lands every micro-batch in the table") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val url = s"jdbc:derby:${Files.createTempDirectory("derby_s").toString}/graftdb;create=true"
    val ck = Files.createTempDirectory("derby_ck").toString

    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Int, String, Double)]
    val q = Sinks.jdbcStreamAppend(
      ms.toDS().toDF("id", "code", "px"), url, "quotes_jdbc", derbyProps, ck)
    ms.addData(Seq((1, "SEC01", 10.0), (2, "SEC02", 20.0)))
    q.processAllAvailable()
    ms.addData(Seq((3, "SEC03", 30.0)))
    q.processAllAvailable()
    q.stop()

    val back = spark.read.jdbc(url, "quotes_jdbc", derbyProps)
      .as[(Int, String, Double)].collect().sortBy(_._1).toSeq
    assert(back == Seq((1, "SEC01", 10.0), (2, "SEC02", 20.0), (3, "SEC03", 30.0)))
  }

  // ---- exactly-once JDBC sink (round 12): epoch-ledger idempotence ----

  private def freshIdemDb(): String = {
    val url = s"jdbc:derby:${Files.createTempDirectory("derby_i").toString}/idem;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      conn.createStatement().executeUpdate(
        """CREATE TABLE t ("id" INT, "code" VARCHAR(8), "px" DOUBLE)""")
    } finally conn.close()
    Sinks.ensureEpochLedger(url, derbyProps)
    Sinks.ensureEpochLedger(url, derbyProps) // idempotent DDL: second call is a no-op
    url
  }

  test("jdbcBatchIdempotent: a replayed micro-batch inserts nothing twice") {
    import spark.implicits._
    val url = freshIdemDb()
    val df = Seq((1, "SEC01", 10.0), (2, "SEC02", 20.0), (3, "SEC03", 30.0))
      .toDF("id", "code", "px")
    Sinks.jdbcBatchIdempotent(df, url, "t", derbyProps, "sinkA", 7L)
    // the replay: same sink, same batch id — the crash-after-store-commit
    // window replays exactly this call
    Sinks.jdbcBatchIdempotent(df, url, "t", derbyProps, "sinkA", 7L)
    // a NEW batch id still appends
    Sinks.jdbcBatchIdempotent(
      Seq((4, "SEC04", 40.0)).toDF("id", "code", "px"),
      url, "t", derbyProps, "sinkA", 8L)
    val back = spark.read.jdbc(url, "t", derbyProps)
      .as[(Int, String, Double)].collect().sortBy(_._1).toSeq
    assert(back == Seq((1, "SEC01", 10.0), (2, "SEC02", 20.0),
      (3, "SEC03", 30.0), (4, "SEC04", 40.0)))
  }

  test("negative control: the PLAIN append sink double-inserts in the exact " +
      "kill window the epoch ledger closes") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = Files.createTempDirectory("derby_nc").toString
    val url = s"jdbc:derby:$root/nc;create=true"
    // PK-less table: with a PK Derby would REJECT the replayed rows and the
    // at-least-once bug would surface as an ingest error; without one it
    // surfaces as what it really is — silently duplicated data
    val conn = java.sql.DriverManager.getConnection(url)
    try conn.createStatement().executeUpdate(
      """CREATE TABLE t ("id" INT, "code" VARCHAR(8), "px" DOUBLE)""")
    finally conn.close()
    val rows = (1 to 40).map(i => (i, f"SEC$i%02d", i * 1.0))
    val batches = rows.grouped(10).toSeq
    val ms = MemoryStream[(Int, String, Double)](2)
    val key = s"nc|$root"
    graft.streaming.TransientFault.arm(key, 1)
    var fed = 0
    val outcome = graft.streaming.Supervisor.run(
      () => ms.toDS().toDF("id", "code", "px").writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$root/ck")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            _: Long) =>
          Sinks.jdbcAppend(b.toDF(), url, "t", derbyProps) // the plain A5 body
          graft.streaming.TransientFault.tripwire(key)     // post-commit kill
        }
        .start(),
      maxRestarts = 10, backoff = java.time.Duration.ZERO) { q =>
      while (fed < batches.length) {
        ms.addData(batches(fed)); fed += 1; q.processAllAvailable()
      }
      q.processAllAvailable()
    }
    assert(outcome.restarts == 1)
    val back = spark.read.jdbc(url, "t", derbyProps)
    // the killed micro-batch was Derby-committed, then replayed and
    // committed AGAIN — at-least-once, measured: its rows appear twice
    assert(back.count() == rows.length + batches.head.length)
    assert(back.select("id").distinct().count() == rows.length)
  }

  test("jdbcStreamAppendIdempotent: multi-batch stream lands exactly once; " +
      "ledger prunes below the retained horizon") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = Files.createTempDirectory("derby_si").toString
    val url = s"jdbc:derby:$root/si;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try conn.createStatement().executeUpdate(
      """CREATE TABLE t ("id" INT, "code" VARCHAR(8), "px" DOUBLE)""")
    finally conn.close()
    Sinks.ensureEpochLedger(url, derbyProps)
    val ms = MemoryStream[(Int, String, Double)](2)
    val q = Sinks.jdbcStreamAppendIdempotent(
      ms.toDS().toDF("id", "code", "px"), url, "t", derbyProps,
      s"$root/ck", "si_sink")
    try {
      (1 to 3).foreach { b =>
        ms.addData((1 to 10).map(i => (b * 100 + i, f"S$b%02d", i * 1.0)))
        q.processAllAvailable()
      }
    } finally q.stop()
    val back = spark.read.jdbc(url, "t", derbyProps)
    assert(back.count() == 30)
    assert(back.select("id").distinct().count() == 30)
    // ledger holds one claim per (batch, partition); pruning below the
    // checkpoint's earliest replayable batch keeps it horizon-bounded
    val ledger = spark.read.jdbc(url, Sinks.EpochLedgerTable, derbyProps)
      .filter(org.apache.spark.sql.functions.col("sink_id") === "si_sink")
    val before = ledger.count()
    assert(before >= 3)
    val dropped = Sinks.pruneEpochLedger(url, derbyProps, "si_sink", belowBatchId = 2)
    assert(dropped > 0 && ledger.count() == before - dropped)
    // claims at/above the horizon survive — a replay of batch 2 still skips
    assert(ledger.filter(org.apache.spark.sql.functions.col("batch_id") >= 2)
      .count() == before - dropped)
  }

  test("jdbcBatchIdempotent: ledger claims are scoped per sink and per partition") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val url = freshIdemDb()
    val df = Seq((1, "SEC01", 10.0), (2, "SEC02", 20.0), (3, "SEC03", 30.0),
      (4, "SEC04", 40.0)).toDF("id", "code", "px").repartition(2, col("id"))
    // which rows land in partition 0 under this hash partitioning
    val p0 = df.rdd.mapPartitionsWithIndex { (i, it) =>
      if (i == 0) it.map(_.getInt(0)) else Iterator.empty
    }.collect().toSet
    assert(p0.nonEmpty && p0.size < 4) // both partitions populated
    // pre-claim partition 0 of batch 9 (as if a prior attempt committed it)
    val conn = java.sql.DriverManager.getConnection(url)
    try conn.createStatement().executeUpdate(
      s"""INSERT INTO ${Sinks.EpochLedgerTable} ("sink_id", "batch_id", "part_id", "n_parts")
         |VALUES ('sinkA', 9, 0, 2)""".stripMargin)
    finally conn.close()
    Sinks.jdbcBatchIdempotent(df, url, "t", derbyProps, "sinkA", 9L)
    val landed = spark.read.jdbc(url, "t", derbyProps)
      .as[(Int, String, Double)].collect().map(_._1).toSet
    // only the unclaimed partition's rows landed — the claimed one skipped
    assert(landed == (1 to 4).toSet -- p0)
    // a DIFFERENT sink id over the same batch id is unaffected by sinkA's claims
    Sinks.jdbcBatchIdempotent(df, url, "t", derbyProps, "sinkB", 9L)
    val after = spark.read.jdbc(url, "t", derbyProps).count()
    assert(after == (4 - p0.size) + 4)
  }

  test("jdbcBatchIdempotent: a replay under a DIFFERENT partitioning fails " +
      "loudly instead of skipping rows the old partitioning never wrote") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val url = freshIdemDb()
    val df2 = Seq((1, "SEC01", 10.0), (2, "SEC02", 20.0), (3, "SEC03", 30.0),
      (4, "SEC04", 40.0)).toDF("id", "code", "px").repartition(2, col("id"))
    Sinks.jdbcBatchIdempotent(df2, url, "t", derbyProps, "sinkA", 5L)
    val df3 = df2.repartition(3, col("id"))
    // the count check runs DRIVER-SIDE before any task (round 13 advice:
    // partition transactions touch only their own claim row), so the
    // IllegalStateException surfaces directly, not wrapped in a task failure
    val e = intercept[IllegalStateException] {
      Sinks.jdbcBatchIdempotent(df3, url, "t", derbyProps, "sinkA", 5L)
    }
    assert(Option(e.getMessage).getOrElse("").contains("not the same plan"))
    // the guard protected the table: still exactly the first write's rows
    assert(spark.read.jdbc(url, "t", derbyProps).count() == 4)
  }

  test("jdbcBatchIdempotent: a SAME-COUNT replay that redistributes rows " +
      "between partitions fails loudly on the row-count ledger check") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val url = freshIdemDb()
    val df = Seq((1, "SEC01", 10.0), (2, "SEC02", 20.0), (3, "SEC03", 30.0),
      (4, "SEC04", 40.0)).toDF("id", "code", "px").repartition(2, col("id"))
    val p0Count = df.rdd.mapPartitionsWithIndex { (i, it) =>
      if (i == 0) it else Iterator.empty
    }.count()
    // simulate a prior attempt whose partition 0 committed a DIFFERENT
    // number of rows (same n_parts = 2, so the count-drift guard passes —
    // exactly the same-count redistribution case the r13 advice named)
    val conn = java.sql.DriverManager.getConnection(url)
    try conn.createStatement().executeUpdate(
      s"""INSERT INTO ${Sinks.EpochLedgerTable}
         |("sink_id", "batch_id", "part_id", "n_parts", "n_rows")
         |VALUES ('sinkC', 12, 0, 2, ${p0Count + 1})""".stripMargin)
    finally conn.close()
    val e = intercept[org.apache.spark.SparkException] {
      Sinks.jdbcBatchIdempotent(df, url, "t", derbyProps, "sinkC", 12L)
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("different row distribution")))
    // a MATCHING committed row count skips silently (the legitimate replay)
    val conn2 = java.sql.DriverManager.getConnection(url)
    try conn2.createStatement().executeUpdate(
      s"""UPDATE ${Sinks.EpochLedgerTable} SET "n_rows" = $p0Count
         |WHERE "sink_id" = 'sinkC' AND "part_id" = 0""".stripMargin)
    finally conn2.close()
    Sinks.jdbcBatchIdempotent(df, url, "t", derbyProps, "sinkC", 12L)
    // only the unclaimed partition's rows landed
    assert(spark.read.jdbc(url, "t", derbyProps).count() == 4 - p0Count)
  }

  test("jdbcBatchIdempotent: a same-count replay with DIFFERENT rows fails " +
      "loudly on the content-hash ledger check (round 14)") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val url = freshIdemDb()
    // prior attempt commits normally — claims carry n_rows AND content_hash
    val df1 = Seq((1, "SEC01", 10.0), (2, "SEC02", 20.0), (3, "SEC03", 30.0),
      (4, "SEC04", 40.0)).toDF("id", "code", "px").repartition(2, col("id"))
    Sinks.jdbcBatchIdempotent(df1, url, "t", derbyProps, "sinkH", 31L)
    // the replay keeps every id (same hash-partition layout, same
    // per-partition COUNTS — the n_rows guard passes) but carries
    // different payloads: exactly the count-preserving redistribution the
    // r13 scaladoc conceded was invisible
    val df2 = Seq((1, "SEC01", 11.0), (2, "SEC02", 21.0), (3, "SEC03", 31.0),
      (4, "SEC04", 41.0)).toDF("id", "code", "px").repartition(2, col("id"))
    val e = intercept[org.apache.spark.SparkException] {
      Sinks.jdbcBatchIdempotent(df2, url, "t", derbyProps, "sinkH", 31L)
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("content hash")))
    // the HONEST replay (same rows) still skips silently
    Sinks.jdbcBatchIdempotent(df1, url, "t", derbyProps, "sinkH", 31L)
    assert(spark.read.jdbc(url, "t", derbyProps).count() == 4)
  }

  test("ensureEpochLedger migrates a pre-r13 ledger in place — missing " +
      "n_rows/content_hash columns are ADDed, and the sink then runs") {
    import spark.implicits._
    val url = s"jdbc:derby:${Files.createTempDirectory("derby_m").toString}/mig;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      conn.createStatement().executeUpdate(
        """CREATE TABLE t ("id" INT, "code" VARCHAR(8), "px" DOUBLE)""")
      // the ORIGINAL r12 ledger DDL: no n_rows, no content_hash
      conn.createStatement().executeUpdate(
        s"""CREATE TABLE ${Sinks.EpochLedgerTable} (
           |  "sink_id" VARCHAR(200) NOT NULL,
           |  "batch_id" BIGINT NOT NULL,
           |  "part_id" INT NOT NULL,
           |  "n_parts" INT NOT NULL,
           |  PRIMARY KEY ("sink_id", "batch_id", "part_id"))""".stripMargin)
    } finally conn.close()
    // pre-migration, the back-fill UPDATE would throw on every batch —
    // ensure must detect the old shape and ALTER instead of skipping
    Sinks.ensureEpochLedger(url, derbyProps)
    Sinks.ensureEpochLedger(url, derbyProps) // still idempotent after ALTER
    val df = Seq((1, "SEC01", 10.0)).toDF("id", "code", "px")
    Sinks.jdbcBatchIdempotent(df, url, "t", derbyProps, "sinkM", 1L)
    Sinks.jdbcBatchIdempotent(df, url, "t", derbyProps, "sinkM", 1L) // replay skips
    assert(spark.read.jdbc(url, "t", derbyProps).count() == 1)
    val ledger = spark.read.jdbc(url, Sinks.EpochLedgerTable, derbyProps)
    assert(ledger.columns.map(_.toLowerCase).toSet
      .intersect(Set("n_rows", "content_hash")).size == 2)
  }

  test("clearUncommittedBatchMarker: clears only a marker with ZERO " +
      "committed partitions — the sanctioned replanned-replay remediation") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val url = freshIdemDb()
    // crash-before-any-task: only the marker exists for batch 40
    val conn = java.sql.DriverManager.getConnection(url)
    try conn.createStatement().executeUpdate(
      s"""INSERT INTO ${Sinks.EpochLedgerTable}
         |("sink_id", "batch_id", "part_id", "n_parts")
         |VALUES ('sinkR', 40, -1, 8)""".stripMargin)
    finally conn.close()
    val df = Seq((1, "SEC01", 10.0), (2, "SEC02", 20.0))
      .toDF("id", "code", "px").repartition(2, col("id"))
    // the replanned replay (2 parts vs the pinned 8) fails loudly...
    intercept[IllegalStateException] {
      Sinks.jdbcBatchIdempotent(df, url, "t", derbyProps, "sinkR", 40L)
    }
    // ...the admin helper clears the orphaned marker, and the replay runs
    assert(Sinks.clearUncommittedBatchMarker(url, derbyProps, "sinkR", 40L))
    Sinks.jdbcBatchIdempotent(df, url, "t", derbyProps, "sinkR", 40L)
    assert(spark.read.jdbc(url, "t", derbyProps).count() == 2)
    // a batch with committed partitions must NOT be clearable
    assert(!Sinks.clearUncommittedBatchMarker(url, derbyProps, "sinkR", 40L))
    val marker = spark.read.jdbc(url, Sinks.EpochLedgerTable, derbyProps)
      .filter(col("sink_id") === "sinkR" && col("part_id") === -1)
    assert(marker.count() == 1, "the live batch's marker must survive")
  }

  test("jdbcStreamAppendIdempotent: opt-in periodic prune keeps the ledger " +
      "bounded by the retention horizon across a long replay") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("derby_pr").toString
    val url = s"jdbc:derby:$root/pr;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try conn.createStatement().executeUpdate(
      """CREATE TABLE t ("id" INT, "code" VARCHAR(8), "px" DOUBLE)""")
    finally conn.close()
    Sinks.ensureEpochLedger(url, derbyProps)
    val ms = MemoryStream[(Int, String, Double)](2)
    val q = Sinks.jdbcStreamAppendIdempotent(
      ms.toDS().toDF("id", "code", "px"), url, "t", derbyProps,
      s"$root/ck", "pr_sink", pruneEvery = 2, minBatchesToRetain = 3)
    try {
      (0 until 12).foreach { b =>
        ms.addData((1 to 10).map(i => (b * 100 + i, f"B$b%02d", i * 1.0)))
        q.processAllAvailable()
      }
    } finally q.stop()
    // every row landed exactly once — pruning never touches data
    val back = spark.read.jdbc(url, "t", derbyProps)
    assert(back.count() == 120)
    assert(back.select("id").distinct().count() == 120)
    // last prune fired at batch 10 (10 % 2 == 0, 10 > 3) dropping claims
    // below 10 - 3 = 7: the ledger holds exactly batches 7..11 — O(retained
    // batches × partitions), not O(stream lifetime)
    val ledger = spark.read.jdbc(url, Sinks.EpochLedgerTable, derbyProps)
      .filter(col("sink_id") === "pr_sink")
    val batchIds = ledger.select("batch_id").as[Long].collect().toSeq
    assert(batchIds.min == 7 && batchIds.max == 11)
    // per batch: one claim per partition + the part_id = -1 count marker
    val nParts = ledger.select("n_parts").as[Int].collect().head
    assert(ledger.count() == 5L * (nParts + 1))
  }

  test("jdbcBatchIdempotent: the drift guard is ENFORCED via the batch " +
      "marker — a pre-registered different count fails BEFORE any task") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val url = freshIdemDb()
    // a concurrent (split-brain) driver registered batch 20 under 5
    // partitions — the marker's PK is what serializes the two drivers
    val conn = java.sql.DriverManager.getConnection(url)
    try conn.createStatement().executeUpdate(
      s"""INSERT INTO ${Sinks.EpochLedgerTable}
         |("sink_id", "batch_id", "part_id", "n_parts")
         |VALUES ('sinkD', 20, -1, 5)""".stripMargin)
    finally conn.close()
    val df = Seq((1, "SEC01", 10.0), (2, "SEC02", 20.0))
      .toDF("id", "code", "px").repartition(2, col("id"))
    val e = intercept[IllegalStateException] {
      Sinks.jdbcBatchIdempotent(df, url, "t", derbyProps, "sinkD", 20L)
    }
    assert(Option(e.getMessage).getOrElse("").contains("not the same plan"))
    // nothing ran, nothing landed
    assert(spark.read.jdbc(url, "t", derbyProps).count() == 0)
  }
}
