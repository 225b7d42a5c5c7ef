package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions.{col, count, dayofmonth, lit, sum, to_date}

import graft.fixtures.Fixtures
import graft.sources.Sinks

/** The 100 TB layout contract: once trades are materialized
  * day-partitioned and key-sorted, the day predicate prunes partitions
  * before file IO and sec_code/time predicates reach the parquet scan as
  * pushed filters — the properties the in-harness derived scans cannot
  * have (VERDICT round 1). Queries against this layout carry the derived
  * `trade_date` predicate alongside the time range (what Grafana's
  * `$__fromTime` macro expands to on a partitioned table).
  */
class LayoutSpec extends SparkSuite {

  test("materialized trades prune partitions and push code filters") {
    val dir = Files.createTempDirectory("trades_layout").toString
    Sinks.materializeTrades(Fixtures.trades(spark, "/root/testdata/sf0.001"), dir)

    val t = spark.read.parquet(dir)
    assert(new java.io.File(dir).list().count(_.startsWith("trade_date=")) == 3)

    val oneDay = t.filter(col("trade_date") === "2024-12-06" &&
      col("time") >= "2024-12-06 00:00:00" && col("time") <= "2024-12-06 23:59:59" &&
      col("sec_code") === "SEC03")

    val scan = oneDay.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: FileSourceScanExec => f
    }.get
    // partition pruning: only the 12-06 directory survives the listing
    val survivingFiles = scan.relation.location
      .listFiles(scan.partitionFilters, scan.dataFilters)
      .flatMap(_.files.map(_.getPath.toString))
    assert(survivingFiles.nonEmpty &&
      survivingFiles.forall(_.contains("trade_date=2024-12-06")),
      survivingFiles.take(3).mkString(","))
    // predicate pushdown: sec_code equality reaches the parquet scan
    assert(scan.metadata("PushedFilters").contains("EqualTo(sec_code,SEC03)"),
      scan.metadata("PushedFilters"))

    // and the data round-trips: same rows as filtering the source
    val want = Fixtures.trades(spark, "/root/testdata/sf0.001")
      .filter(col("time") >= "2024-12-06 00:00:00" &&
        col("time") <= "2024-12-06 23:59:59" && col("sec_code") === "SEC03")
      .count()
    assert(oneDay.count() == want)
  }

  test("merge-time compaction ≡ read-path lastWriteWins") {
    import graft.ingest.Dedup
    import graft.schema.Schemas

    val versioned = Fixtures.tradesVersioned(spark, "/root/testdata/sf0.001")
    val dir = Files.createTempDirectory("trades_compacted").toString
    Sinks.materializeTradesCompacted(versioned, "ingest_seq", dir)

    val cols = versioned.columns.toSeq
    val key = (r: org.apache.spark.sql.Row) => r.mkString("|")
    val got = spark.read.parquet(dir)
      .select(cols.map(col): _*) // partitionBy reorders; restore source order
      .withColumn("time", col("time").cast("timestamp"))
      .collect().map(key).sorted.toSeq
    val want = Dedup.lastWriteWins(versioned, Schemas.tradesKey, "ingest_seq")
      .select(cols.map(col): _*)
      .collect().map(key).sorted.toSeq
    assert(got == want)
    // and it actually compacted: fewer rows than the versioned input
    assert(got.size < versioned.count())
  }

  test("mutation delete rewrites only the affected day partition") {
    val dir = Files.createTempDirectory("trades_mutation").toString
    val t = Fixtures.trades(spark, "/root/testdata/sf0.001")
    Sinks.materializeTrades(t, dir)
    def listing(day: String): Seq[(String, Long)] = {
      val d = new java.io.File(s"$dir/trade_date=$day")
      d.listFiles().toSeq.map(f => f.getName -> f.length()).sorted
    }
    val days = t.select(to_date(col("time")).as("d")).distinct()
      .orderBy("d").collect().map(_.getDate(0).toString)
    assert(days.length == 3)
    val before = days.map(listing)
    Sinks.deleteWhere(spark, dir, Seq(java.sql.Date.valueOf(days.head)),
      col("sec_code") === "SEC03")
    // unaffected days: identical file names AND sizes — nothing rewritten
    assert(days.tail.toSeq.map(listing) == before.tail.toSeq)
    // the affected day: SEC03 gone, everything else intact
    val mutated = spark.read.parquet(dir)
    assert(mutated.filter(col("trade_date") === days.head &&
      col("sec_code") === "SEC03").count() == 0)
    val want = t.filter(!(to_date(col("time")) === days.head &&
      col("sec_code") === "SEC03")).count()
    assert(mutated.count() == want)
    // and the staging directory is gone
    assert(!Files.exists(java.nio.file.Paths.get(dir + "_mutation_stage")))
  }

  test("mutation delete keeps NULL-predicate rows (DELETE WHERE three-valued logic)") {
    val dir = Files.createTempDirectory("trades_null_pred").toString
    val t = Fixtures.trades(spark, "/root/testdata/sf0.001")
    Sinks.materializeTrades(t, dir)
    val day = t.select(to_date(col("time")).as("d")).orderBy("d")
      .limit(1).collect().head.getDate(0)
    // a predicate that is NULL for every non-SEC03 row: DELETE WHERE must
    // treat NULL as not-matched (keep), not as matched (delete)
    val nullablePred = org.apache.spark.sql.functions
      .when(col("sec_code") === "SEC03", lit(true))
    val before = spark.read.parquet(dir).count()
    val sec03OnDay = spark.read.parquet(dir)
      .filter(col("trade_date") === day.toString && col("sec_code") === "SEC03").count()
    Sinks.deleteWhere(spark, dir, Seq(day), nullablePred)
    val after = spark.read.parquet(dir)
    assert(after.count() == before - sec03OnDay,
      "NULL-predicate rows were deleted; DELETE WHERE must keep them")
    assert(after.filter(col("trade_date") === day.toString &&
      col("sec_code") === "SEC03").count() == 0)
  }

  test("optimize compaction collapses a fragmented day to few files, rows intact") {
    val dir = Files.createTempDirectory("trades_optimize").toString
    val t = Fixtures.trades(spark, "/root/testdata/sf0.001")
    t.withColumn("trade_date", to_date(col("time")))
      .repartition(48)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("trade_date").parquet(dir)
    def parquets(day: String): Int =
      new java.io.File(s"$dir/trade_date=$day").listFiles()
        .count(_.getName.endsWith(".parquet"))
    val days = t.select(to_date(col("time")).as("d")).distinct()
      .collect().map(_.getDate(0))
    days.foreach(d => assert(parquets(d.toString) > 10,
      s"fixture day $d not fragmented enough to test"))
    val before = t.count()
    Sinks.compactPartitions(spark, dir, days.toSeq, maxFiles = 2)
    days.foreach(d => assert(parquets(d.toString) <= 2,
      s"day $d still has ${parquets(d.toString)} files"))
    assert(spark.read.parquet(dir).count() == before)
  }

  test("dim-filtered join over the partitioned layout engages dynamic pruning") {
    val df = graft.queries.IngestQueries.dppJoin(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"fact scan carries no dynamic-pruning predicate:\n$plan")
    // and the pruned result equals the static-predicate evaluation
    val got = df.collect().map(_.toSeq).toSet
    val want = Fixtures.trades(spark, "/root/testdata/sf0.001")
      .withColumn("trade_date", to_date(col("time")))
      .filter(dayofmonth(col("trade_date")) % 2 === 0)
      .groupBy("trade_date")
      .agg(count(lit(1)).as("n_trades"), sum("quantity").as("qty"))
      .collect().map(_.toSeq).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("mutation recovery restores a day lost in a prior interrupted swap") {
    val dir = Files.createTempDirectory("trades_mut_recover").toString
    val t = Fixtures.trades(spark, "/root/testdata/sf0.001")
    Sinks.materializeTrades(t, dir)
    val days = t.select(to_date(col("time")).as("d")).distinct()
      .orderBy("d").collect().map(_.getDate(0).toString)
    val total = spark.read.parquet(dir).count()
    val lostDayCount = spark.read.parquet(dir)
      .filter(col("trade_date") === days.head).count()
    // Simulate the r10-advice crash window: the prior run died BETWEEN
    // move(target, bak) and move(src, target) — the day's only copy sits
    // in the backup sibling, and a stale stage directory was left behind
    // (the next run's Overwrite rewrites the stage; the backup must live
    // where that Overwrite cannot reach it).
    val backupRoot = java.nio.file.Paths.get(dir + "_mutation_backup")
    Files.createDirectories(backupRoot)
    Files.move(
      java.nio.file.Paths.get(s"$dir/trade_date=${days.head}"),
      backupRoot.resolve(s"bak_trade_date=${days.head}"))
    val staleStage = java.nio.file.Paths.get(dir + "_mutation_stage")
    Files.createDirectories(staleStage)
    Files.writeString(staleStage.resolve("stale_marker"), "from interrupted run")
    assert(spark.read.parquet(dir).count() == total - lostDayCount,
      "precondition: the day must actually be missing from the table root")
    // The natural recovery action — re-running a mutation — must FIRST
    // restore the lost day (before the stage read bakes its absence in),
    // then apply this run's mutation over the complete table.
    val sec03OnTarget = t.filter(to_date(col("time")) === days(1) &&
      col("sec_code") === "SEC03").count()
    Sinks.deleteWhere(spark, dir, Seq(java.sql.Date.valueOf(days(1))),
      col("sec_code") === "SEC03")
    val after = spark.read.parquet(dir)
    assert(after.filter(col("trade_date") === days.head).count() == lostDayCount,
      "the interrupted swap's day was not restored from its backup")
    assert(after.count() == total - sec03OnTarget)
    assert(!Files.exists(backupRoot), "backup root must be cleaned up")
    assert(!Files.exists(staleStage), "stale stage must be cleaned up")
  }

  test("mutation recovery drops post-swap backup residue without clobbering") {
    val dir = Files.createTempDirectory("trades_mut_residue").toString
    val t = Fixtures.trades(spark, "/root/testdata/sf0.001")
    Sinks.materializeTrades(t, dir)
    val days = t.select(to_date(col("time")).as("d")).distinct()
      .orderBy("d").collect().map(_.getDate(0))
    // Simulate the OTHER crash window: the prior run died after the staged
    // day landed but before backup cleanup — the root's day is the (newer)
    // mutated one; the leftover backup is stale and must be dropped, not
    // restored over it.
    val backupRoot = java.nio.file.Paths.get(dir + "_mutation_backup")
    val staleBak = backupRoot.resolve(s"bak_trade_date=${days.head}")
    Files.createDirectories(staleBak)
    Files.writeString(staleBak.resolve("old_part.parquet"), "stale pre-swap copy")
    val before = spark.read.parquet(dir)
      .filter(col("trade_date") === days.head.toString)
      .orderBy("trade_no").collect().toSeq
    val sec03OnTarget = t.filter(to_date(col("time")) === days(1) &&
      col("sec_code") === "SEC03").count()
    Sinks.deleteWhere(spark, dir, Seq(days(1)), col("sec_code") === "SEC03")
    val afterDay = spark.read.parquet(dir)
      .filter(col("trade_date") === days.head.toString)
      .orderBy("trade_no").collect().toSeq
    assert(afterDay == before,
      "stale backup residue must not be restored over a completed swap")
    assert(!Files.exists(backupRoot))
    assert(spark.read.parquet(dir).count() == t.count() - sec03OnTarget)
  }
}
