package graft

import org.apache.spark.sql.functions._

/** `llm_token_budget` (per-source token quota, best-quality-first) and
  * `llm_snapshot_diff` (incremental-ingest delta classification)
  * invariants beyond the DuckDB hash oracle.
  */
class BudgetDiffSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.01"

  test("token_budget: greedy prefix property — kept is a rank prefix per source") {
    val df = SparkEntry.queries("llm_token_budget")(spark, dir).cache()
    // within a source, every kept doc ranks before every dropped doc
    val bad = df.as("a").join(df.as("b"),
        col("a.source") === col("b.source") &&
          col("a.src_rank") < col("b.src_rank") &&
          !col("a.kept") && col("b.kept"))
      .count()
    assert(bad == 0, s"$bad dropped-before-kept rank inversions")
    // the kept prefix respects the budget; the first drop overflows it
    val kept = df.filter(col("kept"))
      .groupBy("source").agg(max("cum_tokens").as("kt"))
    assert(kept.filter(col("kt") > 1000L).count() == 0)
    val firstDrop = df.filter(!col("kept"))
      .withColumn("r", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("source")
          .orderBy("src_rank")))
      .filter(col("r") === 1)
    assert(firstDrop.filter(col("cum_tokens") <= 1000L).count() == 0)
    df.unpersist()
  }

  test("token_budget: ledger is total and ranks are dense per source") {
    val df = SparkEntry.queries("llm_token_budget")(spark, dir)
    val perSrc = df.groupBy("source")
      .agg(count(lit(1)).as("n"), max("src_rank").as("mx"),
        countDistinct("src_rank").as("d"))
    assert(perSrc.filter(col("n") =!= col("mx") || col("n") =!= col("d")).count() == 0)
    assert(df.count() ==
      graft.fixtures.Fixtures.documents(spark, dir).count())
  }

  test("snapshot_diff: statuses partition the id space per the derivation") {
    val m = SparkEntry.queries("llm_snapshot_diff")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val nDocs = graft.fixtures.Fixtures.documents(spark, dir).count()
    for ((id, st) <- m) {
      if (id >= (1L << 40)) assert(st == "removed", s"$id: $st")
      else if (id % 7 == 3) assert(st == "added", s"$id: $st")
      else if (id % 7 == 5) assert(st == "changed", s"$id: $st")
      else assert(st == "unchanged", s"$id: $st")
    }
    // every current doc appears exactly once; ghosts add the removed rows
    assert(m.count(_._1 < (1L << 40)) == nDocs)
    assert(m.count(_._1 >= (1L << 40)) == m.count(k => k._1 < (1L << 40) && k._1 % 7 == 1))
  }

  test("snapshot_diff: single-word docs can't be 'changed' by reversal") {
    // reversal of a 1-token text is identity → hash equal → unchanged;
    // the classifier must compare hashes, not provenance
    import spark.implicits._
    graft.expr.GraftFunctions.register(spark)
    val docs = Seq((5L, "solo", "en", "s0"), (12L, "a b", "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val tmp = java.nio.file.Files.createTempDirectory("snapdiff").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val m = SparkEntry.queries("llm_snapshot_diff")(spark, tmp)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(5L) == "unchanged") // id≡5 (mod 7) but 1-token reversal is identity
    assert(m(12L) == "changed")  // id≡5 (mod 7), 2 tokens genuinely reversed
  }
}
