package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming complement of the LLM curation surface: filter and profile
  * the crawl AS IT ARRIVES instead of in a batch sweep. Same division of
  * labor as the market-data side ([[StreamDedup]] + batch
  * [[graft.ingest.Dedup]]): the stream gate is the bounded-state
  * first-pass authority, the batch pipeline (`llm_curation`,
  * `llm_exact_dedup`) remains the exactly-once sweep over what landed.
  *
  * 100 TB / always-on shape: quality scoring is a stateless map-side
  * projection (the EXACT batch `qualityExpr`, so stream and sweep can
  * never disagree on a verdict); dedup state is bounded by the watermark
  * horizon (O(distinct content hashes per horizon), evicted as event
  * time advances); the windowed stats aggregate holds O(open windows ×
  * languages) rows. Nothing grows with stream history.
  */
object DocStream {

  /** Streaming curation gate: per-document quality score + keep flag
    * (stateless), then FIRST-write-wins content dedup within the
    * `delay` lateness horizon — re-deliveries and exact duplicates are
    * suppressed while their suppression state is still live, and the
    * state is evicted once the watermark passes. Streaming frames only
    * (same loud contract as [[StreamDedup.firstWriteWins]]).
    *
    * `expectedKeys` — expected DISTINCT CONTENT HASHES live per
    * watermark horizon (the dedup state bound) — sizes the state shard
    * count via [[StreamTuning.sizeStateShards]] before the plan is
    * returned, so the DEFAULT configuration is the fast one (the r9
    * bench measured 5.0 k rows/s with machine-parallelism shards vs
    * 22.5 k with key-sized shards). Pass 0 to leave the session's
    * shuffle-partitions conf untouched.
    */
  def curationGate(docs: DataFrame, tsCol: String, delay: String,
      expectedKeys: Long = StreamTuning.KeysPerShard): DataFrame = {
    require(docs.isStreaming,
      "curationGate is a streaming operator; use llm_curation/llm_exact_dedup for batch")
    if (expectedKeys > 0)
      StreamTuning.sizeStateShards(docs.sparkSession, expectedKeys)
    val scored = docs
      .withColumn("text_hash", md5(col("text")))
      .withColumn("tk", split(col("text"), " "))
    val cols = scored.columns.map(col).toSeq ++ graft.queries.LlmQueries.qualityMetricCols
    scored.select(cols: _*)
      .withColumn("quality", expr(graft.queries.LlmQueries.qualityExpr))
      .withColumn("keep", col("quality") >= 0.6)
      .drop("tk", "n_tokens", "n_uniq", "stop_cnt", "n_chars")
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("text_hash")
  }

  /** Watermarked per-window corpus profile: docs and token volume per
    * (event-time window, language) — the live ingest dashboard the
    * batch `llm_text_stats`/`llm_length_quantiles` sweep mirrors
    * offline. Append mode: a window emits once, when the watermark
    * closes it; late documents are dropped from closed windows.
    */
  def windowStats(docs: DataFrame, tsCol: String, delay: String,
      width: String): DataFrame = {
    require(docs.isStreaming,
      "windowStats is a streaming operator; aggregate the batch table directly instead")
    docs.withWatermark(tsCol, delay)
      .withColumn("tk", split(col("text"), " "))
      .groupBy(window(col(tsCol), width), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(col("tk")).cast("long")).as("n_tokens"))
      .select(col("window.start").as("win_start"), col("lang"),
        col("n_docs"), col("n_tokens"))
  }
}
