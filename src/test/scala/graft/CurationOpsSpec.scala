package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the round-7 curation additions:
  *
  *  - `llm_shuffle_shard`: a seed-keyed permutation — positions are a
  *    contiguous 1..n_s ranking within each shard, shards cover every
  *    doc exactly once, and the plan carries NO global total-order sort
  *    (the single-partition trap the per-shard ranking exists to avoid).
  *  - `llm_cluster_best`: exactly one keeper per cluster, the keeper
  *    maximizes (quality, then lowest doc_id), and every non-singleton
  *    cluster drops the rest.
  *  - `llm_ccnet_bucket`: buckets partition each language non-emptily
  *    (head ∪ middle ∪ tail = lang slice) and bucket membership is
  *    monotone in fluency — no 'tail' doc outscores a 'head' doc of the
  *    same language.
  *  - `llm_sq_recall`: codes stay in the int8 range by construction;
  *    recall is measured against planted structure, so assert the
  *    ledger's arithmetic (n_overlap ∈ [0, 10], recall = n/10) and that
  *    quantization keeps ≥ half the exact top-10 on the fixture (the
  *    16×-compression-at-useful-recall claim, empirically).
  */
class CurationOpsSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("llm_shuffle_shard: per-shard contiguous ranks, full cover, no global sort") {
    val df = SparkEntry.queries("llm_shuffle_shard")(spark, dir).cache()
    val docs = graft.fixtures.Fixtures.documents(spark, dir).count()
    assert(df.count() == docs, "every document is dealt exactly once")
    // contiguous 1..n_s positions per shard
    val bad = df.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"),
        countDistinct("pos").as("d"))
      .filter(col("lo") =!= 1L || col("hi") =!= col("n") || col("d") =!= col("n"))
    assert(bad.count() == 0, "positions are a contiguous dense rank per shard")
    // determinism: the same seed deals the same permutation
    val again = SparkEntry.queries("llm_shuffle_shard")(spark, dir)
    assert(df.except(again).count() == 0 && again.except(df).count() == 0)
    // the plan must rank within shards, not globally: the only Sort
    // operators allowed are partition-local (the window's per-shard sort
    // and the presentation orderBy is fine as TakeOrdered/global=false...
    // assert no Sort with global=true ABOVE the window computation by
    // checking the window itself partitions on shard
    val p = df.queryExecution.executedPlan.toString
    assert("""\], \[shard#\d+L?\], \[skey""".r.findFirstIn(p).isDefined,
      s"expected a shard-partitioned window rank:\n$p")
    df.unpersist()
  }

  test("llm_cluster_best: one keeper per cluster, argmax quality") {
    val df = SparkEntry.queries("llm_cluster_best")(spark, dir).cache()
    val perCluster = df.groupBy("cluster_id")
      .agg(sum(when(col("is_best"), 1L).otherwise(0L)).as("keepers"),
        count(lit(1)).as("n"))
    assert(perCluster.filter(col("keepers") =!= 1L).count() == 0,
      "exactly one keeper per cluster")
    // the keeper's (quality, -doc_id) dominates every dropped member
    val best = df.filter(col("is_best"))
      .select(col("cluster_id"), col("quality").as("bq"), col("doc_id").as("bid"))
    val dominated = df.filter(!col("is_best"))
      .join(best, "cluster_id")
      .filter(col("quality") > col("bq") ||
        (col("quality") === col("bq") && col("doc_id") < col("bid")))
    assert(dominated.count() == 0, "keeper is the quality argmax (ties → lowest id)")
    // action column is consistent with the flag
    assert(df.filter(
      (col("is_best") && col("action") =!= "keep") ||
        (!col("is_best") && col("action") =!= "drop_dup")).count() == 0)
    df.unpersist()
  }

  test("llm_ccnet_bucket: per-language terciles, monotone in fluency") {
    val df = SparkEntry.queries("llm_ccnet_bucket")(spark, dir).cache()
    val langs = df.select("lang").distinct().count()
    // every language has a non-empty head and tail (terciles of a
    // non-degenerate distribution)
    val cover = df.groupBy("lang")
      .agg(countDistinct("bucket").as("nb"))
    assert(cover.filter(col("nb") < 2).count() == 0,
      s"each of the $langs languages splits into ≥2 buckets")
    // monotonicity: min fluency in head ≥ max fluency in tail, per lang
    val h = df.filter(col("bucket") === "head")
      .groupBy("lang").agg(min("lm_fluency").as("hmin"))
    val t = df.filter(col("bucket") === "tail")
      .groupBy("lang").agg(max("lm_fluency").as("tmax"))
    assert(h.join(t, "lang").filter(col("hmin") <= col("tmax")).count() == 0,
      "head strictly outscores tail within every language")
    df.unpersist()
  }

  test("llm_rrf_fusion: membership totality, score bands, contiguous ranks") {
    val df = SparkEntry.queries("llm_rrf_fusion")(spark, dir).cache()
    // every fused doc came from at least one source list
    assert(df.filter(!col("in_lex") && !col("in_sem")).count() == 0)
    // score bands: a doc on BOTH depth-20 lists scores at least
    // 2·(10^6 div 80) = 25000; a single-list doc at most 10^6 div 61 =
    // 16393 — so dual-source hits always outrank single-source ones,
    // which is RRF's point
    assert(df.filter(col("in_lex") && col("in_sem") && col("rrf") < 25000L).count() == 0)
    assert(df.filter((!col("in_lex") || !col("in_sem")) && col("rrf") > 16393L).count() == 0)
    // 8 queries, ranks a contiguous 1..10 each
    val perQ = df.groupBy("query_id").agg(count(lit(1)).as("n"),
      min("rank").as("lo"), max("rank").as("hi"), countDistinct("rank").as("d"))
    assert(perQ.count() == 8)
    assert(perQ.filter(col("n") =!= 10L || col("lo") =!= 1L ||
      col("hi") =!= 10L || col("d") =!= 10L).count() == 0)
    df.unpersist()
  }

  test("llm_pack_spans: spans tile every full sequence and sum to each doc") {
    val df = SparkEntry.queries("llm_pack_spans")(spark, dir).cache()
    val cap = 512L
    // per-doc: spans sum to the doc's token count, exactly one head span
    val docs = graft.fixtures.Fixtures.documents(spark, dir)
      .selectExpr("doc_id", "CAST(size(split(text, ' ')) AS BIGINT) AS n_tok")
    val perDoc = df.groupBy("doc_id")
      .agg(sum("span_len").as("tot"), sum(when(col("is_head"), 1L).otherwise(0L)).as("heads"))
      .join(docs, "doc_id")
    assert(perDoc.filter(col("tot") =!= col("n_tok") || col("heads") =!= 1L).count() == 0)
    // per-sequence: every sequence except the last is tiled exactly
    // [0, capacity) by non-overlapping spans (sum = cap, min start = 0,
    // max end = cap, and distinct starts = span count)
    val lastSeq = df.agg(max("seq_id")).head().getLong(0)
    val perSeq = df.filter(col("seq_id") < lastSeq).groupBy("seq_id")
      .agg(sum("span_len").as("tot"), min("start_in_seq").as("lo"),
        max(col("start_in_seq") + col("span_len")).as("hi"),
        count(lit(1)).as("n"), countDistinct("start_in_seq").as("d"))
    assert(perSeq.filter(col("tot") =!= cap || col("lo") =!= 0L ||
      col("hi") =!= cap || col("d") =!= col("n")).count() == 0,
      "every full sequence must be tiled exactly once")
    // straddling actually happens on the fixture (docs > capacity exist
    // or offsets cross boundaries) — the operator's reason to exist
    assert(df.filter(!col("is_head")).count() > 0)
    df.unpersist()
  }

  test("llm_sq_recall: int8 code range and useful recall on the fixture") {
    val df = SparkEntry.queries("llm_sq_recall")(spark, dir).cache()
    assert(df.filter(col("n_overlap") < 0L || col("n_overlap") > 10L).count() == 0)
    assert(df.filter(abs(col("recall_at_10") * 10.0 - col("n_overlap")) > 1e-9).count() == 0)
    // quantization at 127 levels keeps most of the exact neighborhood
    val mean = df.agg(avg("recall_at_10")).head().getDouble(0)
    assert(mean >= 0.5, s"mean recall@10 under int8 SQ should stay useful, got $mean")
    // and the codes themselves are in [-127, 127]: recompute the encode
    // bound directly from the registered pipeline's own scale definition
    val emb = graft.llm.Embed.prepared(
      graft.fixtures.Fixtures.embeddings(spark, dir))
    val outOfRange = emb.select(explode(expr(
      "transform(qv, v -> abs(v))")).as("a"))
      .agg(max("a")).head().getLong(0)
    assert(outOfRange > 127L,
      "precondition: raw quantized components exceed int8 (else SQ is a no-op)")
    // (round-8 ADVICE) assert the encoded range DIRECTLY, not just the
    // precondition. The encode is INTENTIONALLY spelled out inline
    // rather than calling Embed.sqCoded (the kernel the entries share):
    // a from-scratch re-derivation is what makes this an independent
    // check of the kernel, not a tautology.
    val scales = emb.select(posexplode(col("qv")).as(Seq("pos", "x")))
      .groupBy("pos").agg(greatest(max(abs(col("x"))), lit(1L)).as("s"))
      .groupBy().agg(array_sort(collect_list(struct(col("pos"), col("s")))).as("ps"))
      .select(col("ps.s").as("scales"))
    val maxAbsCode = emb.crossJoin(broadcast(scales))
      .withColumn("codes", expr(
        "zip_with(qv, scales, (v, s) -> CASE WHEN v >= 0 THEN (v * 127) div s " +
          "ELSE -((-v * 127) div s) END)"))
      .select(explode(expr("transform(codes, c -> abs(c))")).as("c"))
      .agg(max("c")).head().getLong(0)
    assert(maxAbsCode <= 127L,
      s"int8 SQ codes must stay in [-127, 127], got max |code| = $maxAbsCode")
    df.unpersist()
  }
}
