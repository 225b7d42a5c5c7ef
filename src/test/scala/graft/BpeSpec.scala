package graft

import org.apache.spark.sql.functions._

/** Structural laws of the learned BPE merge table (`llm_bpe_train`) —
  * engine-independent properties any correct BPE trainer satisfies, so
  * they pin the semantics beyond the oracle's bit-equality:
  *
  *  1. Pair counts are monotone non-increasing across rounds: merging
  *     the argmax pair can only shrink existing pair counts, and any
  *     NEW pair it creates is bounded by the merged token's own count.
  *  2. Every merge operand is a single character or the result of an
  *     earlier round — the defining well-formedness of a merge table
  *     (this is what makes it replayable by a tokenizer).
  *  3. No pair is learned twice.
  */
class BpeSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("bpe merge table: monotone counts, well-formed operands, no repeats") {
    val rows = SparkEntry.queries("llm_bpe_train")(spark, dir)
      .orderBy("merge_round")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(rows.length == 8)

    val counts = rows.map(_._5)
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      s"pair counts must be non-increasing: ${counts.mkString(", ")}")

    var known = Set.empty[String]
    for ((round, lhs, rhs, merged, _) <- rows) {
      for (op <- Seq(lhs, rhs))
        assert(op.length == 1 || known.contains(op),
          s"round $round operand '$op' is neither a character nor an earlier merge")
      assert(merged == lhs + rhs)
      known += merged
    }

    val pairs = rows.map(r => (r._2, r._3))
    assert(pairs.distinct.length == pairs.length, "a pair was learned twice")
  }

  test("bpe apply: tokenization is lossless and counts agree with the entry") {
    // rebuild the tokenizer from the learned merge table (what a
    // consumer of the artifact does) and assert the defining law:
    // stripping token delimiters recovers the original text exactly
    val merges = SparkEntry.queries("llm_bpe_train")(spark, dir)
      .orderBy("merge_round").collect()
      .map(r => (r.getString(1), r.getString(2)))
    val chain = merges.foldLeft("st") { case (acc, (a, b)) =>
      s"replace(replace(replace($acc, '|$a|$b|', '|$a$b|'), '|$a|$b|', '|$a$b|'), '|$a|$b|', '|$a$b|')"
    }
    val toks = graft.fixtures.Fixtures.documents(spark, dir)
      .withColumn("st", concat(lit("|"), regexp_replace(col("text"), "(.)", "$1|")))
      .withColumn("st", expr(chain))
    assert(toks.filter(expr("replace(st, '|', '') <> text")).count() == 0,
      "detokenize(tokenize(text)) must equal text")
    // and the registered entry's counts describe exactly this tokenization
    val want = toks.selectExpr("doc_id",
      "CAST(size(filter(split(st, '[|]'), x -> x <> '' AND x <> ' ')) AS BIGINT) AS n_tokens_bpe")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val got = SparkEntry.queries("llm_bpe_apply")(spark, dir)
      .select("doc_id", "n_tokens_bpe")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == want)
    // merges actually fired corpus-wide
    val merged = SparkEntry.queries("llm_bpe_apply")(spark, dir)
      .agg(min("n_merged")).head().getLong(0)
    assert(merged > 0, "every fixture doc should contain at least one learned merge")
  }
}
