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
}
