package graft

import graft.llm.Embed

/** The unrolled quantized-vector expressions vs a naive Scala computation
  * — protects the codegen-friendly rewrite from off-by-one/term drift.
  */
class EmbedSpec extends SparkSuite {

  private val a = Array.tabulate(Embed.Dim)(i => (math.sin(i + 1) * 0.3).toFloat)
  private val b = Array.tabulate(Embed.Dim)(i => (math.cos(i * 2 + 1) * 0.4).toFloat)

  private def quant(v: Array[Float]): Array[Long] =
    v.map(x => math.round(x.toDouble * 1000))

  test("unrolled dot/norm match the naive quantized computation") {
    import spark.implicits._
    graft.expr.GraftFunctions.register(spark)
    val df = Seq((a.toSeq, b.toSeq)).toDF("ea", "eb")
      .selectExpr(
        "transform(ea, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qa",
        "transform(eb, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qb")
      .withColumn("qv", org.apache.spark.sql.functions.col("qa"))
      .selectExpr(s"${Embed.dotExpr("qa", "qb")} AS dot", s"${Embed.normExpr} AS na")
    val r = df.collect().head
    val (qa, qb) = (quant(a), quant(b))
    assert(r.getLong(0) == qa.zip(qb).map { case (x, y) => x * y }.sum)
    assert(r.getLong(1) == qa.map(x => x * x).sum)
  }

  test("hyperplane dot expressions match the literal matrix incl. zero terms") {
    import spark.implicits._
    val df = Seq(Tuple1(a.toSeq)).toDF("ea")
      .selectExpr("transform(ea, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv")
      .selectExpr((0 until 8).map(j => s"${Embed.hyperplaneDotExpr(j)} AS d$j"): _*)
    val r = df.collect().head
    val qa = quant(a)
    (0 until 8).foreach { j =>
      val want = Embed.hyperplaneVec(j).zip(qa).map { case (h, x) => h * x }.sum
      assert(r.getLong(j) == want, s"hyperplane $j")
    }
  }

  test("codegen'd vec kernels ≡ the interpreted lambda folds") {
    import spark.implicits._
    graft.expr.GraftFunctions.register(spark)
    val df = Seq((a.toSeq, b.toSeq)).toDF("ea", "eb")
      .selectExpr(
        "transform(ea, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv",
        "transform(eb, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qb")
      .selectExpr(
        "vec_dot(qv, qb) AS dot",
        "aggregate(zip_with(qv, qb, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, x) -> acc + x) AS dot0",
        "vec_normsq(qv) AS nrm",
        "aggregate(transform(qv, x -> x * x), CAST(0 AS BIGINT), (acc, x) -> acc + x) AS nrm0",
        "hyperplane_dots(qv, 32) AS hd",
        (0 until 32).map(j => s"${Embed.hyperplaneDotExpr(j)}").mkString("array(", ", ", ") AS hd0"))
    val r = df.collect().head
    assert(r.getLong(0) == r.getLong(1), "vec_dot")
    assert(r.getLong(2) == r.getLong(3), "vec_normsq")
    assert(r.getSeq[Long](4) == r.getSeq[Long](5), "hyperplane_dots")
  }

  test("hyperplane family: 64 genuinely distinct balanced planes") {
    // the round-2 modular formula collapsed to 7 distinct planes (mod-7
    // period in j) — banded signatures need independence; round 7's
    // adaptive width uses the full 4×16 static layout
    val planes = (0 until 64).map(Embed.hyperplaneVec)
    assert(planes.distinct.size == 64)
    planes.foreach { p =>
      assert(p.forall(h => h >= -3 && h <= 3))
      // roughly balanced: |mean| well inside one unit
      assert(math.abs(p.sum.toDouble / p.size) < 1.0)
    }
  }

  test("adaptiveBits: exact ceil-log2 of target occupancy, with the minimum floor") {
    // ground truth via integer bit length: ceil(log2(q)) = bitLength(q-1)
    def ceilLog2(q: Long): Int = if (q <= 1) 0 else 64 - java.lang.Long.numberOfLeadingZeros(q - 1)
    val interesting = Seq(1L, 15L, 16L, 17L, 255L, 256L, 257L,
      2050L, 2900L, 20900L, 1L << 20, (1L << 20) + 1, (1L << 40) - 1, 1L << 40)
    for (n <- interesting ++ (1L to 400L)) {
      val q = math.max(1L, (n + 15) / 16)
      assert(Embed.adaptiveBits(n, 8, 16) == math.max(8, ceilLog2(q)), s"n=$n")
    }
    // the historical 8-bit behavior is preserved through sf0.1-scale corpora
    assert(Embed.adaptiveBits(2900, 8, 16) == 8)
    // and widens with the corpus: ~20.9k vectors -> 11 bits, 1e9 -> 26
    assert(Embed.adaptiveBits(20900, 8, 16) == 11)
    assert(Embed.adaptiveBits(1000000000L, 8, 16) == 26)
  }
}
