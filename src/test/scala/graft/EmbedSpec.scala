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

  test("hyperplane family: 32 genuinely distinct balanced planes") {
    // the round-2 modular formula collapsed to 7 distinct planes (mod-7
    // period in j) — banded signatures need independence
    val planes = (0 until 32).map(Embed.hyperplaneVec)
    assert(planes.distinct.size == 32)
    planes.foreach { p =>
      assert(p.forall(h => h >= -3 && h <= 3))
      // roughly balanced: |mean| well inside one unit
      assert(math.abs(p.sum.toDouble / p.size) < 1.0)
    }
  }
}
