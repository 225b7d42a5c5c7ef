package graft

import java.sql.Timestamp

import graft.expr.GraftFunctions

/** SQL surface of the custom functions — the two non-ANSI constructs of
  * the reference dialect (SURVEY §2.C).
  */
class FunctionsSpec extends SparkSuite {

  test("to_start_of_interval floors like ClickHouse toStartOfInterval") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT to_start_of_interval(TIMESTAMP '2024-12-06 10:03:45', 300) AS m,
        |       to_start_of_interval(TIMESTAMP '2024-12-06 10:05:00', 300) AS e""".stripMargin)
      .collect().head
    assert(r.getTimestamp(0) == Timestamp.valueOf("2024-12-06 10:00:00"))
    assert(r.getTimestamp(1) == Timestamp.valueOf("2024-12-06 10:05:00"))
  }

  test("graft_topk works from SQL and respects count-desc/value-asc order") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq("a", "b", "b", "c", "c", "c").toDF("v").createOrReplaceTempView("tkv")
    val got = spark.sql("SELECT graft_topk(v, 2) FROM tkv").collect().head.getSeq[String](0)
    assert(got == Seq("c", "b"))
  }

  test("graft_topk handles more distinct values than k and merges across partitions") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val vs = (1 to 200).flatMap(i => Seq.fill(i % 7 + 1)(s"v${i % 13}"))
    vs.toDF("v").repartition(8).createOrReplaceTempView("tkv2")
    val exact = vs.groupBy(identity).view.mapValues(_.size).toSeq
      .sortBy { case (v, c) => (-c, v) }.take(5).map(_._1)
    val got = spark.sql("SELECT graft_topk(v, 5) FROM tkv2").collect().head.getSeq[String](0)
    assert(got == exact)
  }
}
