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
}
