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
}
