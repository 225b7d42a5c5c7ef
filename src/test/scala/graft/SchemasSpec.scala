package graft

import graft.fixtures.Fixtures
import graft.ingest.Parse
import graft.schema.Schemas

/** A21 — DDL-schema assertions: the declared StructTypes match what the
  * parse layer actually produces, so drift between schema/ and ingest/
  * fails fast (round-2 VERDICT gap: securities_info had no StructType).
  */
class SchemasSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("secInfo parse emits the full 28-column transaq_securities_info DDL") {
    val parsed = Parse.secInfo(Fixtures.secinfoRaw(spark, sf))
    assert(parsed.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Schemas.securitiesInfo.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(Schemas.securitiesInfo.fields.length == 28)
    // the ReplacingMergeTree key columns all exist (db.go:94)
    assert(Schemas.securitiesInfoKey.forall(parsed.columns.contains))
  }

  test("trades fixture matches the transaq_trades DDL") {
    val t = Fixtures.trades(spark, sf)
    assert(t.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Schemas.trades.fields.map(f => (f.name, f.dataType)).toSeq)
  }

  test("quotes fixture matches the transaq_quotes DDL plus arrival seq") {
    val q = Fixtures.quotes(spark, sf)
    val ddl = Schemas.quotes.fields.map(f => (f.name, f.dataType)).toSeq
    assert(q.schema.fields.map(f => (f.name, f.dataType)).take(ddl.length).toSeq == ddl)
    assert(q.columns.last == "quote_seq")
  }
}
