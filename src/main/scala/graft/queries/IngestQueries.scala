package graft.queries

import graft.fixtures.Fixtures._
import graft.ingest.{CandleBuilder, Dedup}
import graft.schema.Schemas

/** Query registrations for the §2.A ingestion/transform layer — each
  * operator exercised end-to-end over its fixture with a DuckDB oracle.
  */
object IngestQueries {

  /** A16 (batch form) — tick→1-minute OHLCV candles. */
  val a16CandlesBatch = QueryDef.sql(
    "a16_candles_batch",
    withCtes(CandleBuilder.batchCandlesSql, ticksCte)
  ) { (spark, dir) => CandleBuilder.batchCandles(ticks(spark, dir)) }

  private val tradeCols = Seq("time", "secid", "sec_code", "trade_no", "board",
    "price", "quantity", "buy_sell", "open_interest", "period", "ingest_seq")

  /** Dedup read path over the central fact table (db.go:61-62 key):
    * at-least-once redelivered rows collapse to the latest ingest_seq.
    */
  val dedupTrades = QueryDef.sql(
    "dedup_trades",
    withCtes(
      Dedup.lastWriteWinsSql("trades_versioned", Schemas.tradesKey, "ingest_seq", tradeCols),
      tradesCte, tradesVersionedCte)
  ) { (spark, dir) =>
    Dedup.lastWriteWins(tradesVersioned(spark, dir), Schemas.tradesKey, "ingest_seq")
  }

  private val quoteCols = Seq("time", "secid", "board", "sec_code", "price",
    "source", "yield", "buy", "sell", "quote_seq")

  /** Dedup read path over order-book snapshots (db.go:107 key) — the
    * arrival-order quote_seq is the last-writer authority.
    */
  val dedupQuotes = QueryDef.sql(
    "dedup_quotes",
    withCtes(
      Dedup.lastWriteWinsSql("quotes", Schemas.quotesKey, "quote_seq", quoteCols),
      quotesCte)
  ) { (spark, dir) =>
    Dedup.lastWriteWins(quotes(spark, dir), Schemas.quotesKey, "quote_seq")
  }

  val all: Seq[QueryDef] = Seq(a16CandlesBatch, dedupTrades, dedupQuotes)
}
