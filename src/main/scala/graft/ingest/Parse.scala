package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A12/A13/A14/A15 — wire-format projections and time parses
  * (/root/reference/db.go:111-174, process.go:103-125). The Go layouts
  * `"02.01.2006 15:04:05"` / `"02.01.2006"` (db.go:13-15) are
  * `dd.MM.yyyy HH:mm:ss` / `dd.MM.yyyy` in Spark's pattern dialect.
  */
object Parse {

  /** A12 (db.go:124-137): trade event-time parse. Input has the wire
    * `time_str`; output replaces it with a proper timestamp, keeping the
    * 10-column trades projection.
    */
  def trades(wire: DataFrame): DataFrame =
    wire.select(
      to_timestamp(col("time_str"), "dd.MM.yyyy HH:mm:ss").as("time"),
      col("secid"), col("sec_code"), col("trade_no"), col("board"),
      col("price"), col("quantity"), col("buy_sell"),
      col("open_interest"), col("period"))

  /** A11 (main.go:146-158): the securities insert projection — 12
    * positional columns with the reference's narrowing casts
    * (uint16 secid, uint8 market/decimals/lotsize/quotestype, float32
    * minstep/point_cost; SURVEY §1.4). `active` is a wire-only field the
    * insert drops (it gates A7 instead).
    */
  def securities(wire: DataFrame): DataFrame =
    wire.select(
      col("secid").cast("int").as("secid"),
      col("seccode"), col("instrclass"), col("board"),
      col("market").cast("int").as("market"),
      col("shortname"),
      col("decimals").cast("int").as("decimals"),
      col("minstep").cast("double").as("minstep"),
      col("lotsize").cast("int").as("lotsize"),
      col("point_cost").cast("double").as("point_cost"),
      col("sectype"),
      col("quotestype").cast("int").as("quotestype"))

  /** A14 (db.go:139-174): the FULL 28-column secinfo projection in DDL
    * order (db.go:64-94) with the three `dd.MM.yyyy` date parses
    * (mat_date/coupon_date/buybackdate → midnight timestamps, matching
    * the reference's DateTime columns, db.go:140-142). NOTE the
    * reference's positional-append bug — it sends CouponPeriod twice so
    * FaceValue and everything after land one slot off (db.go:160-162,
    * against a 27-placeholder INSERT); we implement the intended SCHEMA,
    * not the bug (SURVEY §7.5.6). Output types match
    * [[graft.schema.Schemas.securitiesInfo]] exactly (schema-asserted in
    * SchemasSpec).
    */
  def secInfo(wire: DataFrame): DataFrame =
    wire.select(
      col("secid"), col("sec_name"), col("sec_code"), col("market"), col("pname"),
      to_timestamp(col("mat_date"), "dd.MM.yyyy").as("mat_date"),
      col("clearing_price"), col("minprice"), col("maxprice"),
      col("buy_deposit"), col("sell_deposit"),
      col("bgo_c"), col("bgo_nc"), col("bgo_buy"),
      col("accruedint"), col("coupon_value"),
      to_timestamp(col("coupon_date"), "dd.MM.yyyy").as("coupon_date"),
      col("coupon_period"), col("facevalue"), col("put_call"), col("point_cost"),
      col("opt_type"), col("lot_volume"), col("isin"), col("regnumber"),
      col("buybackprice"),
      to_timestamp(col("buybackdate"), "dd.MM.yyyy").as("buybackdate"),
      col("currencyid"))

  /** A13 (db.go:111-123, process.go:56-63): quote items inherit their
    * batch ENVELOPE's timestamp — every item of a `QuotesChan` batch is
    * inserted with the shared `quotes.Time`, formatted to whole seconds
    * (tableTimeLayout, db.go:23,113) — alongside the wire downcasts
    * (int8 yield, int16 buy/sell; SURVEY §1.4).
    */
  def quotesEnvelope(wire: DataFrame): DataFrame =
    wire.select(
      date_trunc("second", col("envelope_ts")).as("time"),
      col("secid"), col("board"), col("sec_code"),
      col("price"), col("source"),
      col("yield"), col("buy"), col("sell"))

  /** A15 (process.go:108-122): history-candle batch — parse the item date
    * string and broadcast the batch ENVELOPE's (sec_code, period) onto
    * every item (the wire items carry neither).
    */
  def historyCandles(items: DataFrame, envSecCode: String, envPeriod: Int): DataFrame =
    items.select(
      to_timestamp(col("date_str"), "dd.MM.yyyy HH:mm:ss").as("date"),
      lit(envSecCode).as("sec_code"),
      lit(envPeriod).as("period"),
      col("open"), col("close"), col("high"), col("low"), col("volume"))
}
