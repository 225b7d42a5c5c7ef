package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A12/A14/A15 — wire-format projections and time parses
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

  /** A14 (db.go:139-174): secinfo date parses (`dd.MM.yyyy`,
    * db.go:140-142). NOTE the reference's positional-append bug — it sends
    * CouponPeriod twice so FaceValue lands one slot off (db.go:161-163);
    * we replicate the intended SCHEMA, not the bug (SURVEY §7.5.6).
    */
  def secInfo(wire: DataFrame): DataFrame =
    wire.select(
      col("secid"), col("sec_code"), col("sec_name"), col("market"),
      to_date(col("mat_date"), "dd.MM.yyyy").as("mat_date"),
      to_date(col("coupon_date"), "dd.MM.yyyy").as("coupon_date"),
      col("facevalue"), col("coupon_period"))

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
