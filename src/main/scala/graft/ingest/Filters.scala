package graft.ingest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** A6-A10 ingest predicates + A20 config-list semantics
  * (/root/reference/main.go:79-188) as composable `Column` builders —
  * pure codegen-able predicates, no UDFs.
  */
object Filters {

  /** A20 (main.go:79-120): comma-split env lists; an unset/empty variable
    * is the EMPTY list (which for sec codes means "subscribe to nothing",
    * main.go:163-165 — not "everything"; the wildcard is the explicit
    * literal "ALL").
    */
  def parseList(env: String): Seq[String] =
    if (env == null || env.isEmpty) Nil else env.split(",").toSeq

  /** A6 (main.go:128-130): board membership. */
  def boardMember(boards: Seq[String]): Column = col("board").isin(boards: _*)

  /** A7 (main.go:141-143): insert-worthiness — nonzero id, active flag,
    * FixedString(16) length bound.
    */
  val validSecurity: Column =
    col("secid") =!= 0 && col("active") === "true" && length(col("seccode")) <= 16

  /** A8 (main.go:166-175): per config code `c` — exact sec_code match OR
    * substring OR shortname match OR the "ALL" wildcard. Folding over an
    * EMPTY list yields `false` (see [[parseList]]).
    */
  def secCodeMatch(codes: Seq[String]): Column =
    codes.foldLeft(lit(false)) { (acc, c) =>
      acc || col("seccode") === c || col("seccode").contains(c) ||
        col("shortname") === c || lit(c == "ALL")
    }

  /** A9 (main.go:134-140): bond secinfo targets — BOND type + shortname
    * suffix from EXPORT_SEC_INFO_NAMES.
    */
  def bondSuffix(names: Seq[String]): Column =
    col("sectype") === "BOND" &&
      names.foldLeft(lit(false))((acc, n) => acc || col("shortname").endsWith(n))

  /** A10 (main.go:177-188): candle-kind period whitelist; empty keeps all. */
  def periodWhitelist(periods: Seq[Int]): Column =
    if (periods.isEmpty) lit(true) else col("period").isin(periods: _*)

  /** The full quotation-subscription cascade (main.go:126-175): subscribed
    * iff valid (A7) AND board-selected (A6) AND code-matched (A8).
    */
  def subscriptionCascade(boards: Seq[String], codes: Seq[String]): Column =
    validSecurity && boardMember(boards) && secCodeMatch(codes)
}
