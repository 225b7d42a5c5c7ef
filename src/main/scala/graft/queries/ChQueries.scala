package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ch.{ChDashboard, ChDialect}
import graft.fixtures.Fixtures._

/** Registered entries that run the reference dashboard's `rawSql` VERBATIM
  * through [[graft.ch.ChDialect]] — the proof that a reference user can
  * bring their existing queries unchanged. Each entry:
  *
  *   1. loads the panel text from the dashboard JSON itself
  *      ([[graft.ch.ChDashboard]] — nothing is transcribed into this repo),
  *   2. translates it with the same template-variable constants the
  *      transliterated Q-series uses ([[graft.fixtures.Fixtures]]), and
  *   3. runs it against temp views named exactly as the reference tables.
  *
  * The DuckDB oracle is the corresponding Q-series oracle with its output
  * alias renamed to the panel's (Cyrillic) alias, because the driver's
  * compare matches column names — the VALUES asserted are identical to the
  * already-green q05/q06/q15/q19 entries, so a hash mismatch here isolates
  * a translator bug, not a semantics bug.
  *
  * Only panels whose ORDER BY key is a unique group key are registered
  * (deterministic under LIMIT); the top-10 panels (tie-sensitive LIMIT)
  * are covered Spark-vs-Spark by ChDialectSpec instead.
  */
object ChQueries {

  /** Grafana template variables, pinned to the fixture constants
    * (FIDELITY.md "template resolution" table).
    */
  val params: Map[String, String] = Map(
    "interval" -> (TradeQueries.IntervalSec / 60).toString,
    "sec_code_etf" -> EtfCodes.map(c => s"'$c'").mkString(", "),
    "sec_code" -> SelCodes.map(c => s"'$c'").mkString(", "),
    "__fromTime" -> s"TIMESTAMP '$TimeFrom'",
    "__toTime" -> s"TIMESTAMP '$TimeTo'")

  /** Register the reference-named views and translate `raw` against them. */
  def translateSql(spark: SparkSession, dir: String, raw: String): String = {
    val t = trades(spark, dir)
    val s = securities(spark, dir)
    t.createOrReplaceTempView("transaq_trades")
    s.createOrReplaceTempView("transaq_securities")
    ChDialect.translate(raw, params,
      Map("transaq_trades" -> t.columns.toSet, "transaq_securities" -> s.columns.toSet))
  }

  def translatePanel(spark: SparkSession, dir: String, idx: Int): String =
    translateSql(spark, dir, ChDashboard.rawSqls()(idx))

  /** Run one of the dashboard's SQL template variables verbatim. */
  def runTemplating(spark: SparkSession, dir: String, name: String): DataFrame = {
    val raw = ChDashboard.templatingSqls().collectFirst { case (n, q) if n == name => q }
      .getOrElse(throw new IllegalArgumentException(s"no templating query named $name"))
    spark.sql(translateSql(spark, dir, raw))
  }

  /** `marker` pins the panel's identity so a reordered dashboard fails
    * loudly instead of silently checking the wrong query.
    */
  private def runPanel(spark: SparkSession, dir: String, idx: Int, marker: String): DataFrame = {
    val raw = ChDashboard.rawSqls()(idx)
    require(raw.contains(marker), s"dashboard panel $idx lost its marker '$marker'")
    spark.sql(translatePanel(spark, dir, idx))
  }

  private def renamed(oracle: QueryDef, from: String, to: String): String = {
    val sql = oracle.oracle.get
    require(sql.contains(from), s"${oracle.name} oracle lost alias '$from'")
    sql.replace(from, to)
  }

  /** GD:643 — net volume per interval; alias-in-WHERE, join ambiguity,
    * Cyrillic alias, `IN [...]`, `if(==)`.
    */
  val chQ05 = QueryDef.sql("ch_q05_dashboard_sql",
    renamed(TradeQueries.q05, "AS net", "AS \"разница объемов\"")
  )((s, d) => runPanel(s, d, 4, "toStartOfInterval(time"))

  /** GD:794 — the day-shifted variant; adds `timestamp_add(day, 1, time)`. */
  val chQ06 = QueryDef.sql("ch_q06_dashboard_sql",
    renamed(TradeQueries.q06, "AS net", "AS \"разница объемов\"")
  )((s, d) => runPanel(s, d, 5, "timestamp_add(day, 1, time)"))

  /** GD:2748 — no-join turnover; `NOT IN [...]`, LIMIT 10000. */
  val chQ15 = QueryDef.sql("ch_q15_dashboard_sql",
    renamed(TradeQueries.q15, "AS turnover", "AS \"объем\"")
  )((s, d) => runPanel(s, d, 14, "sum(price * quantity) as \"объем\""))

  /** GD:3584 — raw-time turnover, no bucketing; ANSI alias passthrough. */
  val chQ19 = QueryDef.sql("ch_q19_dashboard_sql",
    TradeQueries.q19.oracle.get
  )((s, d) => runPanel(s, d, 18, "sum(price * quantity) as \"vol\""))

  /** GD:3767 — the `sec_code` template variable, verbatim. */
  val chQ21 = QueryDef.sql("ch_q21_dashboard_sql",
    TradeQueries.q21.oracle.get
  )((s, d) => runTemplating(s, d, "sec_code"))

  /** GD:3879 — the `sec_code_etf` template variable: join on secid only
    * with an UNQUALIFIED `board` filter — the left-preference rule
    * running verbatim against the driver gate.
    */
  val chQ22 = QueryDef.sql("ch_q22_dashboard_sql",
    TradeQueries.q22.oracle.get
  )((s, d) => runTemplating(s, d, "sec_code_etf"))

  def all: Seq[QueryDef] = Seq(chQ05, chQ06, chQ15, chQ19, chQ21, chQ22)
}
