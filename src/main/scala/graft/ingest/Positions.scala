package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A17 — positions merge/coalesce (/root/reference/process.go:74-101): each
  * incoming positions message overwrites a sub-list ONLY when it arrives
  * non-empty, so the materialized position is, per field, the value of the
  * latest update that carried that field.
  *
  * Batch/streaming formulation: one hash aggregate per account with
  * `max(struct(ts, event_id, value))` over non-null carriers — latest-wins
  * per field, partial-aggregatable, no window/sort. In streaming this runs
  * inside `foreachBatch` as an upsert into the positions store.
  */
object Positions {

  val Fields: Seq[String] =
    Seq("united_limits", "sec_positions", "forts_money", "money_position")

  def merge(updates: DataFrame): DataFrame = {
    val aggs = Fields.map { f =>
      max(when(col(f).isNotNull,
        struct(col("ts"), col("event_id"), col(f).as("v")))).getField("v").as(f)
    }
    updates.groupBy(col("account")).agg(aggs.head, aggs.tail: _*)
  }

  /** DuckDB twin (expects `position_updates` CTE). */
  val mergeSql: String = {
    val aggs = Fields.map { f =>
      s"arg_max($f, ord) FILTER (WHERE $f IS NOT NULL) AS $f"
    }
    s"""SELECT account, ${aggs.mkString(",\n  ")}
       |FROM (SELECT *, CAST(epoch_us(ts) AS HUGEINT) * 1000000 + event_id AS ord
       |      FROM position_updates) u
       |GROUP BY account""".stripMargin
  }
}
