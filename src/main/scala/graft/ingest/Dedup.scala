package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ReplacingMergeTree read path (SURVEY §2 "Dedup"): every reference table
  * is `ENGINE = ReplacingMergeTree() ORDER BY (keys…)` (db.go:31,47,61,93,
  * 106) — rows with an equal key collapse to the LAST inserted at merge
  * time. The engine exposes that as an explicit read-path operator.
  *
  * Scale design: a single hash aggregation with `max_by(struct(...), seq)`.
  * max_by partial-aggregates, so map-side combine collapses local
  * duplicates before the one shuffle (hash-partitioned on the key — the
  * same layout a bucketed 100 TB table would already have, making the
  * shuffle elidable). No window function, no sort, no global ordering.
  */
object Dedup {

  /** Last write wins per `keys`, "last" = max `seq` (must be unique within
    * a key for a deterministic winner — ingest sequence / arrival offset).
    */
  def lastWriteWins(df: DataFrame, keys: Seq[String], seq: String): DataFrame = {
    val others = df.columns.filterNot(keys.contains).toSeq
    df.groupBy(keys.map(col): _*)
      .agg(max_by(struct(others.map(col): _*), col(seq)).as("_latest"))
      .select(keys.map(col) ++ others.map(o => col("_latest").getField(o).as(o)): _*)
  }

  /** DuckDB twin: row_number() over the key, latest first. */
  def lastWriteWinsSql(table: String, keys: Seq[String], seq: String,
      allCols: Seq[String]): String =
    s"""SELECT ${allCols.mkString(", ")} FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY ${keys.mkString(", ")} ORDER BY $seq DESC) AS rn
       |  FROM $table) dedup
       |WHERE rn = 1""".stripMargin
}
