package graft.queries

import org.apache.spark.sql.functions._

import graft.fixtures.Fixtures._

/** Event-stream operators over the `events` table — the operator classes
  * a telemetry/clickstream consumer of the engine needs beyond the
  * market-data surface.
  */
object EventQueries {

  /** SESSIONIZATION via Spark's native `session_window` (the dynamic-gap
    * window class the rest of the surface doesn't exercise): events of a
    * user merge while consecutive gaps stay under the timeout; a session
    * spans [first event, last event + gap). One shuffle on the session
    * key, state = open sessions only — the same operator drives the
    * streaming form (`withWatermark` + session_window) unchanged.
    *
    * The DuckDB oracle is the classic gaps-and-islands rewrite (lag →
    * new-session flag → running island id → per-island aggregate), with
    * the events' INT64-nanos timestamps truncated to microseconds
    * EXACTLY as the Spark-side fixture does (`epoch_ns // 1000`), so
    * both engines sessionize identical instants.
    */
  val evtSessions = QueryDef.sql(
    "evt_sessions",
    """WITH e AS (SELECT user_id,
      |    make_timestamp(CAST(epoch_ns(ts) // 1000 AS BIGINT)) AS ts FROM events),
      |f AS (SELECT user_id, ts,
      |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
      |              >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
      |  FROM e),
      |g AS (SELECT user_id, ts,
      |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM f)
      |SELECT user_id, min(ts) AS session_start,
      |       max(ts) + INTERVAL 30 MINUTE AS session_end,
      |       count(*) AS n_events
      |FROM g GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin
  ) { (spark, dir) =>
    events(spark, dir)
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"))
      .orderBy("user_id", "session_start")
  }

  val all: Seq[QueryDef] = Seq(evtSessions)
}
