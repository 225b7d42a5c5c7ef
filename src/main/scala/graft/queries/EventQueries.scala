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

  /** Bucket width for the interval-join expansion: 30 minutes in
    * microseconds (matches the session gap, so a session of n events
    * spans few buckets).
    */
  private val IvB = 1800000000L

  /** INTERVAL JOIN (point-in-range) — the join class Spark has no native
    * operator for: count, for every session, ALL users' events falling
    * inside its [start, end) window (the concurrency measure behind
    * capacity dashboards). A naive `ON p.ts BETWEEN s.start AND s.end`
    * plans as BroadcastNestedLoopJoin — O(points × intervals), the
    * classic range-join scale killer. The engine's plan is the standard
    * bucket-expansion rewrite instead: each interval explodes into the
    * 30-minute buckets it covers (bounded by session span / bucket), each
    * point maps to its ONE bucket, and the join becomes a plain
    * shuffled EQUI-join on the bucket key — a point can only meet an
    * interval through the point's own bucket, so no pair dedup is
    * needed; the residual [start, end) filter runs post-join. Skew note
    * pinned here: a globally hot half-hour concentrates one bucket —
    * the [[graft.ingest.Salt]] lever composes on the bucket key when
    * that happens.
    *
    * The DuckDB oracle spells the naive range join (WHAT); the bucketed
    * equi-join is the engine's HOW, pinned plan-level by ScaleShapeSpec
    * (no nested-loop/cartesian anywhere).
    */
  val evtSessionConcurrency = QueryDef.sql(
    "evt_session_concurrency",
    """WITH e AS (SELECT user_id,
      |    make_timestamp(CAST(epoch_ns(ts) // 1000 AS BIGINT)) AS ts FROM events),
      |f AS (SELECT user_id, ts,
      |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
      |              >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
      |  FROM e),
      |g AS (SELECT user_id, ts,
      |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM f),
      |s AS (SELECT user_id, min(ts) AS session_start,
      |        max(ts) + INTERVAL 30 MINUTE AS session_end,
      |        CAST(count(*) AS BIGINT) AS n_events
      |      FROM g GROUP BY user_id, sid)
      |SELECT s.user_id, s.session_start, s.session_end, s.n_events,
      |  CAST(count(*) AS BIGINT) AS n_concurrent
      |FROM s JOIN e p ON p.ts >= s.session_start AND p.ts < s.session_end
      |GROUP BY 1, 2, 3, 4
      |ORDER BY s.user_id, s.session_start""".stripMargin
  ) { (spark, dir) =>
    val ev = events(spark, dir)
    val sess = ev
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"))
    val iv = sess.withColumn("bkt", explode(expr(
      s"sequence(unix_micros(session_start) div $IvB, (unix_micros(session_end) - 1) div $IvB)")))
    val pts = ev.select(col("ts").as("ets"))
      .withColumn("bkt", expr(s"unix_micros(ets) div $IvB"))
    iv.join(pts, "bkt")
      .filter(col("ets") >= col("session_start") && col("ets") < col("session_end"))
      .groupBy("user_id", "session_start", "session_end", "n_events")
      .agg(count(lit(1)).as("n_concurrent"))
      .orderBy("user_id", "session_start")
  }

  val all: Seq[QueryDef] = Seq(evtSessions, evtSessionConcurrency)
}
