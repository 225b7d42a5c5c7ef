package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import scala.util.control.NonFatal

import org.apache.spark.sql.streaming.StreamingQuery

/** A19 — retry/reconnect control (main.go:46-60: the 10× ping retry with
  * a 3 s sleep; process.go:13,43-49: the ticker-driven reconnect loop),
  * re-expressed for Spark's execution model.
  *
  * The reference babysits a gRPC CONNECTION: ping until the wire answers,
  * sleep between attempts, give up after a fixed budget, and reconnect
  * when the stream drops mid-flight. The Spark-native analog babysits the
  * STREAMING QUERY: a transient failure (source hiccup, executor loss,
  * sink timeout) terminates the query with a `StreamingQueryException`,
  * and the supervisor restarts it FROM ITS CHECKPOINT — the offset log
  * replays the in-flight micro-batch, the state store restores the last
  * committed keyed state, and the file sink's `_spark_metadata` commit
  * log makes the replay exactly-once — so a supervised run's output is
  * row-identical to an uninterrupted one. SupervisorSpec pins the policy
  * (budget, backoff schedule, give-up rethrow); the hash-oracled
  * `a19_reconnect_replay` entry pins the end-to-end recovery equivalence
  * against the same DuckDB twin as the clean streaming replay.
  *
  * Policy knobs map 1:1 to the reference: `maxRestarts` = the 10-ping
  * budget, `backoff` = the 3 s sleep (fixed, not exponential — matching
  * main.go:52). Exhausting the budget rethrows the last failure, the
  * analog of the reference's fatal exit (main.go:58-60). `sleep` is
  * injectable so tests assert the schedule without wall-clock waits.
  *
  * At cluster scale this is the driver-side restart loop a production
  * job wraps around `query.awaitTermination()`; nothing in THIS object is
  * local-mode-specific — `start()` just has to reuse the same
  * checkpoint location, which is the contract checkpointing already
  * imposes. (The companion [[TransientFault]] test seam, by contrast, IS
  * JVM-local by design — it models a driver-scoped connection; see its
  * own scaladoc before generalizing from the harness entries.)
  */
object Supervisor {

  /** `attempts` = times the query was started; `restarts` = recoveries
    * (attempts − 1). */
  final case class Outcome(attempts: Int, restarts: Int)

  /** Run `work` against a (re)startable streaming query. Each attempt
    * calls `start()` — which MUST reuse the same checkpoint directory —
    * then `work(q)`; on failure the query is stopped, the supervisor
    * sleeps `backoff`, and the next attempt begins. `work` is re-invoked
    * on every attempt and so must be resumable (track externally what
    * has already been fed; replayed input is deduplicated by the
    * checkpoint's offset log, not by `work`).
    */
  def run(start: () => StreamingQuery,
      maxRestarts: Int = 10,
      backoff: java.time.Duration = java.time.Duration.ofSeconds(3),
      sleep: java.time.Duration => Unit = d => Thread.sleep(d.toMillis))
      (work: StreamingQuery => Unit): Outcome = {
    var restarts = 0
    while (true) {
      // start() is INSIDE the budget: a failure while re-establishing the
      // query (e.g. the checkpoint still held by a half-stopped previous
      // attempt) is exactly the connection-establishment failure the
      // reference's ping loop retries (main.go:46-60) — it must consume a
      // retry, not escape with the budget unused
      try {
        val q = start()
        try {
          work(q)
          q.stop()
          return Outcome(restarts + 1, restarts)
        } catch {
          case NonFatal(e) =>
            try q.stop() catch { case NonFatal(_) => () }
            throw e
        }
      } catch {
        case NonFatal(e) =>
          if (restarts >= maxRestarts) throw e
          restarts += 1
          sleep(backoff)
      }
    }
    sys.error("unreachable")
  }

  /** The reference's OTHER reconnect leg: the ticker-driven PROACTIVE
    * resubscribe (process.go:13,43-49 — every 5 min the exporter drops
    * and re-establishes its subscriptions even when healthy). Spark
    * analog: cleanly stop and restart the query between epochs, same
    * checkpoint — a scheduled rebounce, where [[run]] handles the
    * failure-driven one. `epoch(q, i)` is the work of one ticker
    * interval; failures inside an epoch consume the SAME bounded retry
    * budget (the reference's ping loop runs inside its reconnect loop),
    * re-entering the epoch that died. Exactly-once across every
    * stop/start seam comes from the same checkpoint + sink-commit-log
    * contract as [[run]] — SupervisorSpec pins that a multi-epoch
    * rebounce with a mid-epoch kill still emits the uninterrupted rows.
    */
  def rebounce(start: () => StreamingQuery, epochs: Int,
      maxRestarts: Int = 10,
      backoff: java.time.Duration = java.time.Duration.ofSeconds(3),
      sleep: java.time.Duration => Unit = d => Thread.sleep(d.toMillis))
      (epoch: (StreamingQuery, Int) => Unit): Outcome = {
    var restarts = 0
    var i = 0
    while (i < epochs) {
      // same budget placement as [[run]]: a failing start() consumes a
      // retry instead of escaping with the budget unused
      try {
        val q = start()
        try {
          epoch(q, i)
          q.stop()
          i += 1
        } catch {
          case NonFatal(e) =>
            try q.stop() catch { case NonFatal(_) => () }
            throw e
        }
      } catch {
        case NonFatal(e) =>
          if (restarts >= maxRestarts) throw e
          restarts += 1
          sleep(backoff)
      }
    }
    Outcome(epochs + restarts, restarts)
  }
}

/** Deterministic stand-in for the external failure the reference's retry
  * loop exists to survive (a dropped gRPC wire). Arm a key with a failure
  * budget; `tripwire` throws while budget remains and is a no-op after —
  * so the FIRST pass over the data dies exactly once and the supervised
  * replay sails through, making recovery reproducible enough to
  * hash-oracle. JVM-local by design: the fault seam models the
  * connection (a driver/session-scoped resource), not task state, and is
  * only ever armed by tests and the `a19_reconnect_replay` harness entry.
  */
object TransientFault {
  private val budgets = new ConcurrentHashMap[String, AtomicInteger]()

  def arm(key: String, failures: Int): Unit =
    budgets.put(key, new AtomicInteger(failures))

  /** Throws an IOException while `key` has failure budget left. */
  def tripwire(key: String): Unit = {
    val b = budgets.get(key)
    if (b != null && b.getAndDecrement() > 0)
      throw new java.io.IOException(s"injected transient wire fault [$key]")
  }
}
