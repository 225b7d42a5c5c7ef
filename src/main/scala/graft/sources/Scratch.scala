package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.ConcurrentHashMap

/** Scratch directories for write+readback entries (merge-time compaction,
  * aggregate-state parts tables, text-format round-trips): one dir per
  * logical key, MEMOIZED so reruns within an application are idempotent
  * (Overwrite into the same path), UNIQUE per JVM (`createTempDirectory`)
  * so concurrent applications can't race on a shared /tmp path, and
  * deleted on JVM exit so nothing leaks. Keys should include the
  * application id and the input dir — the cache must not serve one
  * input's materialization to another.
  */
object Scratch {

  private val dirs = new ConcurrentHashMap[String, String]()

  def dir(key: String): String =
    dirs.computeIfAbsent(key, _ =>
      Files.createTempDirectory("graft_scratch_").toString)

  /** Recursive best-effort delete (walk deepest-first, swallow races) —
    * ONE owner for the idiom (round 12 review): the shutdown hook below
    * and the replay-retry cleanups (EventQueries, E2eQueries) all need
    * it, and the copies had already drifted on IOException handling.
    */
  def deleteRecursively(path: String): Unit = {
    val root: Path = Paths.get(path)
    if (Files.exists(root)) {
      val walk = Files.walk(root)
      try walk.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f =>
          try Files.deleteIfExists(f)
          catch { case _: java.io.IOException => () })
      finally walk.close()
    }
  }

  Runtime.getRuntime.addShutdownHook(new Thread(() =>
    dirs.values.forEach { p =>
      // never let one racing dir (other shutdown hooks may still be
      // flushing — deletes throw DirectoryNotEmptyException and friends)
      // abort the cleanup of the remaining roots
      try deleteRecursively(p)
      catch { case scala.util.control.NonFatal(_) => () }
    }))
}
