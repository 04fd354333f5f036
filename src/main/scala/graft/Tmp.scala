package graft

import java.nio.file.{Files, Path, Paths}

/** Session-rooted scratch-directory factory.
  *
  * Every gate that runs a write→maintain→read-back lifecycle needs a
  * scratch lake; `Files.createTempDirectory` alone leaks them (a full
  * Verify+Bench session creates hundreds, and a long-lived deployment
  * would fill /tmp — round-16 audit found 13k+ orphaned `graft_*` dirs on
  * this box). Instead, all scratch dirs nest under ONE per-JVM root
  * (`graft_run_<pid>_*`), deleted recursively by a shutdown hook — so a
  * session leaves /tmp exactly as it found it, and a crashed session
  * leaves one identifiable root instead of confetti.
  *
  * [[purge]] deletes the root eagerly (Verify/Bench call it after their
  * outputs are safely written); the hook remains as the backstop for any
  * exit path that skips it.
  */
object Tmp {

  private val rootRef = new java.util.concurrent.atomic.AtomicReference[Path](null)

  /** The per-JVM scratch root, created lazily on first use. */
  def root: Path = {
    val cur = rootRef.get()
    if (cur != null) cur
    else {
      val base = Paths.get(sys.props.getOrElse("java.io.tmpdir", "/tmp"))
      val fresh = Files.createTempDirectory(base,
        s"graft_run_${ProcessHandle.current().pid()}_")
      if (rootRef.compareAndSet(null, fresh)) {
        Runtime.getRuntime.addShutdownHook(new Thread(() => deleteTree(fresh)))
        fresh
      } else {
        // lost the race: drop ours, use the winner's
        Files.deleteIfExists(fresh)
        rootRef.get()
      }
    }
  }

  /** A fresh scratch directory under the session root. Drop-in for
    * `Files.createTempDirectory(prefix)` — same uniqueness guarantee,
    * but the result is reclaimed when the session ends.
    */
  def dir(prefix: String): Path = Files.createTempDirectory(root, prefix)

  /** Eagerly delete the session root and everything under it. Safe to
    * call more than once; a later [[dir]] call starts a fresh root.
    */
  def purge(): Unit = {
    val cur = rootRef.getAndSet(null)
    if (cur != null) deleteTree(cur)
  }

  private def deleteTree(p: Path): Unit =
    org.apache.commons.io.FileUtils.deleteQuietly(p.toFile): Unit
}
