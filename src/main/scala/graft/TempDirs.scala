package graft

import java.nio.file.{Files, Path}
import java.util.Comparator

import scala.collection.concurrent.TrieMap

/** Registry of temp directories the library creates (streaming feed
  * splits, file-sink outputs), deleted recursively on JVM exit —
  * repeated Verify/Bench sessions must not accumulate orphaned
  * `graft-*` trees under /tmp. Registration is idempotent and the hook
  * tolerates races with Spark's own shutdown (best-effort deletes). */
object TempDirs {

  private val dirs = TrieMap.empty[String, Unit]

  sys.addShutdownHook { sweep() }

  /** Delete every registered dir now (also the shutdown hook's body —
    * callable from tests to prove the sweep works without killing the
    * JVM). The walk stream is closed explicitly: each open stream holds
    * a directory handle, and the sweep may visit many dirs. */
  def sweep(): Unit = {
    dirs.keys.foreach { d =>
      try {
        val p = java.nio.file.Paths.get(d)
        if (Files.exists(p)) {
          val walk = Files.walk(p)
          try walk.sorted(Comparator.reverseOrder[Path]())
            .forEach(f => { try Files.deleteIfExists(f) catch { case _: Exception => () } })
          finally walk.close()
        }
        dirs.remove(d)
      } catch { case _: Exception => () }
    }
  }

  /** Creates a temp directory that will be deleted on JVM exit. */
  def create(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    dirs.put(p.toString, ())
    p
  }

  /** Creates a registered temp directory under an explicit base (e.g.
    * tmpfs for streaming checkpoints); same exit-time sweep. */
  def createIn(base: Path, prefix: String): Path = {
    val p = Files.createTempDirectory(base, prefix)
    dirs.put(p.toString, ())
    p
  }
}
