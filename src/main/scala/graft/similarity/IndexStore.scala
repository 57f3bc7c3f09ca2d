package graft.similarity

import java.nio.channels.FileChannel
import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}
import java.util.concurrent.ConcurrentHashMap

import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persisted-index lifecycle for the trained ANN stack — the build/serve
  * split a production deployment runs. `sim_ivf_trained`/`sim_pq_trained`
  * retrain their k-means/codebook inside the query (the right shape for a
  * one-shot batch job); at 100 TB the index is built ONCE, persisted as a
  * parquet artifact, and every query after that only pays assignment + ADC
  * against the stored table. `sim_ivf_served`/`sim_pq_served` register that
  * second shape: they read the artifact and run retrieval only.
  *
  * Artifacts live at a FIXED path (not a [[graft.TempDirs]] dir — those are
  * swept on JVM exit, and the DuckDB oracle reads the artifact from a
  * separate process after the Spark JVM has exited).
  *
  * Publication is ATOMIC ACROSS PROCESSES (round 12 — the previous
  * marker-delete → overwrite → marker-write sequence was crash-safe for one
  * writer, but bench and verify JVMs share this fixed path and could
  * interleave: a reader could catch writer B mid-overwrite under writer A's
  * still-valid marker). The protocol is the essence of a table format's
  * snapshot commit:
  *
  *  - every build lands in a fresh immutable VERSION directory
  *    (`Root/.v/<name>-<token>`), with the scale-factor marker written
  *    INSIDE it (`_GRAFT_SF`, underscore-prefixed so both Spark and the
  *    oracle's `*.parquet` glob ignore it) — marker and data live or die
  *    together, they can never desync;
  *  - `Root/<name>` is a SYMLINK to the current version, replaced via
  *    temp-link + atomic `rename(2)` — readers see the old complete
  *    version or the new complete version, never a mixture;
  *  - readers resolve the link ONCE and scan the immutable real path, so
  *    a republish mid-scan cannot swap files under them;
  *  - writers serialize through a per-name advisory file lock (plus a
  *    JVM-level monitor, since POSIX file locks are per-process) and
  *    re-check under the lock, so racing builders collapse to one build;
  *  - the lock holder garbage-collects versions it just superseded,
  *    KEEPING the immediately previous one — an in-flight reader that
  *    resolved the link before the swap finishes its scan untouched.
  *
  * A build that dies mid-write leaves an unpublished version directory and
  * an untouched link: readers never see it, and the next writer GCs it.
  * At 100 TB the same protocol holds with the paths pointed at object
  * storage and the symlink swap replaced by the table format's transaction
  * log (Delta/Iceberg snapshot pointer) — the serve plan is unchanged:
  * scan the index table, broadcast the (tiny) codebook side, never retrain.
  */
object IndexStore {

  /** On-disk home of the persisted index artifacts. */
  val Root = "/tmp/graft_index/current"

  /** Marker file inside each version directory recording the sf dir the
    * artifact was built from (underscore prefix = ignored by scans). */
  val SfMarker = "_GRAFT_SF"

  /** POSIX file locks are held per-process: a second thread in the same
    * JVM hitting the same lock file throws OverlappingFileLockException
    * instead of waiting. Same-JVM writers serialize on this monitor
    * first, cross-process writers on the file lock. */
  private val jvmLocks = new ConcurrentHashMap[String, Object]()

  private def versionsDir: Path = Paths.get(Root, ".v")
  private def linkPath(name: String): Path = Paths.get(Root, name)

  /** Resolve the published version of `name` iff its in-directory marker
    * matches `want`. Returns the immutable REAL path, never the link. */
  private def published(name: String, want: String): Option[Path] = {
    val link = linkPath(name)
    if (!Files.isSymbolicLink(link)) None
    else {
      val real = link.toRealPath() // resolves; throws only if target vanished
      val marker = real.resolve(SfMarker)
      if (Files.exists(marker) && Files.readString(marker).trim == want)
        Some(real)
      else None
    }
  }

  /** Read artifact `name`, building + persisting it first iff it is absent
    * or was built from a different sf dir. Build cost is paid at most once
    * per (artifact, sf dir) even under concurrent writers; every later
    * call is a pure parquet scan of an immutable version directory. */
  def ensure(spark: SparkSession, dir: String, name: String)
      (build: => DataFrame): DataFrame = {
    val want = Paths.get(dir).normalize().toString
    val fast = try published(name, want) catch { case NonFatal(_) => None }
    val real = fast.getOrElse {
      val monitor = jvmLocks.computeIfAbsent(name, _ => new Object)
      monitor.synchronized {
        Files.createDirectories(versionsDir)
        val lockFile = Paths.get(Root, s".lock-$name")
        val ch = FileChannel.open(lockFile,
          StandardOpenOption.CREATE, StandardOpenOption.WRITE)
        try {
          val lock = ch.lock() // blocks until any cross-process writer finishes
          try {
            // the loser of the race finds the winner's publication here
            published(name, want).getOrElse(buildAndPublish(name, want, build))
          } finally lock.release()
        } finally ch.close()
      }
    }
    spark.read.parquet(real.toString)
  }

  /** Must hold the per-name lock. Builds a fresh version, publishes it
    * with an atomic link swap, GCs superseded versions (keeping the one
    * just replaced for in-flight readers). Returns the new real path. */
  private def buildAndPublish(name: String, want: String,
      build: => DataFrame): Path = {
    val link = linkPath(name)
    val previous: Option[Path] =
      if (Files.isSymbolicLink(link))
        try Some(link.toRealPath()) catch { case NonFatal(_) => None }
      else None
    // migrate/clear a legacy non-symlink directory (pre-round-12 layout)
    if (Files.exists(link, java.nio.file.LinkOption.NOFOLLOW_LINKS) &&
        !Files.isSymbolicLink(link))
      deleteRecursively(link)
    Files.deleteIfExists(Paths.get(Root, s"$name.sf")) // legacy sidecar
    val token = java.util.UUID.randomUUID().toString.take(12)
    val version = versionsDir.resolve(s"$name-$token")
    build.write.mode("overwrite").parquet(version.toString)
    Files.writeString(version.resolve(SfMarker), want)
    // atomic publish: temp symlink + rename over the old link
    val tmpLink = Paths.get(Root, s".lnk-$name-$token")
    Files.deleteIfExists(tmpLink)
    Files.createSymbolicLink(tmpLink, version)
    Files.move(tmpLink, link, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    // GC: every version of this name except the new one and its immediate
    // predecessor (an in-flight reader may still be scanning that one)
    val keep = Set(version) ++ previous
    try {
      val listing = Files.list(versionsDir)
      try listing.forEach { p =>
        if (p.getFileName.toString.startsWith(s"$name-") && !keep.contains(p))
          deleteRecursively(p)
      } finally listing.close()
    } catch { case NonFatal(_) => () } // GC is best-effort, never fatal
    version
  }

  private def deleteRecursively(p: Path): Unit = {
    val walk = Files.walk(p)
    try walk.sorted(java.util.Comparator.reverseOrder[Path]())
      .forEach(f => Files.deleteIfExists(f))
    finally walk.close()
  }

  /** DuckDB spelling of an artifact scan (the oracle side of the split).
    * The glob runs through the published symlink, which resolves to one
    * complete immutable version. */
  def duckdbScan(name: String): String =
    s"read_parquet('$Root/$name/*.parquet')"
}
