package graft.similarity

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.util.control.NonFatal

/** Publication-pointer seam of the snapshot protocol (round 14, VERDICT
  * r13 #8): everything above this interface — versioned immutable
  * directories, per-name write locks, lineage markers, grace-window GC,
  * resolve-once readers — is storage-agnostic; the ONLY operation that
  * differs between a POSIX filesystem and an object store is how the
  * "current version" pointer is resolved and atomically replaced.
  *
  * Contract both implementations must honor (the IndexStoreSpec /
  * SnapshotCommitSpec suites run against each):
  *
  *  - [[resolve]] returns the CANONICAL real path of one complete,
  *    fully-published version directory, or None — never a path to a
  *    half-written directory (publication happens strictly after the
  *    version's files and markers are on disk);
  *  - [[swap]] is ATOMIC with respect to concurrent resolvers: a racing
  *    reader sees the old pointer or the new pointer, never an absent or
  *    partially-written one;
  *  - swap-then-resolve in one process is immediately visible to
  *    resolve in another (same-filesystem visibility).
  */
trait SnapshotPointer {

  /** Current immutable version directory of `name`, or None when the
    * artifact is unpublished (or its pointer dangles — e.g. the target
    * was GC'd by an outside force); never throws. */
  def resolve(root: Path, name: String): Option[Path]

  /** Atomically repoint `name` at the (complete, on-disk) `version`.
    * Implementations also REMOVE the other spelling's stale pointer
    * (see [[SnapshotPointer.dropOtherForms]]): a deployment that
    * switches implementations must cold-start (resolve None → rebuild),
    * never silently serve the version the abandoned pointer form still
    * names. */
  def swap(root: Path, name: String, version: Path): Unit
}

object SnapshotPointer {
  /** Best-effort removal of every OTHER pointer spelling for `name` —
    * called by each impl's swap after installing its own pointer, so
    * the most recent swap is authoritative under EITHER resolver. Only
    * pointer forms are touched (a symlink, a `.ptr` file); a legacy
    * real directory at the link path is the publisher's migration
    * concern, not a pointer. */
  private[similarity] def dropOtherForms(root: Path, name: String,
      keep: SnapshotPointer): Unit = {
    try {
      if (keep ne PosixSymlinkPointer) {
        val link = root.resolve(name)
        if (Files.isSymbolicLink(link)) Files.deleteIfExists(link)
      }
      if (keep ne ManifestFilePointer)
        Files.deleteIfExists(root.resolve(s"$name.ptr"))
    } catch { case NonFatal(_) => () }
  }
}

/** Default pointer: `root/<name>` is a SYMLINK to the current version,
  * replaced via temp-link + atomic `rename(2)`. The cheapest correct
  * spelling on a POSIX filesystem — resolution is one readlink, and the
  * rename gives atomic replace with no reader-visible gap. */
object PosixSymlinkPointer extends SnapshotPointer {

  override def resolve(root: Path, name: String): Option[Path] = {
    val link = root.resolve(name)
    try {
      if (Files.isSymbolicLink(link)) Some(link.toRealPath()) else None
    } catch { case NonFatal(_) => None } // dangling link ≙ unpublished
  }

  override def swap(root: Path, name: String, version: Path): Unit = {
    val tmpLink = root.resolve(s".lnk-$name-${version.getFileName}")
    Files.deleteIfExists(tmpLink)
    Files.createSymbolicLink(tmpLink, version)
    Files.move(tmpLink, root.resolve(name), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    SnapshotPointer.dropOtherForms(root, name, keep = this)
  }
}

/** Object-store spelling: the current-version pointer is a small FILE
  * (`root/<name>.ptr`) holding the version directory's canonical path,
  * replaced by temp-file + atomic rename. On a real object store the
  * rename becomes a conditional PUT (or the table format's transaction
  * log append) — symlinks don't exist there, pointer objects do. The
  * protocol above the seam is byte-for-byte the same. */
object ManifestFilePointer extends SnapshotPointer {

  private def ptrPath(root: Path, name: String): Path =
    root.resolve(s"$name.ptr")

  override def resolve(root: Path, name: String): Option[Path] =
    try {
      val ptr = ptrPath(root, name)
      if (!Files.exists(ptr)) None
      else {
        val target = Paths.get(Files.readString(ptr).trim)
        if (Files.isDirectory(target)) Some(target.toRealPath()) else None
      }
    } catch { case NonFatal(_) => None }

  override def swap(root: Path, name: String, version: Path): Unit = {
    val tmp = root.resolve(s".ptr-$name-${version.getFileName}")
    Files.writeString(tmp, version.toRealPath().toString)
    Files.move(tmp, ptrPath(root, name), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    SnapshotPointer.dropOtherForms(root, name, keep = this)
  }
}
