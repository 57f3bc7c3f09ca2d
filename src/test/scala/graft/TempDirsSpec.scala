package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Temp-dir hygiene: the registry's sweep (the shutdown hook's body)
  * must actually remove registered trees — repeated Verify/Bench
  * sessions must not accumulate orphaned `graft-*` dirs under /tmp. */
class TempDirsSpec extends AnyFunSuite {

  test("sweep removes registered trees, including non-empty ones, and is idempotent") {
    val d = TempDirs.create("graft-hygiene")
    Files.createDirectories(d.resolve("a/b"))
    Files.writeString(d.resolve("a/b/f.txt"), "x")
    val d2 = TempDirs.create("graft-hygiene")
    // a dir deleted out from under the registry must not break the sweep
    Files.delete(d2)
    TempDirs.sweep()
    assert(!Files.exists(d), s"sweep left $d behind")
    assert(!Files.exists(d2))
    TempDirs.sweep() // idempotent: nothing left to do, nothing thrown
  }

  test("a streaming query still checkpoints after a mid-JVM sweep") {
    // regression: the sweep deletes the streaming family's tmpfs
    // checkpoint root; a cached root then fails every later query's
    // per-query checkpoint dir (NoSuchFileException). The root must
    // self-heal on next use.
    TempDirs.sweep()
    val rows = graft.streaming.StreamingOps
      .completeCounts(TestSpark.spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
  }
}
