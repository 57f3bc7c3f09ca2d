package graft.ingest

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardCopyOption}

/** Test-only re-implementation of the reference's ingestion rotation
  * protocol (S4, reference q1:238-248): write each batch of NDJSON lines to
  * a hidden tmp file, then atomically rename it into the watched directory,
  * so Spark's file-stream source never observes a half-written file. The
  * network side of the reference connector is out of scope (zero egress).
  */
object FileFeeder {

  /** Rotate `batches` of lines into `dir` as `prefix-NNNNN.json` files. */
  def feed(dir: Path, batches: Seq[Seq[String]], prefix: String = "feed"): Seq[Path] = {
    Files.createDirectories(dir)
    batches.zipWithIndex.map { case (lines, i) =>
      val tmp = dir.resolve(f".$prefix-$i%05d.tmp")
      Files.write(tmp, lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
      val dst = dir.resolve(f"$prefix-$i%05d.json")
      Files.move(tmp, dst, StandardCopyOption.ATOMIC_MOVE)
      dst
    }
  }
}
