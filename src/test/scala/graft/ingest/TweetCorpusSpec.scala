package graft.ingest

import java.io.File
import java.nio.file.Files
import java.security.MessageDigest

import graft.SparkSpec
import graft.queries.TweetQueries

/** The scaled corpus contract: the oracle is a static SQL string reading a
  * fixed absolute path, so generation MUST be byte-deterministic — any
  * process may race to materialize it and all must agree. */
class TweetCorpusSpec extends SparkSpec {

  private def digest(dir: String): String = {
    val md = MessageDigest.getInstance("SHA-256")
    new File(dir).listFiles().filter(_.getName.endsWith(".json"))
      .sortBy(_.getName)
      .foreach(f => md.update(Files.readAllBytes(f.toPath)))
    md.digest().map("%02x".format(_)).mkString
  }

  test("scaled corpus generation is byte-deterministic across regenerations") {
    val dir = TweetCorpus.ensureScaled()
    val first = digest(dir)
    new File(dir).listFiles().foreach(_.delete())
    assert(TweetCorpus.ensureScaled() == dir)
    assert(digest(dir) == first)
    val n = spark.read.json(dir).count()
    assert(n == TweetCorpus.ScaledTweets, s"corpus rows = $n")
  }

  test("tweetsDir honors a tweets/ subdir under the sf dir, else falls back") {
    val tmp = graft.TempDirs.create("graft-twdir")
    assert(TweetQueries.tweetsDir(tmp.toString) == TweetQueries.FixtureDir)
    val sub = tmp.resolve("tweets")
    Files.createDirectories(sub)
    assert(TweetQueries.tweetsDir(tmp.toString) == sub.toString)
  }
}
