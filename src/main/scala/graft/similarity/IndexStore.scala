package graft.similarity

import java.nio.file.{Files, Paths}

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
  * separate process after the Spark JVM has exited). Each artifact carries a
  * sidecar marker recording the scale-factor dir it was built from; a serve
  * call against a different dir (or a missing artifact) rebuilds, so a stale
  * sf0.001 index can never answer an sf0.1 query. The marker is deleted
  * BEFORE the overwrite and rewritten after, so a write that dies mid-flight
  * leaves an invalid (absent) marker, never a valid marker on torn data.
  *
  * At 100 TB the same protocol holds with the paths pointed at object
  * storage and the marker replaced by the table format's transaction log
  * (Delta/Iceberg snapshot id) — the serve plan is unchanged: scan the
  * index table, broadcast the (tiny) codebook side, never retrain.
  */
object IndexStore {

  /** On-disk home of the persisted index artifacts. */
  val Root = "/tmp/graft_index/current"

  /** Read artifact `name`, building + persisting it first iff it is absent
    * or was built from a different sf dir. Build cost is paid at most once
    * per (artifact, sf dir); every later call is a pure parquet scan. */
  def ensure(spark: SparkSession, dir: String, name: String)
      (build: => DataFrame): DataFrame = {
    val root = Paths.get(Root)
    val marker = root.resolve(s"$name.sf")
    val data = root.resolve(name)
    val want = Paths.get(dir).normalize().toString
    val have =
      if (Files.exists(marker)) Files.readString(marker).trim else ""
    if (have != want || !Files.exists(data)) {
      Files.createDirectories(root)
      Files.deleteIfExists(marker)
      build.write.mode("overwrite").parquet(data.toString)
      Files.writeString(marker, want)
    }
    spark.read.parquet(data.toString)
  }

  /** DuckDB spelling of an artifact scan (the oracle side of the split). */
  def duckdbScan(name: String): String =
    s"read_parquet('$Root/$name/*.parquet')"
}
