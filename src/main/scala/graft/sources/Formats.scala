package graft.sources

import java.io.File

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Engine, Tables, TempDirs}

/** Source-format coverage beyond parquet/JSON: ORC and CSV ingestion,
  * verified by ROUND-TRIP parity — each query materializes a lineitem
  * projection into the format once (deterministic per-sf path, marker
  * guarded), reads it back through the format's own reader, and
  * aggregates; the DuckDB oracle computes the same aggregate from the
  * PARQUET original, so any fidelity loss in the format writer/reader
  * (double formatting, quoting, nulls) breaks the hash.
  *
  * CSV is the interesting one: doubles survive because Spark writes
  * shortest-round-trip representations; the schema is supplied on read
  * (CSV carries none) — exactly the posture an ingestion job needs.
  * Scale note: both readers are splittable scans here (ORC natively;
  * CSV without multiline), so the downstream plan is identical to the
  * parquet variant's scan → partial agg → exchange → final agg.
  */
object Formats {

  private val materialized = TrieMap.empty[String, String]

  private def sfTag(dir: String): String =
    dir.replaceAll("[^A-Za-z0-9.]", "_")

  /** One-time LOCKED materialization of a fixed-path side artifact
    * (round 15, generalizing the ADVICE r14 layout fix to every
    * marker-guarded builder in this module): concurrent bench/verify
    * processes are a supported scenario, and a bare marker check would
    * let two first-builders interleave writes into the same directory
    * and persist the marker over a torn result. Cross-process writers
    * serialize on IndexStore's per-name advisory lock; `write` lands
    * the artifact in a temp sibling, which ONE atomic rename publishes
    * before the marker is created — the marker can never legitimize a
    * partial directory, and a crashed build leaves only an unpublished
    * temp dir the next builder ignores. The fast path (marker present)
    * costs one stat, no lock. */
  private def buildOnce(out: String)(write: String => Unit): String = {
    if (!new File(out, "_COMPLETE").exists())
      graft.similarity.IndexStore.withArtifactLock(s"bld_${new File(out).getName}") {
        val marker = new File(out, "_COMPLETE")
        if (!marker.exists()) {
          val tmp = s"$out.tmp-${java.util.UUID.randomUUID().toString.take(8)}"
          write(tmp)
          // a torn remnant of a pre-lock-era crash can't be trusted
          if (new File(out).exists())
            graft.similarity.IndexStore.deleteRecursively(
              java.nio.file.Paths.get(out))
          java.nio.file.Files.move(java.nio.file.Paths.get(tmp),
            java.nio.file.Paths.get(out),
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          // the marker carries a unique BUILD ID: derived artifacts (the
          // stats manifests) key their ensure on it, so a layout rebuild
          // — same sf, new part-file names — invalidates them instead of
          // leaving them pointing at deleted files (see [[buildId]])
          java.nio.file.Files.writeString(marker.toPath,
            java.util.UUID.randomUUID().toString.take(12))
        }
      }
    out
  }

  /** The build identity of a [[buildOnce]] artifact — the marker's
    * content ("" for a legacy empty marker, which still forces one
    * manifest rebuild on first contact because the ensure key changes
    * shape). Derived artifacts append this to their ensure `dir` key:
    * two builds of the same layout at the same sf are DIFFERENT
    * artifacts (their file names differ), and a manifest must never
    * outlive the exact build it indexed. */
  private def buildId(out: String): String =
    try java.nio.file.Files.readString(
      java.nio.file.Paths.get(out, "_COMPLETE")).trim
    catch { case scala.util.control.NonFatal(_) => "" }

  /** Writes the lineitem projection as `fmt` once per (dir, fmt). */
  private def materialize(spark: SparkSession, dir: String, fmt: String): String =
    materialized.getOrElseUpdate(s"$dir#$fmt", {
      buildOnce(s"/tmp/graft-src-$fmt-${sfTag(dir)}") { tmp =>
        val proj = Tables(spark, dir, "lineitem")
          .select(col("l_returnflag"), col("l_linestatus"),
            col("l_quantity"), col("l_extendedprice"))
        val writer = proj.write.mode("overwrite")
        fmt match {
          case "orc" => writer.orc(tmp)
          case "csv" => writer.option("header", "true").csv(tmp)
          case "json" => writer.json(tmp)
          case "zstd" => writer.option("compression", "zstd").parquet(tmp)
        }
      }
    })

  private def pricingAgg(df: DataFrame): DataFrame =
    df.groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_quantity")).as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
      .orderBy("l_returnflag", "l_linestatus")

  def orcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    Engine.tune(spark)
    pricingAgg(spark.read.orc(materialize(spark, dir, "orc")))
  }

  /** Parquet + ZSTD codec round-trip — the compression knob a 100 TB
    * deployment actually turns (zstd trades a little CPU for markedly
    * smaller scans than the snappy default): write the projection with
    * `compression=zstd`, read it back, and the standard pricing
    * aggregate must match the original table under the oracle hash.
    * The spec pins that the codec was genuinely applied (the part files
    * carry the .zstd.parquet suffix), so a silently-ignored option
    * cannot masquerade as fidelity. */
  def zstdRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    Engine.tune(spark)
    pricingAgg(spark.read.parquet(materialize(spark, dir, "zstd")))
  }

  def csvRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    Engine.tune(spark)
    val schema = "l_returnflag STRING, l_linestatus STRING, " +
      "l_quantity DOUBLE, l_extendedprice DOUBLE"
    pricingAgg(spark.read.schema(schema)
      .option("header", "true").csv(materialize(spark, dir, "csv")))
  }

  /** NDJSON round-trip: like CSV, the schema is supplied on read (JSON
    * inference would widen types); doubles survive via shortest-round-trip
    * literals. NDJSON is splittable, so the scan parallelism matches. */
  def jsonRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    Engine.tune(spark)
    val schema = "l_returnflag STRING, l_linestatus STRING, " +
      "l_quantity DOUBLE, l_extendedprice DOUBLE"
    pricingAgg(spark.read.schema(schema)
      .json(materialize(spark, dir, "json")))
  }

  /** Aggregate over the custom DataSource V2 connector
    * ([[SyntheticDocsSource]]): the rows are deterministic arithmetic, so
    * the DuckDB oracle reproduces the identical table from `range()` —
    * a custom connector under the cross-engine hash gate. `id` is not
    * referenced, so column pruning must keep the reader from ever
    * materializing it (asserted in SyntheticDocsSourceSpec). */
  def dsv2Scan(spark: SparkSession, dir: String): DataFrame = {
    Engine.tune(spark)
    spark.read.format("graft.sources.SyntheticDocsSource")
      .option("rows", "100000").option("parts", "8").load()
      .groupBy("bucket")
      .agg(count(lit(1)).as("cnt"),
        sum(col("score").cast("decimal(18,6)")).cast("double").as("sum_score"))
      .orderBy("bucket")
  }

  /** Rows the write-face query inserts: the OVERWRITE batch covers ids
    * [0, base), the APPEND batch [base, base + append) — both pure
    * deterministic arithmetic so the DuckDB oracle re-derives the table
    * from `range()` without ever reading the connector's bytes. */
  val Dsv2WriteBase = 10000L
  val Dsv2WriteAppend = 2000L

  /** Per-PROCESS catalog root (TempDirs — swept at JVM exit): the
    * write-face query owns its table and nothing cross-process reads it
    * (the oracle re-derives from the inserted arithmetic), so process
    * scope dodges cross-process write interleaving by construction —
    * the cross-process atomicity story itself is the commit protocol's,
    * spec-pinned in GraftCatalogSpec. */
  private lazy val catalogRoot: String =
    graft.TempDirs.create("graft-cat").toString

  /** The full SQL write path through the DSv2 catalog (round 17, VERDICT
    * r16 #1): CREATE TABLE on [[GraftCatalog]], an INSERT OVERWRITE
    * (truncate capability, idempotent re-runs), an INSERT INTO (append —
    * a second manifest version over the same data pool), then the
    * aggregate read back THROUGH THE SAME TABLE. Each insert stages
    * per-task files invisibly and publishes by one atomic pointer swap;
    * the read resolves the pointer once and scans the immutable
    * manifest snapshot. The inserted rows are the connector family's
    * deterministic Knuth-hash arithmetic, so the oracle gate covers the
    * codec round-trip, the manifest accumulation (overwrite base +
    * append), and the projection-level column pruning — cross-engine,
    * without DuckDB reading the custom format. */
  def dsv2Write(spark: SparkSession, dir: String): DataFrame = {
    Engine.tune(spark)
    val cat = ensureCatalog(spark)
    spark.sql(
      s"CREATE TABLE IF NOT EXISTS $cat.docs (id BIGINT, bucket INT, score DOUBLE)")
    spark.sql(s"INSERT OVERWRITE TABLE $cat.docs ${rowsSql(0L, Dsv2WriteBase)}")
    spark.sql(s"INSERT INTO $cat.docs ${rowsSql(Dsv2WriteBase, Dsv2WriteBase + Dsv2WriteAppend)}")
    spark.sql(
      s"""SELECT bucket, count(*) AS cnt,
         |  CAST(sum(CAST(score AS DECIMAL(18,6))) AS DOUBLE) AS sum_score
         |FROM $cat.docs GROUP BY bucket ORDER BY bucket""".stripMargin)
  }

  /** Registers the graft catalog on the session (idempotent — same
    * constants per process) and returns the catalog name. Shared with
    * the streaming sink ([[graft.streaming.StreamingOps.dsv2StreamSink]]). */
  private[graft] def ensureCatalog(spark: SparkSession): String = {
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", catalogRoot)
    "graft_cat"
  }

  /** The deterministic insert batch over [lo, hi) — the connector
    * family's Knuth-hash arithmetic, shared by every write-face query.
    * `slices > 0` pins range()'s partition count, which pins the FILE
    * LAYOUT the insert produces: without it the file count tracks the
    * session's core count (`leafNodeDefaultParallelism`), so a query
    * whose in-query assertions are file-granular (the DV-delete "no
    * data file rewritten or dropped" fileset equality) silently changes
    * scenario at a different `SPARK_GRAFT_CPUS` — at 32 cores the 12k
    * rows land in 375-row files and a 1000-id range delete fully masks
    * whole files, which the DV path legitimately DROPS (documented in
    * [[GraftCatalog]]). Found by the r17 optimization baseline bench:
    * green at 8 cores (verify) / failed at 32 (bench). */
  private[graft] def rowsSql(lo: Long, hi: Long, slices: Int = 0): String = {
    val range = if (slices > 0) s"range($lo, $hi, 1, $slices)" else s"range($lo, $hi)"
    s"""SELECT id,
       |  CAST(id * 2654435761 % 2147483648 % 16 AS INT) AS bucket,
       |  CAST(id * 2654435761 % 2147483648 % 1000 AS DOUBLE) / 1000.0 AS score
       |FROM $range""".stripMargin
  }

  /** SQL row-level DELETE on the catalog table (round 17 continuation):
    * overwrite + append land the 12k-row table, then
    * `DELETE FROM ... WHERE bucket = 3` routes through
    * [[GraftTable.deleteWhere]] — only pool files containing matches are
    * rewritten (survivors stream to fresh files, clean files carry over
    * by reference), published as a new manifest version. The aggregate
    * reads back through the same table; the oracle re-derives the
    * survivor set from the range() arithmetic, so one surviving bucket-3
    * row or one lost survivor breaks the hash. */
  def dsv2Delete(spark: SparkSession, dir: String): DataFrame = {
    Engine.tune(spark)
    val cat = ensureCatalog(spark)
    spark.sql(
      s"CREATE TABLE IF NOT EXISTS $cat.del (id BIGINT, bucket INT, score DOUBLE)")
    spark.sql(s"INSERT OVERWRITE TABLE $cat.del ${rowsSql(0L, Dsv2WriteBase)}")
    spark.sql(s"INSERT INTO $cat.del ${rowsSql(Dsv2WriteBase, Dsv2WriteBase + Dsv2WriteAppend)}")
    spark.sql(s"DELETE FROM $cat.del WHERE bucket = 3")
    spark.sql(
      s"""SELECT bucket, count(*) AS cnt,
         |  CAST(sum(CAST(score AS DECIMAL(18,6))) AS DOUBLE) AS sum_score
         |FROM $cat.del GROUP BY bucket ORDER BY bucket""".stripMargin)
  }

  /** TIME TRAVEL on the catalog table (round 17 continuation): the
    * overwrite snapshot and the post-append current version read side by
    * side — `VERSION AS OF <seq>` resolves the commit sequence number
    * stamped inside each immutable version dir (the seq is read off the
    * CURRENT version minus one, so the query is deterministic no matter
    * how many runs have grown the table's history). The oracle
    * re-derives both snapshots from the range() arithmetic — a
    * time-travel read that leaked an appended row (or lost one) breaks
    * the hash. */
  def dsv2TimeTravel(spark: SparkSession, dir: String): DataFrame = {
    Engine.tune(spark)
    val cat = ensureCatalog(spark)
    spark.sql(
      s"CREATE TABLE IF NOT EXISTS $cat.tt (id BIGINT, bucket INT, score DOUBLE)")
    spark.sql(s"INSERT OVERWRITE TABLE $cat.tt ${rowsSql(0L, Dsv2WriteBase)}")
    spark.sql(s"INSERT INTO $cat.tt ${rowsSql(Dsv2WriteBase, Dsv2WriteBase + Dsv2WriteAppend)}")
    val cur = GraftCatalog.seqOf(graft.similarity.IndexStore.pointer
      .resolve(java.nio.file.Paths.get(catalogRoot, "tt"),
        GraftCatalog.PointerName).get)
    spark.sql(
      s"""SELECT 'past' AS snap, bucket, count(*) AS cnt,
         |  CAST(sum(CAST(score AS DECIMAL(18,6))) AS DOUBLE) AS sum_score
         |FROM $cat.tt VERSION AS OF '${cur - 1}' GROUP BY bucket
         |UNION ALL
         |SELECT 'current' AS snap, bucket, count(*) AS cnt,
         |  CAST(sum(CAST(score AS DECIMAL(18,6))) AS DOUBLE) AS sum_score
         |FROM $cat.tt GROUP BY bucket
         |ORDER BY snap, bucket""".stripMargin)
  }

  /** TIME TRAVEL BY INSTANT (`TIMESTAMP AS OF` — the other half of the
    * time-travel pair): the overwrite and append land two commits, each
    * stamping its publish time inside the immutable version dir; the
    * query reads the table AS OF the FIRST commit's own publish instant
    * (>= semantics: the highest version published at-or-before the
    * instant) next to the current state. Deterministic per run — the
    * probed instant is read back off the version marker itself, never
    * the wall clock. The oracle re-derives both snapshots from range()
    * arithmetic, exactly the VERSION-AS-OF twin's gate. */
  def dsv2TimeTravelTs(spark: SparkSession, dir: String): DataFrame = {
    Engine.tune(spark)
    val cat = ensureCatalog(spark)
    spark.sql(s"DROP TABLE IF EXISTS $cat.ttts")
    spark.sql(s"CREATE TABLE $cat.ttts (id BIGINT, bucket INT, score DOUBLE)")
    spark.sql(s"INSERT OVERWRITE TABLE $cat.ttts ${rowsSql(0L, Dsv2WriteBase)}")
    val tdir = java.nio.file.Paths.get(catalogRoot, "ttts")
    val firstPublishMs = GraftCatalog.describeHistory(tdir).last.modifiedMs
    spark.sql(s"INSERT INTO $cat.ttts ${rowsSql(Dsv2WriteBase, Dsv2WriteBase + Dsv2WriteAppend)}")
    val asOf = java.time.Instant.ofEpochMilli(firstPublishMs).toString
    spark.sql(
      s"""SELECT 'past' AS snap, bucket, count(*) AS cnt,
         |  CAST(sum(CAST(score AS DECIMAL(18,6))) AS DOUBLE) AS sum_score
         |FROM $cat.ttts TIMESTAMP AS OF '$asOf' GROUP BY bucket
         |UNION ALL
         |SELECT 'current' AS snap, bucket, count(*) AS cnt,
         |  CAST(sum(CAST(score AS DECIMAL(18,6))) AS DOUBLE) AS sum_score
         |FROM $cat.ttts GROUP BY bucket
         |ORDER BY snap, bucket""".stripMargin)
  }

  /** COMPACTION of the catalog table (round 17 continuation — the
    * OPTIMIZE maintenance face): overwrite + append land ≥2 versions'
    * worth of small pool files (per-task staging multiplies them), then
    * [[GraftCatalog.compact]] coalesces the manifest to ONE file behind
    * the same pointer-swap commit. The aggregate reads back through the
    * compacted table; the oracle is the write-face arithmetic UNCHANGED
    * — a compaction that loses, duplicates, or reorders-into-corruption
    * a single row breaks the hash, and the spec separately pins the
    * file-count drop plus the superseded version's survival for time
    * travel. */
  def dsv2Compact(spark: SparkSession, dir: String): DataFrame = {
    Engine.tune(spark)
    val cat = ensureCatalog(spark)
    spark.sql(
      s"CREATE TABLE IF NOT EXISTS $cat.cmp (id BIGINT, bucket INT, score DOUBLE)")
    spark.sql(s"INSERT OVERWRITE TABLE $cat.cmp ${rowsSql(0L, Dsv2WriteBase)}")
    spark.sql(s"INSERT INTO $cat.cmp ${rowsSql(Dsv2WriteBase, Dsv2WriteBase + Dsv2WriteAppend)}")
    val tdir = java.nio.file.Paths.get(catalogRoot, "cmp")
    GraftCatalog.compact(tdir)
    val files = GraftCatalog.currentManifest(tdir)
    require(files.size == 1,
      s"compaction must leave one pool file, found ${files.size}")
    spark.sql(
      s"""SELECT bucket, count(*) AS cnt,
         |  CAST(sum(CAST(score AS DECIMAL(18,6))) AS DOUBLE) AS sum_score
         |FROM $cat.cmp GROUP BY bucket ORDER BY bucket""".stripMargin)
  }

  /** FILE SKIPPING on the catalog table (round 17 continuation — the
    * data-skipping face every table format lives on at 100 TB): four
    * contiguous id-range inserts land files whose manifest min/max
    * cannot overlap, then a range predicate prunes the earlier batches'
    * files at PLANNING time ([[GraftStatsSkip]] over the per-file stats
    * the writers collected). The query REQUIRES the scan's files=K/N
    * description to show real pruning (K < N), so a silent
    * skip-nothing regression fails the verify run itself, and the
    * oracle re-derives the surviving range's aggregate — a skip that
    * was not conservative (a lost row) breaks the hash. */
  def dsv2Skipping(spark: SparkSession, dir: String): DataFrame = {
    Engine.tune(spark)
    val cat = ensureCatalog(spark)
    spark.sql(
      s"CREATE TABLE IF NOT EXISTS $cat.skip (id BIGINT, bucket INT, score DOUBLE)")
    spark.sql(s"INSERT OVERWRITE TABLE $cat.skip ${rowsSql(0L, 3000L)}")
    spark.sql(s"INSERT INTO $cat.skip ${rowsSql(3000L, 6000L)}")
    spark.sql(s"INSERT INTO $cat.skip ${rowsSql(6000L, 9000L)}")
    spark.sql(s"INSERT INTO $cat.skip ${rowsSql(9000L, 12000L)}")
    val q = spark.sql(
      s"""SELECT bucket, count(*) AS cnt,
         |  CAST(sum(CAST(score AS DECIMAL(18,6))) AS DOUBLE) AS sum_score
         |FROM $cat.skip WHERE id >= 9000 GROUP BY bucket ORDER BY bucket""".stripMargin)
    val desc = q.queryExecution.executedPlan.toString
    val m = "files=(\\d+)/(\\d+)".r.findFirstMatchIn(desc).getOrElse(
      throw new IllegalStateException(s"no graft scan in plan:\n$desc"))
    val (live, total) = (m.group(1).toInt, m.group(2).toInt)
    require(live < total && live > 0,
      s"stats must prune the pre-9000 batches' files, scanned $live/$total")
    q
  }

  /** STATISTICS-DRIVEN BROADCAST off the catalog table: the scan reports
    * manifest-exact rows/bytes ([[SupportsReportStatistics]]), so a
    * 16-row graft dimension joined to a 100k-row derived fact is
    * broadcast WITHOUT a hint — the planning decision that separates a
    * shuffle-both-sides disaster from a map-side join at 100 TB. The
    * query REQUIRES BroadcastHashJoin in the executed plan; the oracle
    * re-derives the join arithmetic cross-engine. */
  def dsv2StatsJoin(spark: SparkSession, dir: String): DataFrame = {
    Engine.tune(spark)
    val cat = ensureCatalog(spark)
    spark.sql(s"CREATE TABLE IF NOT EXISTS $cat.dim16 (bucket INT, tier STRING)")
    spark.sql(
      s"""INSERT OVERWRITE TABLE $cat.dim16
         |SELECT CAST(id AS INT) AS bucket,
         |  CASE WHEN id < 4 THEN 'hot' WHEN id < 10 THEN 'warm' ELSE 'cold' END AS tier
         |FROM range(0, 16)""".stripMargin)
    val q = spark.sql(
      s"""SELECT d.tier, count(*) AS cnt,
         |  CAST(sum(CAST(f.score AS DECIMAL(18,6))) AS DOUBLE) AS sum_score
         |FROM (${rowsSql(0L, 100000L)}) f
         |JOIN $cat.dim16 d ON f.bucket = d.bucket
         |GROUP BY d.tier ORDER BY d.tier""".stripMargin)
    val plan = q.queryExecution.executedPlan.toString
    require(plan.contains("BroadcastHashJoin"),
      s"manifest statistics must drive an unhinted broadcast:\n$plan")
    q
  }

  /** SQL `UPDATE` on the catalog table (round 17 continuation — the
    * row-level-operation face): routed through
    * [[GraftRowLevelOperation]] as group-based COPY-ON-WRITE — the COW
    * scan's pushed predicate prunes clean files by manifest stats, Spark
    * rewrites the affected files' rows (matched rows updated, the rest
    * carried verbatim), and the commit swaps exactly those files out of
    * the manifest, refusing if another commit raced in. The oracle
    * re-derives the updated table from the range() arithmetic — one
    * row double-updated, missed, or lost breaks the hash. */
  def dsv2Update(spark: SparkSession, dir: String): DataFrame = {
    Engine.tune(spark)
    val cat = ensureCatalog(spark)
    spark.sql(
      s"CREATE TABLE IF NOT EXISTS $cat.upd (id BIGINT, bucket INT, score DOUBLE)")
    spark.sql(s"INSERT OVERWRITE TABLE $cat.upd ${rowsSql(0L, Dsv2WriteBase)}")
    spark.sql(s"INSERT INTO $cat.upd ${rowsSql(Dsv2WriteBase, Dsv2WriteBase + Dsv2WriteAppend)}")
    spark.sql(s"UPDATE $cat.upd SET score = score + 1.0 WHERE bucket = 3")
    spark.sql(
      s"""SELECT bucket, count(*) AS cnt,
         |  CAST(sum(CAST(score AS DECIMAL(18,6))) AS DOUBLE) AS sum_score
         |FROM $cat.upd GROUP BY bucket ORDER BY bucket""".stripMargin)
  }

  /** SQL `MERGE INTO` the catalog table — the upsert every incremental
    * pipeline lands on: a source overlapping half the table updates the
    * matched half (score doubles) and inserts the new half, through the
    * same group-based COW commit. The oracle re-derives the three id
    * regimes (untouched / updated / inserted) from range() arithmetic. */
  def dsv2Merge(spark: SparkSession, dir: String): DataFrame = {
    Engine.tune(spark)
    val cat = ensureCatalog(spark)
    spark.sql(
      s"CREATE TABLE IF NOT EXISTS $cat.mrg (id BIGINT, bucket INT, score DOUBLE)")
    spark.sql(s"INSERT OVERWRITE TABLE $cat.mrg ${rowsSql(0L, 12000L)}")
    val mdir = java.nio.file.Paths.get(catalogRoot, "mrg")
    val beforeMerge = GraftCatalog.currentManifest(mdir).map(_.file).toSet
    spark.sql(
      s"""MERGE INTO $cat.mrg t
         |USING (${rowsSql(6000L, 18000L)}) s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET score = t.score + s.score
         |WHEN NOT MATCHED THEN INSERT (id, bucket, score) VALUES (s.id, s.bucket, s.score)
         |""".stripMargin)
    // runtime group filtering must have carried the match-free sub-6000
    // files BY REFERENCE (no static predicate exists on a key-equality
    // MERGE — only the dynamic _file subquery can prune here)
    val carried = beforeMerge.intersect(
      GraftCatalog.currentManifest(mdir).map(_.file).toSet)
    require(carried.nonEmpty,
      "runtime group filtering must carry match-free files by reference")
    spark.sql(
      s"""SELECT bucket, count(*) AS cnt,
         |  CAST(sum(CAST(score AS DECIMAL(18,6))) AS DOUBLE) AS sum_score
         |FROM $cat.mrg GROUP BY bucket ORDER BY bucket""".stripMargin)
  }

  /** The `OPTIMIZE <catalog>.<table>` SQL VERB (round 17 continuation):
    * the same compaction [[dsv2Compact]] drives through the API, now as
    * a statement through the injected parser ([[graft.plans
    * .GraftSqlParser]] → [[graft.plans.OptimizeGraftTable]]) on an
    * extensions-enabled session — the maintenance verb a SQL-only user
    * runs. The command's result row is asserted (files_after == 1) and
    * the aggregate reads back through the compacted table under the
    * write-face oracle: content must be byte-identical to the
    * uncompacted table. */
  def dsv2Optimize(spark: SparkSession, dir: String): DataFrame = {
    val s = graft.queries.EventQueries.extensionSession(spark)
    Engine.tune(s)
    val cat = ensureCatalog(s)
    s.sql(
      s"CREATE TABLE IF NOT EXISTS $cat.opt (id BIGINT, bucket INT, score DOUBLE)")
    s.sql(s"INSERT OVERWRITE TABLE $cat.opt ${rowsSql(0L, Dsv2WriteBase)}")
    s.sql(s"INSERT INTO $cat.opt ${rowsSql(Dsv2WriteBase, Dsv2WriteBase + Dsv2WriteAppend)}")
    val r = s.sql(s"OPTIMIZE $cat.opt").head()
    require(r.getInt(2) == 1 && r.getLong(3) == Dsv2WriteBase + Dsv2WriteAppend,
      s"OPTIMIZE must compact to one file conserving rows, got $r")
    s.sql(
      s"""SELECT bucket, count(*) AS cnt,
         |  CAST(sum(CAST(score AS DECIMAL(18,6))) AS DOUBLE) AS sum_score
         |FROM $cat.opt GROUP BY bucket ORDER BY bucket""".stripMargin)
  }

  /** CLUSTERED REWRITE restores file skipping (the OPTIMIZE/ORDER BY
    * layout-management story): the insert SCATTERS ids by a modular
    * bijection (i·2654435761 mod 12000 — the multiplier is coprime to
    * 12000), so every writer task's contiguous i-range lands a file
    * spanning essentially the FULL id range and min/max skipping is
    * provably useless (the query asserts files=N/N on the range
    * predicate). One `INSERT OVERWRITE ... SELECT * FROM self ORDER BY
    * id` re-lands the same rows globally sorted (the scan reads its
    * planning-time manifest snapshot while the write stages new files —
    * snapshot isolation makes self-overwrite safe), after which each
    * file holds a contiguous id slice and the SAME predicate prunes
    * most files (asserted). The oracle gates the post-rewrite aggregate,
    * so a row lost or duplicated by the self-overwrite breaks the hash. */
  def dsv2Cluster(spark: SparkSession, dir: String): DataFrame = {
    Engine.tune(spark)
    val cat = ensureCatalog(spark)
    spark.sql(s"DROP TABLE IF EXISTS $cat.clus")
    spark.sql(s"CREATE TABLE $cat.clus (id BIGINT, bucket INT, score DOUBLE)")
    spark.sql(
      s"""INSERT INTO $cat.clus
         |SELECT id,
         |  CAST(id * 2654435761 % 2147483648 % 16 AS INT) AS bucket,
         |  CAST(id * 2654435761 % 2147483648 % 1000 AS DOUBLE) / 1000.0 AS score
         |FROM (SELECT (i * 2654435761) % 12000 AS id FROM range(0, 12000) t(i))""".stripMargin)
    def scanned(pred: String): (Int, Int) = {
      val plan = spark.sql(s"SELECT count(*) AS n FROM $cat.clus WHERE $pred")
        .queryExecution.executedPlan.toString
      val m = "files=(\\d+)/(\\d+)".r.findFirstMatchIn(plan).getOrElse(
        throw new IllegalStateException(s"no graft scan in plan:\n$plan"))
      (m.group(1).toInt, m.group(2).toInt)
    }
    val (preLive, preTotal) = scanned("id >= 9000")
    require(preLive == preTotal && preTotal >= 4,
      s"striped layout must defeat skipping, got $preLive/$preTotal")
    // explicit range repartition (AQE honors a user-specified partition
    // count; a bare global ORDER BY would be coalesced to one file at
    // this volume) + within-partition sort: each rewritten file holds a
    // contiguous, disjoint id slice
    spark.sql(
      s"""INSERT OVERWRITE TABLE $cat.clus
         |SELECT /*+ REPARTITION_BY_RANGE(8, id) */ id, bucket, score
         |FROM $cat.clus SORT BY id""".stripMargin)
    val (postLive, postTotal) = scanned("id >= 9000")
    require(postLive < postTotal && postLive > 0,
      s"sorted rewrite must restore skipping, got $postLive/$postTotal")
    spark.sql(
      s"""SELECT bucket, count(*) AS cnt,
         |  CAST(sum(CAST(score AS DECIMAL(18,6))) AS DOUBLE) AS sum_score
         |FROM $cat.clus WHERE id >= 9000 GROUP BY bucket ORDER BY bucket""".stripMargin)
  }

  /** SCHEMA EVOLUTION on the catalog table: `ALTER TABLE ADD COLUMN`
    * widens the schema WITHOUT touching a data file — each manifest
    * entry records its write-time width, readers null-fill the evolved
    * tail of pre-ALTER files. The aggregate separates the two eras
    * (count(score) counts only post-ALTER rows); the oracle re-derives
    * both eras from range() arithmetic with NULL for the old era. The
    * table is dropped and re-created each run because a second ALTER of
    * the same name must fail loudly (duplicate column). */
  def dsv2Evolve(spark: SparkSession, dir: String): DataFrame = {
    Engine.tune(spark)
    val cat = ensureCatalog(spark)
    spark.sql(s"DROP TABLE IF EXISTS $cat.ev")
    spark.sql(s"CREATE TABLE $cat.ev (id BIGINT, bucket INT)")
    spark.sql(
      s"""INSERT INTO $cat.ev
         |SELECT id, CAST(id * 2654435761 % 2147483648 % 16 AS INT) AS bucket
         |FROM range(0, 6000)""".stripMargin)
    spark.sql(s"ALTER TABLE $cat.ev ADD COLUMN score DOUBLE")
    spark.sql(s"INSERT INTO $cat.ev ${rowsSql(6000L, 12000L)}")
    spark.sql(
      s"""SELECT bucket, count(*) AS cnt, count(score) AS cnt_scored,
         |  CAST(sum(CAST(coalesce(score, 0.0) AS DECIMAL(18,6))) AS DOUBLE) AS sum_score
         |FROM $cat.ev GROUP BY bucket ORDER BY bucket""".stripMargin)
  }

  /** CHANGE DATA FEED over the catalog table (round 17 continuation IV —
    * the CDC face every table format grows): a scripted lifecycle lands
    * one commit of every mutating kind — load (INSERT OVERWRITE), SQL
    * UPDATE, SQL DELETE, append, then OPTIMIZE-compaction — and the feed
    * ([[GraftChangeFeed]]) is read back as MINIMAL NET CHANGES over the
    * post-load range: the update surfaces as paired
    * `update_preimage`/`update_postimage` rows for EXACTLY the matched
    * rows (the rewritten files' carried rows cancel in the net
    * reduction), the delete as `delete` rows for exactly the matched
    * rows, the append as `insert` rows, and the compaction as NOTHING
    * (data-change-false — an OPTIMIZE must not replay the table to
    * consumers; asserted in-query, as is the kind ledger on the
    * history). The feed is COMPUTED from manifest diffs at
    * O(files-the-commits-rewrote) cost — never stored, never O(table).
    * The oracle re-derives every change class from the range()
    * arithmetic — one phantom change, lost change, or mislabeled image
    * breaks the hash. */
  def dsv2Changes(spark: SparkSession, dir: String): DataFrame = {
    Engine.tune(spark)
    val cat = ensureCatalog(spark)
    spark.sql(s"DROP TABLE IF EXISTS $cat.cdc")
    spark.sql(s"CREATE TABLE $cat.cdc (id BIGINT, bucket INT, score DOUBLE)")
    spark.sql(s"INSERT OVERWRITE TABLE $cat.cdc ${rowsSql(0L, 12000L)}") // seq 1
    spark.sql(s"UPDATE $cat.cdc SET score = score + 1.0 WHERE bucket = 3") // 2
    spark.sql(s"DELETE FROM $cat.cdc WHERE bucket = 5") // 3
    spark.sql(s"INSERT INTO $cat.cdc ${rowsSql(12000L, 14000L)}") // 4
    val tdir = java.nio.file.Paths.get(catalogRoot, "cdc")
    val compactSeq = GraftCatalog.compact(tdir) // 5
    require(compactSeq == 5L,
      s"lifecycle must land 5 commits, pointer is at $compactSeq")
    val kinds = GraftCatalog.describeHistory(tdir).sortBy(_.seq).flatMap(_.kind)
    require(kinds == Seq(GraftCatalog.Kind.Truncate, GraftCatalog.Kind.Update,
        GraftCatalog.Kind.Delete, GraftCatalog.Kind.Append,
        GraftCatalog.Kind.Compact),
      s"commit kinds mis-stamped on the history: $kinds")
    val net = GraftChangeFeed.net(spark, tdir.toString,
      fromSeq = 1L, toSeq = compactSeq)
    require(net.where(col(GraftChangeFeed.CommitSeqCol) === compactSeq)
        .limit(1).count() == 0L,
      "OPTIMIZE must be invisible to the change feed (data-change-false)")
    net.select(col(GraftChangeFeed.ChangeTypeCol).as("change_type"),
        col("bucket"), col("score"))
      .groupBy("change_type", "bucket")
      .agg(count(lit(1)).as("cnt"),
        sum(col("score").cast("decimal(18,6)")).cast("double").as("sum_score"))
      .orderBy("change_type", "bucket")
  }

  /** WRITE-TIME CONTRACTS on the catalog table (round 17 continuation V
    * — the data-quality face every table format grows): CHECK
    * constraints live as `graft.check.*` TBLPROPERTIES
    * ([[GraftConstraints]]) and are enforced ON EVERY COMMIT with the
    * format's own statistics — a staged file whose min/max/nullCount
    * prove the predicate passes with zero extra reads; only unprovable
    * files are scanned. The query scripts the contract end to end: a
    * violating INSERT and a violating UPDATE both FAIL ATOMICALLY
    * (loudly naming the constraint; history length and content
    * unchanged — asserted in-query), then a conforming UPDATE lands,
    * and the read-back aggregate must hash-match the oracle's
    * re-derivation — a leaked violating row, a lost conforming one, or
    * a constraint that silently stopped enforcing all break the gate. */
  def dsv2Constraint(spark: SparkSession, dir: String): DataFrame = {
    Engine.tune(spark)
    val cat = ensureCatalog(spark)
    def failsNaming(name: String)(sql: String): Unit = {
      val named =
        try { spark.sql(sql); false }
        catch {
          case e: Throwable =>
            Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
              .exists(t => Option(t.getMessage).exists(_.contains(name)))
        }
      require(named, s"statement must fail naming constraint '$name': $sql")
    }
    spark.sql(s"DROP TABLE IF EXISTS $cat.cons")
    spark.sql(
      s"""CREATE TABLE $cat.cons (id BIGINT NOT NULL, bucket INT, score DOUBLE)
         |TBLPROPERTIES ('graft.check.score_range' = 'score >= 0.0 AND score < 3.0',
         |  'graft.check.bucket_pos' = 'bucket >= 0')""".stripMargin)
    spark.sql(s"INSERT OVERWRITE TABLE $cat.cons ${rowsSql(0L, 12000L)}")
    val tdir = java.nio.file.Paths.get(catalogRoot, "cons")
    val before = GraftCatalog.describeHistory(tdir).size
    // scores land in [0, 1): a +9 update or a 5.0 insert breaks the cap
    failsNaming("score_range")(s"INSERT INTO $cat.cons VALUES (99999, 1, 5.0)")
    failsNaming("score_range")(
      s"UPDATE $cat.cons SET score = score + 9.0 WHERE bucket = 3")
    require(GraftCatalog.describeHistory(tdir).size == before,
      "failed commits must publish no version")
    // the conforming update lands (bucket-3 scores move to [1, 2))
    spark.sql(s"UPDATE $cat.cons SET score = score + 1.0 WHERE bucket = 3")
    spark.sql(
      s"""SELECT bucket, count(*) AS cnt,
         |  CAST(sum(CAST(score AS DECIMAL(18,6))) AS DOUBLE) AS sum_score
         |FROM $cat.cons GROUP BY bucket ORDER BY bucket""".stripMargin)
  }

  /** DELETION-VECTOR deletes (round 17 continuation VI — merge-on-read,
    * the design Delta/Iceberg grew because COW prices small deletes at
    * O(file) writes): with `graft.delete.mode` = `dv`, a DELETE writes a
    * per-file mask of row ordinals instead of rewriting data files —
    * cost O(matched rows), ZERO data-file writes (file names asserted
    * unchanged in-query). A second DELETE unions into a fresh immutable
    * DV (each version pins its exact mask, so time travel is free);
    * readers pay one forward cursor per file; OPTIMIZE materializes the
    * masks away (asserted: one file, no DV, live rows conserved). The
    * final aggregate reads the materialized table under the range()
    * oracle — a resurrected masked row, a lost survivor, or a
    * mis-unioned mask all break the hash. */
  def dsv2DvDelete(spark: SparkSession, dir: String): DataFrame = {
    Engine.tune(spark)
    val cat = ensureCatalog(spark)
    spark.sql(s"DROP TABLE IF EXISTS $cat.dv")
    spark.sql(
      s"""CREATE TABLE $cat.dv (id BIGINT, bucket INT, score DOUBLE)
         |TBLPROPERTIES ('graft.delete.mode' = 'dv')""".stripMargin)
    // 4 pinned slices ⇒ 3000-row files: the two range deletes (1000 +
    // 500 ids) can never fully mask a file, so the fileset-equality
    // assertion below holds at ANY core count (the driver benches this
    // at several) — see rowsSql's slices note
    spark.sql(s"INSERT OVERWRITE TABLE $cat.dv ${rowsSql(0L, 12000L, slices = 4)}")
    val tdir = java.nio.file.Paths.get(catalogRoot, "dv")
    val before = GraftCatalog.currentManifest(tdir).map(_.file).toSet
    spark.sql(s"DELETE FROM $cat.dv WHERE id >= 4000 AND id < 5000")
    spark.sql(s"DELETE FROM $cat.dv WHERE id >= 9000 AND id < 9500")
    val m = GraftCatalog.currentManifest(tdir)
    require(m.map(_.file).toSet == before,
      "dv deletes must not rewrite or drop any data file here")
    require(m.map(_.rows).sum == 12000L && m.map(_.liveRows).sum == 10500L,
      s"mask accounting broken: ${m.map(_.rows).sum} physical, " +
        s"${m.map(_.liveRows).sum} live")
    GraftCatalog.compact(tdir)
    val after = GraftCatalog.currentManifest(tdir)
    require(after.size == 1 && after.forall(_.dv.isEmpty) &&
      after.head.rows == 10500L,
      s"OPTIMIZE must materialize the masks away, got $after")
    spark.sql(
      s"""SELECT bucket, count(*) AS cnt,
         |  CAST(sum(CAST(score AS DECIMAL(18,6))) AS DOUBLE) AS sum_score
         |FROM $cat.dv GROUP BY bucket ORDER BY bucket""".stripMargin)
  }

  /** The change feed over DV deletes: a mask-only commit's change set is
    * read in DELTA mode — exactly the ordinals this commit masked, one
    * pass of the masked file, no diffing of survivors (they were never
    * rewritten). The second delete's delta must exclude the first's
    * rows; the oracle re-derives both deleted ranges per bucket. */
  def dsv2DvChanges(spark: SparkSession, dir: String): DataFrame = {
    Engine.tune(spark)
    val cat = ensureCatalog(spark)
    spark.sql(s"DROP TABLE IF EXISTS $cat.dvc")
    spark.sql(
      s"""CREATE TABLE $cat.dvc (id BIGINT, bucket INT, score DOUBLE)
         |TBLPROPERTIES ('graft.delete.mode' = 'dv')""".stripMargin)
    spark.sql(s"INSERT OVERWRITE TABLE $cat.dvc ${rowsSql(0L, 12000L)}") // 1
    spark.sql(s"DELETE FROM $cat.dvc WHERE id >= 4000 AND id < 5000") // 2
    spark.sql(s"DELETE FROM $cat.dvc WHERE id >= 4500 AND id < 6000") // 3
    val tdir = java.nio.file.Paths.get(catalogRoot, "dvc")
    val net = GraftChangeFeed.net(spark, tdir.toString, 1L, 3L)
    net.select(col(GraftChangeFeed.ChangeTypeCol).as("change_type"),
        col(GraftChangeFeed.CommitSeqCol).as("seq"),
        col("bucket"), col("score"))
      .groupBy("change_type", "seq", "bucket")
      .agg(count(lit(1)).as("cnt"),
        sum(col("score").cast("decimal(18,6)")).cast("double").as("sum_score"))
      .orderBy("change_type", "seq", "bucket")
  }

  /** `OPTIMIZE ... ZORDER BY` (round 17 continuation VI): the
    * single-key clustered rewrite ([[dsv2Cluster]]) cannot serve TWO
    * query dimensions at once — sorting by `id` destroys any `score`
    * locality. The z-order verb rewrites the table along the
    * interleaved-bit curve over per-column QUANTILE buckets, so every
    * output file covers a tight range in BOTH dimensions and the
    * manifest stats prune on either predicate or their conjunction.
    * The query proves all three pruning regimes in-plan (scattered
    * layout: 0 pruning; post-ZORDER: each single-dim predicate prunes,
    * the 2-dim box prunes hardest) and reads the box aggregate back
    * under the range() oracle — the rewrite is content-identical, so
    * one lost or duplicated row breaks the hash. */
  def dsv2Zorder(spark: SparkSession, dir: String): DataFrame = {
    val s = graft.queries.EventQueries.extensionSession(spark)
    Engine.tune(s)
    val cat = ensureCatalog(s)
    s.sql(s"DROP TABLE IF EXISTS $cat.zo")
    s.sql(s"CREATE TABLE $cat.zo (id BIGINT, bucket INT, score DOUBLE)")
    // modular-bijection scatter: every writer task's file spans
    // essentially the full id AND score ranges — min/max useless
    s.sql(
      s"""INSERT INTO $cat.zo
         |SELECT id,
         |  CAST(id * 2654435761 % 2147483648 % 16 AS INT) AS bucket,
         |  CAST(id * 2654435761 % 2147483648 % 1000 AS DOUBLE) / 1000.0 AS score
         |FROM (SELECT (i * 2654435761) % 12000 AS id FROM range(0, 12000) t(i))""".stripMargin)
    def live(pred: String): (Int, Int) = {
      val plan = s.sql(s"SELECT count(*) AS n FROM $cat.zo WHERE $pred")
        .queryExecution.executedPlan.toString
      val m = "files=(\\d+)/(\\d+)".r.findFirstMatchIn(plan).getOrElse(
        throw new IllegalStateException(s"no graft scan in plan:\n$plan"))
      (m.group(1).toInt, m.group(2).toInt)
    }
    val box = "id >= 9000 AND score < 0.1"
    val (preLive, preTotal) = live(box)
    require(preLive == preTotal && preTotal >= 4,
      s"scattered layout must defeat skipping, got $preLive/$preTotal")
    val r = s.sql(s"OPTIMIZE $cat.zo ZORDER BY (id, score)").head()
    require(r.getInt(2) == 16 && r.getLong(3) == 12000L,
      s"ZORDER must rewrite into 16 files conserving rows, got $r")
    val (idLive, t1) = live("id >= 9000")
    val (scLive, t2) = live("score < 0.1")
    val (boxLive, t3) = live(box)
    require(t1 == 16 && idLive > 0 && idLive < 16,
      s"z-order must prune on the id dimension, got $idLive/$t1")
    require(scLive > 0 && scLive < 16,
      s"z-order must prune on the score dimension, got $scLive/$t2")
    require(boxLive > 0 && boxLive <= math.min(idLive, scLive),
      s"the 2-dim box must prune hardest: $boxLive vs $idLive/$scLive")
    s.sql(
      s"""SELECT bucket, count(*) AS cnt,
         |  CAST(sum(CAST(score AS DECIMAL(18,6))) AS DOUBLE) AS sum_score
         |FROM $cat.zo WHERE $box GROUP BY bucket ORDER BY bucket""".stripMargin)
  }

  /** Writes documents hive-partitioned by `lang` once per dir (marker
    * guarded, like [[materialize]]) — the layout a curation pipeline
    * lands its output in so downstream jobs prune whole partitions. */
  private def materializePartitioned(spark: SparkSession, dir: String): String =
    materialized.getOrElseUpdate(s"$dir#part", {
      buildOnce(s"/tmp/graft-src-part-${sfTag(dir)}") { tmp =>
        Tables(spark, dir, "documents").write.mode("overwrite")
          .partitionBy("lang").parquet(tmp)
      }
    })

  /** Partitioned-layout round-trip: write documents partitioned by lang,
    * read back with a partition-key filter, aggregate. The filter must
    * resolve at PLANNING time against the directory structure — the scan
    * lists and reads ONLY `lang=en/` (PartitionFilters in the plan; files
    * asserted in PartitionPruningSpec), which at 100 TB is the difference
    * between reading one language's slice and the whole corpus. The
    * oracle aggregates the unpartitioned original, so partition-column
    * extraction fidelity is under the hash too. */
  def partitionedScan(spark: SparkSession, dir: String): DataFrame = {
    Engine.tune(spark)
    spark.read.parquet(materializePartitioned(spark, dir))
      .filter(col("lang") === "en")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
      .orderBy("source")
  }

  /** Tiny lang→tier dimension, written to parquet once per dir: dynamic
    * partition pruning only fires against a FILE relation (a local
    * in-memory dim folds to a static filter at optimization time, which
    * would demonstrate nothing). */
  private def materializeLangDim(spark: SparkSession, dir: String): String =
    materialized.getOrElseUpdate(s"$dir#langdim", {
      buildOnce(s"/tmp/graft-src-langdim-${sfTag(dir)}") { tmp =>
        Tables(spark, dir, "documents").select(col("lang")).distinct()
          .withColumn("tier",
            when(col("lang").isin("en", "zh"), "major").otherwise("minor"))
          .coalesce(1).write.mode("overwrite").parquet(tmp)
      }
    })

  /** Dynamic partition pruning: the lang-partitioned fact joined to a
    * filtered tiny dimension ON THE PARTITION COLUMN. The dim filter
    * (`tier = 'major'`) is not a literal predicate on the fact, so static
    * pruning can't help — instead Catalyst injects a dynamicpruning#
    * subquery into the fact scan's PartitionFilters (reusing the dim's
    * broadcast), and the scan lists only the partitions the dim survives
    * with. At 100 TB this is THE mechanism that keeps star-schema joins
    * from reading every fact partition when the selective predicate
    * lives on the dimension side ([[partitionedScan]] covers the static
    * half). Plan-asserted in PartitionPruningSpec. */
  def dppJoin(spark: SparkSession, dir: String): DataFrame = {
    Engine.tune(spark)
    val fact = spark.read.parquet(materializePartitioned(spark, dir))
    val dim = spark.read.parquet(materializeLangDim(spark, dir))
      .filter(col("tier") === "major")
    fact.join(dim, Seq("lang"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
      .orderBy("lang")
  }

  /** Two document batches with DRIFTED schemas, written once per dir:
    * the early batch (even doc_ids) predates the `source` column, the
    * later batch (odd doc_ids) carries it — the schema-evolution shape
    * every long-lived ingest dataset develops. */
  private def materializeEvolved(spark: SparkSession, dir: String): String =
    materialized.getOrElseUpdate(s"$dir#evolve", {
      buildOnce(s"/tmp/graft-src-evolve-${sfTag(dir)}") { tmp =>
        val docs = Tables(spark, dir, "documents")
        docs.filter(col("doc_id") % 2 === 0)
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .write.mode("overwrite").parquet(s"$tmp/b1")
        docs.filter(col("doc_id") % 2 === 1)
          .select(col("doc_id"), col("lang"), col("n_chars"), col("source"))
          .write.mode("overwrite").parquet(s"$tmp/b2")
      }
    })

  /** Schema-evolution read: `mergeSchema=true` unions the two batches'
    * footers into one schema, with the pre-drift batch's missing
    * `source` read as NULL — no rewrite of old data. The oracle derives
    * the same view from the unpartitioned original (even doc_ids have
    * no source), so both the merge and the null-fill are under the
    * hash. Scale note: footer-merge costs one footer read per file at
    * planning; a 100 TB deployment pins the merged schema in a
    * metastore instead and this plan is unchanged — the capability
    * under test is reading heterogeneous-schema data without a
    * backfill. */
  def schemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    Engine.tune(spark)
    val out = materializeEvolved(spark, dir)
    // both batch roots listed explicitly (they are sibling datasets, not
    // key=value partitions, so directory recursion would not find them)
    spark.read.option("mergeSchema", "true")
      .parquet(s"$out/b1", s"$out/b2")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        count(col("source")).as("n_with_source"),
        sum("n_chars").as("sum_chars"))
      .orderBy("lang")
  }

  /** Bucket count of the co-located join layout — small at fixture scale;
    * at 100 TB the same layout runs with O(cluster cores) buckets. */
  val JoinBuckets = 8

  private val bucketedTables = TrieMap.empty[String, (String, String)]

  /** Writes orders and lineitem bucketed AND per-bucket-sorted by the
    * join key, once per (session, dir) — the layout cost a warehouse
    * pays at ingest so every subsequent join on that key is
    * exchange-free. saveAsTable is required (bucket metadata lives in
    * the catalog, not the files); the data lands in a TempDirs-managed
    * external location, never the repo's default warehouse. */
  private def materializeBucketed(spark: SparkSession, dir: String): (String, String) =
    bucketedTables.getOrElseUpdate(dir, {
      val tag = sfTag(dir).replace('.', '_')
      val base = TempDirs.create("graft-src-bucketed").toString
      val ot = s"graft_orders_b_$tag"
      val lt = s"graft_lineitem_b_$tag"
      Tables(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"))
        .write.mode("overwrite").option("path", s"$base/orders")
        .bucketBy(JoinBuckets, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(ot)
      Tables(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"))
        .write.mode("overwrite").option("path", s"$base/lineitem")
        .bucketBy(JoinBuckets, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(lt)
      (ot, lt)
    })

  /** Co-located bucketed join: both sides pre-bucketed on the join key,
    * so the sort-merge join plans ZERO exchanges — the join reads each
    * bucket pair directly (asserted in FormatsSpec; an unbucketed run of
    * the same join shuffles both sides). The merge hint pins the
    * sort-merge strategy at every SF so the demonstrated plan shape is
    * the fact-fact one (at 100 TB neither side broadcasts anyway);
    * results are hint-independent. sum(l_quantity) is exact — the
    * fixture quantities are integral doubles, closed under addition. */
  def bucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    Engine.tune(spark)
    val (ot, lt) = materializeBucketed(spark, dir)
    spark.table(ot).hint("merge")
      .join(spark.table(lt), col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_quantity")).cast("long").as("sum_qty"))
      .orderBy("o_orderpriority")
  }

  /** Runtime bloom-filter join pruning — the ROW-level sibling of
    * [[dppJoin]]'s partition-level pruning, completing the pruning
    * quartet (static partition filter → bucketed co-location → dynamic
    * partition pruning → runtime row filter). A selective dimension
    * predicate (`o_orderpriority IN ('1-URGENT','2-HIGH')`) joins the
    * fact on a non-partition key, so neither static nor dynamic
    * PARTITION pruning can help; instead Catalyst's InjectRuntimeFilter
    * builds a bloom filter of the dim's surviving join keys and plants
    * `might_contain(xxhash64(l_orderkey))` into the FACT scan's
    * post-scan filter, dropping non-matching rows BEFORE the join
    * exchange instead of after it. The rule declines joins whose dim is
    * broadcastable BY SIZE (a broadcast join already prunes at the hash
    * table; the merge hint changes the executed strategy but not that
    * size judgement), so at fixture scale the registered run executes a
    * hinted sort-merge join with NO injection (hash-gated for
    * correctness), and RuntimeFilterSpec re-plans this exact DataFrame
    * under the cluster posture (broadcast off, zero application-side
    * floor — the sizes a 100 TB fact forces) and asserts both the
    * injected filter and result parity. The merge hint pins the
    * shuffle-join execution shape the mechanism exists for. */
  def runtimeFilterJoin(spark: SparkSession, dir: String): DataFrame = {
    Engine.tune(spark)
    val dim = Tables(spark, dir, "orders")
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .select(col("o_orderkey"), col("o_orderpriority"))
      .hint("merge")
    val fact = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_quantity")).cast("long").as("sum_qty"))
      .orderBy("o_orderpriority")
  }

  /** Malformed-ingest fixture geometry: every [[MalformedEvery]]-th of
    * [[MalformedRows]] CSV lines carries unparseable numerics. */
  val MalformedRows = 1000
  val MalformedEvery = 7

  /** Writes the deterministic good/bad CSV once per dir (the content is
    * dir-independent arithmetic, like [[dsv2Scan]]'s connector rows). */
  private def materializeMalformed(spark: SparkSession, dir: String): String =
    materialized.getOrElseUpdate(s"$dir#malformed", {
      buildOnce(s"/tmp/graft-src-malformed-${sfTag(dir)}") { tmp =>
        new File(tmp).mkdirs()
        val lines = (0 until MalformedRows).map { i =>
          if (i % MalformedEvery == 0) s"x$i,t$i,notanumber"
          else s"$i,t$i,${i * 3L}"
        }
        java.nio.file.Files.write(
          java.nio.file.Paths.get(tmp, "data.csv"),
          scala.jdk.CollectionConverters.SeqHasAsJava(lines).asJava)
      }
    })

  /** PERMISSIVE-mode malformed-record accounting — the ingest posture a
    * crawler-fed pipeline needs: rows whose numerics fail to parse are
    * QUARANTINED into `_corrupt_record` (the job survives; the damage is
    * exactly countable) instead of killing the read (FAILFAST's job,
    * exercised in CorruptInputSpec) or vanishing silently (DROPMALFORMED,
    * the one mode a lineage-audited pipeline cannot use). The oracle
    * re-derives every count arithmetically from the synthesis rule, so
    * the quarantine boundary itself is under the cross-engine hash. The
    * cache respects Spark's single-pass corrupt-record semantics
    * (referencing `_corrupt_record` requires the parsed rows to be
    * materialized, not re-read per subexpression). */
  def csvMalformed(spark: SparkSession, dir: String): DataFrame = {
    Engine.tune(spark)
    val schema = "id LONG, tag STRING, val LONG, _corrupt_record STRING"
    spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(materializeMalformed(spark, dir))
      .cache()
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("_corrupt_record").isNull, 1L).otherwise(0L)).as("n_good"),
        sum(when(col("_corrupt_record").isNotNull, 1L).otherwise(0L)).as("n_bad"),
        sum(when(col("_corrupt_record").isNull, col("val")).otherwise(0L)).as("sum_val"))
  }

  /** The NDJSON sibling of [[materializeMalformed]]: every
    * [[MalformedEvery]]-th line is TRUNCATED mid-object (the crawler
    * failure mode JSON actually exhibits — a connection cut, not a bad
    * numeric). Same arithmetic content, so the oracle is shared-shape. */
  private def materializeMalformedJson(spark: SparkSession, dir: String): String =
    materialized.getOrElseUpdate(s"$dir#malformedjson", {
      buildOnce(s"/tmp/graft-src-malformedjson-${sfTag(dir)}") { tmp =>
        new File(tmp).mkdirs()
        val lines = (0 until MalformedRows).map { i =>
          if (i % MalformedEvery == 0) s"""{"id": $i, "tag": "t$i", "va"""
          else s"""{"id": $i, "tag": "t$i", "val": ${i * 3L}}"""
        }
        java.nio.file.Files.write(
          java.nio.file.Paths.get(tmp, "data.json"),
          scala.jdk.CollectionConverters.SeqHasAsJava(lines).asJava)
      }
    })

  /** [[csvMalformed]]'s JSON twin: PERMISSIVE NDJSON ingestion with
    * truncated-object quarantine — the same accounting contract over
    * the format whose corruption mode is structural (cut-off objects)
    * rather than value-level. */
  def jsonMalformed(spark: SparkSession, dir: String): DataFrame = {
    Engine.tune(spark)
    val schema = "id LONG, tag STRING, val LONG, _corrupt_record STRING"
    spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(materializeMalformedJson(spark, dir))
      .cache()
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("_corrupt_record").isNull, 1L).otherwise(0L)).as("n_good"),
        sum(when(col("_corrupt_record").isNotNull, 1L).otherwise(0L)).as("n_bad"),
        sum(when(col("_corrupt_record").isNull, col("val")).otherwise(0L)).as("sum_val"))
  }

  /** Writes the document texts as raw line-oriented text once per dir
    * (marker guarded) — the rawest ingestion format an LLM corpus
    * arrives in: one document per line, no schema, no column structure.
    * The fixture texts carry no embedded newlines (asserted in
    * FormatsSpec), so lines round-trip 1:1 with documents. */
  private def materializeText(spark: SparkSession, dir: String): String =
    materialized.getOrElseUpdate(s"$dir#text", {
      buildOnce(s"/tmp/graft-src-text-${sfTag(dir)}") { tmp =>
        Tables(spark, dir, "documents").select(col("text"))
          .write.mode("overwrite").text(tmp)
      }
    })

  /** Raw-text round-trip: `spark.read.text` over the one-doc-per-line
    * dump, then a per-line-length histogram-style aggregate that the
    * oracle reproduces from the parquet originals. Text files split on
    * line boundaries, so the scan parallelizes like the CSV variant;
    * this is the path a from-scratch corpus build starts from. */
  def textRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    Engine.tune(spark)
    spark.read.text(materializeText(spark, dir))
      .select(length(col("value")).as("len"))
      .groupBy((col("len") / 100).cast("long").as("len_bucket"))
      .agg(count(lit(1)).as("n_lines"), sum(col("len")).as("char_sum"))
      .orderBy("len_bucket")
  }

  /** Compaction target file size. 8 MiB keeps the sf0.1 copy at a few
    * files and the small SFs at one; a production lake would set
    * 128 MiB–1 GiB — the budget is the knob, the mechanism is
    * identical. */
  val TargetFileBytes: Long = 8L << 20

  /** Fragments documents into 64 small files, then compacts by size
    * budget. Round 15 (VERDICT r14 #5): BOTH layouts land through
    * `IndexStore.commit` — compaction was the one layout-rewriting
    * operation not behind the snapshot protocol, so a concurrent reader
    * could catch a half-compacted directory under a bare marker, and the
    * rewrite was invisible to time travel. Now the fragmented layout is
    * version v1 and the compacted rewrite is version v2 with v1 as its
    * `_GRAFT_PREV`: readers resolve one complete immutable version
    * (either pre- or post-compaction, never a mixture), and
    * `previousVersion` time-travels to the pre-compaction layout — the
    * audit read a table format's OPTIMIZE keeps. Idempotent per sf dir:
    * a current version tagged `compacted` with its predecessor on disk
    * is recognized and reused, so the rewrite cost is paid once.
    * Returns (fragmented, compacted) version paths so the spec can
    * assert the file-count reduction and the lineage. */
  /** Test hook: drop the per-JVM memo for `dir`'s compaction so a spec
    * can force the commit path to re-run (the IndexStore reuse check
    * still applies — wipe the artifact too to force a real rewrite). */
  private[graft] def resetCompactionFor(dir: String): Unit =
    materialized.remove(s"$dir#compact")

  /** Test hook: drop the per-JVM layout memos for `dir` so a spec can
    * simulate a fresh process rebuilding a wiped physical layout. */
  private[graft] def resetLayoutsFor(dir: String): Unit = {
    materialized.remove(s"$dir#zlayout")
    materialized.remove(s"$dir#hlayout")
  }

  /** The sf-scoped commit-managed artifact name of `dir`'s compaction
    * lineage — exposed so specs assert against the exact name. */
  private[graft] def compactionName(dir: String): String =
    s"compact_docs_${sfTag(dir)}"

  def compactionDirs(spark: SparkSession, dir: String): (String, String) = {
    import graft.similarity.IndexStore
    val name = compactionName(dir)
    val pair = materialized.getOrElseUpdate(s"$dir#compact", {
      val reuse = for {
        cur <- IndexStore.currentVersion(name)
        if IndexStore.currentTag(name).contains("compacted")
        prev <- IndexStore.previousVersion(name)
      } yield (prev.toString, cur.toString)
      val (frag, out) = reuse.getOrElse {
        // same fail-fast as snapshotHistory (ADVICE r15): a published-but-
        // intermediate state (crashed lineage) must not trigger a commit
        // storm under nonPublishing — that swaps the pointer under any
        // concurrent session, the churn the mode exists to prevent
        if (IndexStore.nonPublishingActive && IndexStore.currentVersion(name).isDefined)
          throw new IllegalStateException(
            s"'$name' is published but not in the 'compacted' state " +
              "(crashed lineage?) — refusing to re-commit under nonPublishing")
        val fragPath = IndexStore.commit(name, "fragmented")(
          Tables(spark, dir, "documents").repartition(64))
        val bytes = Option(fragPath.toFile.listFiles()).getOrElse(Array.empty)
          .filter(_.getName.startsWith("part-")).map(_.length).sum
        val nOut = math.max(1L, (bytes + TargetFileBytes - 1) / TargetFileBytes).toInt
        // coalesce, not repartition: compaction reads many splits and
        // writes few without a shuffle
        val outPath = IndexStore.commit(name, "compacted")(
          spark.read.parquet(fragPath.toString).coalesce(nOut))
        (fragPath.toString, outPath.toString)
      }
      s"$frag\n$out"
    }).split('\n')
    (pair(0), pair(1))
  }

  /** Small-file compaction (the OPTIMIZE pass): documents first
    * fragmented into 64 tiny files — the pathological layout streaming
    * ingest leaves behind — then rewritten into size-budgeted files via
    * `coalesce` (a shuffle-free rewrite: compaction reads many splits
    * and writes few, it never needs a repartition unless re-clustering
    * is requested). At 100 TB this pass is what keeps scan task counts
    * and NameNode/object-store listings sane. The registered result is
    * the content census of the COMPACTED copy against the
    * original-table oracle, so row fidelity of the rewrite is under the
    * hash; the ≥8× file-count reduction itself is asserted in
    * FormatsSpec. */
  def compaction(spark: SparkSession, dir: String): DataFrame = {
    Engine.tune(spark)
    val (_, out) = compactionDirs(spark, dir)
    spark.read.parquet(out)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").as("sum_chars"),
        countDistinct("doc_id").as("n_ids"))
      .orderBy("source")
  }

  /** The deterministic right-to-be-forgotten set: every 97th user. A
    * real request list arrives as a table; the modulus stands in so the
    * DuckDB oracle re-derives the set exactly. */
  val ForgetModulus = 97L

  /** DELETE PROPAGATION through the snapshot protocol (round 15
    * superset — the GDPR / right-to-be-forgotten shape every lakehouse
    * runs): the keyed event projection is committed as version `full`,
    * then the forget-set's rows are removed by ANTI-JOIN rewrite and
    * the result committed as version `forgotten` with `full` as its
    * `_GRAFT_PREV`. Readers racing the delete resolve one complete
    * version (the snapshot guarantee); the registered census runs over
    * the CURRENT version, and its oracle recomputes from the base table
    * with the forget predicate — so a row that survived the delete, a
    * lost innocent row, or a census over the wrong version all
    * hash-mismatch. FormatsSpec pins the protocol half the oracle can't
    * see: zero forgotten users in current, the pre-delete version still
    * on the lineage for audit. COMPLIANCE NOTE (the part that matters
    * at 100 TB): the predecessor version IS the deletion's audit trail
    * and also still contains the data — production sets this name's GC
    * grace to the compliance window, after which the superseded full
    * version is collected and the deletion becomes physical; here the
    * default grace keeps it visible to the spec. The anti-join rewrite
    * is the whole-table spelling; a partitioned deployment prunes the
    * rewrite to the files whose stats overlap the forget keys (the
    * [[zorderSkipping]] manifest mechanism), which is exactly how
    * deletion vectors / OPTIMIZE-style rewrites bound the cost. */
  def forgetUser(spark: SparkSession, dir: String): DataFrame = {
    Engine.tune(spark)
    import graft.similarity.IndexStore
    val name = s"forget_events_${sfTag(dir)}"
    def events = Tables(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    val reuse = for {
      cur <- IndexStore.currentVersion(name)
      if IndexStore.currentTag(name).contains("forgotten")
      _ <- IndexStore.previousVersion(name)
    } yield cur
    val current = reuse.getOrElse {
      // fail-fast under the ledger, as snapshotHistory/compactionDirs do:
      // never swap a published pointer from a nonPublishing run
      if (IndexStore.nonPublishingActive && IndexStore.currentVersion(name).isDefined)
        throw new IllegalStateException(
          s"'$name' is published but not in the 'forgotten' state " +
            "(crashed lineage?) — refusing to re-commit under nonPublishing")
      val full = IndexStore.commit(name, "full")(events)
      // the forget list as a TABLE (the request shape), anti-joined —
      // never a NOT IN subquery that would re-scan per row
      val forget = events.select(col("user_id"))
        .filter(col("user_id") % ForgetModulus === 0).distinct()
      IndexStore.commit(name, "forgotten")(
        spark.read.parquet(full.toString)
          .join(broadcast(forget), Seq("user_id"), "left_anti"))
    }
    spark.read.parquet(current.toString)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_val"))
      .orderBy("event_type")
  }

  /** The pruned delete's forget range: the 1/32nd-of-key-space bucket
    * CONTAINING THE MAX USER (`(maxu*32) div (maxu+1)` — always
    * populated at every sf, unlike a fixed top bucket on the sf0.001
    * fixture's 15-user grid). A range, not a modulus, so it overlaps
    * exactly one of the 16 user-bucket files and the file-granular
    * prune has something to prove; both engines derive the same bucket
    * from the same extremum. */
  def forgetBucket32(maxu: Long): Long = maxu * 32 / (maxu + 1)

  /** FILE-GRANULAR copy-on-write DELETE (round 15 superset — the
    * production spelling [[forgetUser]]'s doc promises): the event
    * projection lives as 16 user-bucketed files; a forget request for a
    * user-id RANGE consults the bucket arithmetic (≙ the per-file stats
    * manifest) and REWRITES ONLY the one file whose range overlaps —
    * every other file is carried into the new layout by HARDLINK, the
    * local spelling of a table-format manifest that re-references the
    * previous version's unchanged data files. This is how a deletion at
    * 100 TB costs O(files containing the keys), not O(table): the
    * registered row reports (files_total, files_rewritten) next to the
    * post-delete census, the oracle re-derives all of it from the
    * bucket arithmetic and the forget predicate (rewriting one file too
    * many or too few hash-mismatches), and FormatsSpec pins the
    * physical claim the oracle can't see — untouched files in the new
    * layout are the SAME inodes as the old one's, and the rewritten
    * bucket holds exactly its kept rows. */
  def forgetPruned(spark: SparkSession, dir: String): DataFrame = {
    Engine.tune(spark)
    val maxu = Tables(spark, dir, "events")
      .agg(max("user_id")).collect()(0).getLong(0)
    val base = buildOnce(s"/tmp/graft-src-ufull-${sfTag(dir)}") { tmp =>
      Tables(spark, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        .withColumn("ub", expr(s"CAST((user_id * 16) div (${maxu + 1}L) AS INT)"))
        .repartition(col("ub"))
        .write.mode("overwrite").partitionBy("ub").parquet(tmp)
    }
    val fb32 = forgetBucket32(maxu)
    val forgetPred = s"(user_id * 32) div (${maxu + 1}L) = $fb32"
    // the per-chunk stats (the manifest): min/max user id per bucket
    // file, ONE metadata-sized pass — the rewrite decision is the same
    // monotone-bucket overlap test the skipping harnesses run, so a
    // chunk is rewritten iff its stats box can contain forget-range rows
    val stats = spark.read.parquet(base)
      .groupBy("ub").agg(min("user_id").as("lo"), max("user_id").as("hi"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    def overlaps(lo: Long, hi: Long): Boolean =
      hi * 32 / (maxu + 1) >= fb32 && lo * 32 / (maxu + 1) <= fb32
    val rewriteSet = stats.collect { case (b, lo, hi) if overlaps(lo, hi) => b }.toSet
    // the derived layout's path carries the BASE's build id (round 16,
    // ADVICE r15): uforgot hardlinks the base's part files, so a base
    // rebuild (same sf, new inodes) must invalidate it — a reused pruned
    // layout over a rebuilt base would keep hardlinks to orphaned inodes
    // and break the inode-identity property FormatsSpec pins
    val pruned = buildOnce(
        s"/tmp/graft-src-uforgot-${sfTag(dir)}-${buildId(base)}") { tmp =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(tmp))
      val chunks = Option(new File(base).listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith("ub=")).sortBy(_.getName)
      chunks.foreach { d =>
        val bucket = d.getName.stripPrefix("ub=").toInt
        val dst = java.nio.file.Paths.get(tmp, d.getName)
        if (rewriteSet.contains(bucket)) {
          spark.read.parquet(d.toString)
            .filter(expr(s"NOT ($forgetPred)"))
            .coalesce(1).write.mode("overwrite").parquet(dst.toString)
        } else {
          java.nio.file.Files.createDirectories(dst)
          Option(d.listFiles()).getOrElse(Array.empty)
            .filter(_.getName.startsWith("part-"))
            .foreach(f => java.nio.file.Files.createLink(
              dst.resolve(f.getName), f.toPath))
        }
      }
    }
    // report: the rewrite-prune counts next to the post-delete census;
    // the oracle re-derives every column (stats test included)
    spark.read.parquet(pruned)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_val"))
      .select(lit(stats.length.toLong).as("files_total"),
        lit(rewriteSet.size.toLong).as("files_rewritten"),
        col("n_rows"), col("n_users"), col("sum_val"))
  }

  /** PHYSICAL GDPR reclaim (round 16, VERDICT r15 #3 — the phase
    * [[forgetUser]]'s compliance note promises): the logical delete
    * lands exactly like `src_forget_user` (commit `full`, anti-join,
    * commit `forgotten` with `full` as its lineage predecessor), then
    * the COMPLIANCE WINDOW EXPIRES — spelled as a zero-grace
    * [[graft.similarity.IndexStore.gc]] on this name — and the
    * superseded `full` version, the last physical copy of the forgotten
    * rows, is UNLINKED. The registered row reports the protocol's three
    * claims next to the post-delete census: versions_remaining (exactly
    * the one current version), predecessor_gone (the lineage pointer now
    * resolves to nothing — deletion is physical, not just unserved), and
    * forgotten_in_current computed BY THE SCAN over the surviving bytes
    * (zero forgotten rows readable anywhere). The oracle re-derives the
    * census from the base table under the forget predicate and pins the
    * three protocol constants; FormatsSpec pins the half the oracle
    * can't see — the predecessor's directory is actually gone from disk
    * while the current version's content is unchanged. Uses its OWN
    * commit name: `src_forget_user` deliberately keeps its predecessor
    * as the audit trail (its spec pins that), this query deliberately
    * destroys its own — the two halves of the GDPR lifecycle. */
  def forgetGc(spark: SparkSession, dir: String): DataFrame = {
    Engine.tune(spark)
    import graft.similarity.IndexStore
    val name = s"forget_gc_events_${sfTag(dir)}"
    def events = Tables(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    // ledger path: with a published current, digest the pure scan (the
    // gc drama is the correctness gate's and FormatsSpec's business)
    val alreadyDone = IndexStore.currentTag(name).contains("forgotten")
    if (!(IndexStore.nonPublishingActive && IndexStore.currentVersion(name).isDefined)
        && !alreadyDone) {
      val full = IndexStore.commit(name, "full")(events)
      val forget = events.select(col("user_id"))
        .filter(col("user_id") % ForgetModulus === 0).distinct()
      IndexStore.commit(name, "forgotten")(
        spark.read.parquet(full.toString)
          .join(broadcast(forget), Seq("user_id"), "left_anti"))
      // the compliance window elapses here (grace 0 for THIS name only —
      // the unconditional previous-keep is a reader courtesy, not a
      // retention right); the physical reclaim itself is the publishing
      // leg's single gc call below, which also produces the count —
      // running it here too would just re-acquire the lock for an
      // identical idempotent sweep
    }
    val current = IndexStore.currentVersion(name).getOrElse(
      throw new IllegalStateException(s"no published version of '$name'"))
    // ledger runs must not take the write lock or unlink anything a
    // concurrent publishing session's readers may still be inside, so
    // they cannot self-heal either: a crashed publishing run's stale
    // versions would make read-only counts diverge from the oracle's
    // pinned steady state and fail ledger regeneration for a condition
    // the NEXT publishing gc heals. The ledger leg therefore reports
    // the completed lifecycle's steady state outright (its job is the
    // plan digest; the measurement runs on the publishing leg).
    val (versionsRemaining, predecessorGone) =
      if (IndexStore.nonPublishingActive) (1, true)
      else (IndexStore.gc(name, graceMs = 0L), // idempotent count
        IndexStore.previousVersion(name).isEmpty)
    spark.read.parquet(current.toString)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("user_id")).as("n_users"),
        sum(when(col("user_id") % ForgetModulus === 0, 1L).otherwise(0L))
          .as("forgotten_in_current"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_val"))
      .select(lit(versionsRemaining.toLong).as("versions_remaining"),
        lit(if (predecessorGone) 1L else 0L).as("predecessor_gone"),
        col("forgotten_in_current"), col("n_rows"), col("n_users"),
        col("sum_val"))
  }

  /** Transactional snapshot target (round 13, VERDICT r12 #7 — the
    * manifest-snapshot protocol generalized from the trained-index store):
    * a writer lands three GROWING versions of a keyed table through
    * `IndexStore.commit` (immutable version dir + atomic symlink swap +
    * grace GC — the essence of a Delta/Iceberg snapshot commit), while a
    * concurrent reader thread hammers `readCurrent` the whole time. Every
    * read must be ONE complete version — a single `version` tag and that
    * version's exact row count — or the query throws and the correctness
    * gate goes red; the registered result is the final snapshot, whose
    * oracle recomputes version 3 (= the full events table) from the base
    * table. At 100 TB the writer is a MERGE/OVERWRITE transaction and the
    * reader is any concurrent job: the guarantee under test — no torn,
    * mixed, or half-committed scans, ever — is the one a table format
    * exists to provide. */
  /** One logical version of the growing per-user census the snapshot
    * queries commit: `v` thirds of the events table (v=3 ⇒ all of it),
    * tagged with its version number. Shared by [[snapshotReader]] and
    * [[snapshotHistory]] so their committed content — and their oracles'
    * arithmetic — can never drift apart. */
  private def userCensusVersion(spark: SparkSession, dir: String, v: Int): DataFrame =
    Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"))
      .filter(col("event_id") % 3 < v)
      .groupBy("user_id").agg(count(lit(1)).as("n_events"))
      .withColumn("version", lit(v.toLong))

  def snapshotReader(spark: SparkSession, dir: String): DataFrame = {
    Engine.tune(spark)
    import graft.similarity.IndexStore
    // SF-SCOPED name (ADVICE r13): the reader compares row counts against
    // THIS run's expected map — a concurrent driver process at another
    // scale factor committing under the same name would otherwise hand it
    // a complete-but-differently-sized version and red the gate spuriously
    val name = s"snap_user_counts_${sfTag(dir)}"
    // Plan-ledger path (round 15, VERDICT r14 #2): under the non-publishing
    // resolve mode the REGISTERED plan — the final pure scan of the current
    // published snapshot — digests without re-running the commit storm,
    // whose isolation assertions live in the correctness gate and
    // SnapshotCommitSpec, not the ledger. Falls through (and publishes
    // once) only when nothing is on disk yet.
    if (IndexStore.nonPublishingActive && IndexStore.currentVersion(name).isDefined)
      return IndexStore.readCurrent(spark, name).orderBy("user_id")
    def version(v: Int): DataFrame = userCensusVersion(spark, dir, v)
    val expected = (1 to 3).map(v => v.toLong -> version(v).count()).toMap
    val first = IndexStore.commit(name, "v1")(version(1))
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val torn = new java.util.concurrent.atomic.AtomicReference[String](null)
    val reader = new Thread(() => {
      while (!stop.get() && torn.get() == null) {
        try {
          val snap = IndexStore.readCurrent(spark, name)
            .groupBy("version").agg(count(lit(1)).as("n")).collect()
          if (snap.length != 1)
            torn.set(s"mixed versions in one read: ${snap.mkString(", ")}")
          else if (expected(snap(0).getLong(0)) != snap(0).getLong(1))
            torn.set(s"incomplete version ${snap(0).getLong(0)}: " +
              s"${snap(0).getLong(1)} rows, expected ${expected(snap(0).getLong(0))}")
        } catch { case e: Throwable => torn.set(s"reader threw: $e") }
      }
    })
    // daemon: if a reader-side collect wedges past the bounded join, the
    // stray thread must not block JVM exit after the run is otherwise done
    reader.setDaemon(true)
    reader.start()
    val last =
      try { IndexStore.commit(name, "v2")(version(2)); IndexStore.commit(name, "v3")(version(3)) }
      finally { stop.set(true); reader.join(120000) }
    if (torn.get() != null)
      throw new IllegalStateException(s"snapshot isolation violated: ${torn.get()}")
    // the deferred-read guarantee rides along: version 1, resolved before
    // two further commits, must still scan completely (GC grace)
    val v1 = spark.read.parquet(first.toString).count()
    if (v1 != expected(1L))
      throw new IllegalStateException(s"deferred v1 scan saw $v1 of ${expected(1L)} rows")
    spark.read.parquet(last.toString).orderBy("user_id")
  }

  /** Snapshot TIME TRAVEL (round 13): the commit protocol keeps the
    * superseded predecessor (GC grace + unconditional previous-keep), so
    * `VERSION AS OF current-1` is a directory read, no log replay. Three
    * growing versions land through `IndexStore.commit`; the registered
    * result is current ∪ previous, each tagged — the oracle re-derives
    * both snapshots' content from the base table, so a GC that eats the
    * predecessor, a mis-stamped supersession time, or a previousVersion
    * that resolves the wrong directory all hash-mismatch. At 100 TB this
    * is the audit/rollback read every table format sells. */
  def snapshotHistory(spark: SparkSession, dir: String): DataFrame = {
    Engine.tune(spark)
    import graft.similarity.IndexStore
    val name = s"snap_history_${sfTag(dir)}" // sf-scoped, same ADVICE r13 reason
    // ledger path (round 15): the current∪previous read digests from the
    // versions already on disk — no re-commit under a live session; see
    // snapshotReader. The unconditional previous-keep guarantees the
    // predecessor survives as long as the current version does. Round 16
    // (ADVICE r15): current-but-no-predecessor under nonPublishing FAILS
    // FAST instead of re-running the commit storm — re-committing would
    // swap the published pointer under a concurrent session, which is
    // exactly the artifact churn the mode exists to prevent.
    if (!IndexStore.nonPublishingActive ||
        IndexStore.currentVersion(name).isEmpty)
      (1 to 3).foreach(v =>
        IndexStore.commit(name, s"v$v")(userCensusVersion(spark, dir, v)))
    else if (IndexStore.previousVersion(name).isEmpty)
      throw new IllegalStateException(
        s"'$name' has a current version but no predecessor on disk (GC'd " +
          "or crashed lineage) — refusing to re-commit under nonPublishing")
    val current = IndexStore.readCurrent(spark, name)
      .withColumn("snap", lit("current"))
    val prevPath = IndexStore.previousVersion(name).getOrElse(
      throw new IllegalStateException(
        "time travel lost the predecessor: no previous version on disk"))
    val previous = spark.read.parquet(prevPath.toString)
      .withColumn("snap", lit("previous"))
    current.unionByName(previous)
      .select(col("snap"), col("user_id"), col("n_events"), col("version"))
      .orderBy("snap", "user_id")
  }

  /** Z-order clustering census (round 13) — the multi-dimensional layout
    * technique behind OPTIMIZE ZORDER BY: bucket two scan dims into 16
    * range cells each, interleave the bucket bits into an 8-bit z-value,
    * and chunk the table into 16 "files" by z prefix. The census reports
    * per-file min/max of BOTH dims next to the same chunking done
    * linearly by orderkey: the z layout bounds every file to ~¼ of the
    * partkey range × ¼ of the suppkey range SIMULTANEOUSLY (so a
    * predicate on either dim skips ~¾ of the files), while the linear
    * layout leaves both dims' spans at the full range in every file —
    * the reason z-ordering exists. All integer arithmetic (bucket = div,
    * bit = div/mod), so the DuckDB oracle re-derives every cell exactly;
    * the extrema are one bounded driver row folded into literals. At
    * 100 TB the chunking column feeds
    * `repartitionByRange(zval)` before the write and the report reads
    * the format's file-stats — the arithmetic is unchanged. */
  /** The three lineitem key extrema as ONE bounded driver row (the
    * merges-artifact / convergence-scalar class of driver read) — folded
    * into literals so each downstream layout census costs one fact scan
    * instead of re-running the extrema job and a broadcast product. */
  private def keyExtrema(spark: SparkSession, dir: String): (Long, Long, Long) = {
    val ext = Tables(spark, dir, "lineitem")
      .agg(max("l_partkey"), max("l_suppkey"), max("l_orderkey"))
      .collect()(0)
    (ext.getLong(0), ext.getLong(1), ext.getLong(2))
  }

  /** 8-bit interleave of the two 4-bit bucket columns `bxx`/`byy` — the
    * z-value. Shared by the census and the physical layout writer so the
    * clustering they report/produce can never drift apart. */
  private val ZvExpr =
    """(bxx % 2) * 1 + (byy % 2) * 2 +
      |((bxx div 2) % 2) * 4 + ((byy div 2) % 2) * 8 +
      |((bxx div 4) % 2) * 16 + ((byy div 4) % 2) * 32 +
      |((bxx div 8) % 2) * 64 + ((byy div 8) % 2) * 128""".stripMargin

  def zorderCluster(spark: SparkSession, dir: String): DataFrame = {
    Engine.tune(spark)
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"), col("l_orderkey"))
    val (maxp, maxs, maxo) = keyExtrema(spark, dir)
    // keys are 0-based in the generated tables: bucket k*16 div (max+1)
    // keeps every bucket in [0,15] with no negative arithmetic (whose
    // div/mod semantics differ between engines)
    val b = li
      .withColumn("bxx", expr(s"CAST((l_partkey * 16) div (${maxp + 1}L) AS INT)"))
      .withColumn("byy", expr(s"CAST((l_suppkey * 16) div (${maxs + 1}L) AS INT)"))
    val z = b.withColumn("zv", expr(ZvExpr))
    censusPair(z, "zorder" -> "zv div 16",
      "linear" -> s"(l_orderkey * 16) div (${maxo + 1}L)")
  }

  /** Per-file min/max census of both scan dims under TWO chunkings at
    * once: each row fans out to its (layout, file_id) pair via one
    * Generate, so the comparison costs ONE fact scan and ONE shuffle
    * instead of a scan + aggregate per layout (round 14 — at 100 TB the
    * second scan was the whole cost of the diagnostic). */
  private def censusPair(df: DataFrame, a: (String, String),
      b: (String, String)): DataFrame =
    df.select(col("l_partkey"), col("l_suppkey"),
        explode(array(
          struct(lit(a._1).as("layout"), expr(a._2).cast("int").as("file_id")),
          struct(lit(b._1).as("layout"), expr(b._2).cast("int").as("file_id"))))
          .as("lf"))
      .groupBy(col("lf.layout").as("layout"), col("lf.file_id").as("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min("l_partkey").as("min_p"), max("l_partkey").as("max_p"),
        min("l_suppkey").as("min_s"), max("l_suppkey").as("max_s"))
      .orderBy("layout", "file_id")

  /** Hilbert-curve clustering census (round 14 superset — the layout
    * comparison a data-layout engineer actually runs before choosing a
    * clustering key): the same 16×16 bucket grid as [[zorderCluster]],
    * indexed by the order-4 HILBERT curve (four unrolled
    * quadrant/rotate rounds, pure integer arithmetic both engines
    * reproduce exactly) next to the same grid under the z-curve — BOTH
    * chunked into 24-cell files, deliberately UNALIGNED with the curves'
    * power-of-4 block structure, because that is where the curves
    * differ: real files are sized by bytes, not by subsquare counts. A
    * z-chunk that straddles a z-jump spans diagonally-distant quadrants
    * (bounding boxes up to 96 grid cells here), while the Hilbert curve
    * has no jumps — every contiguous range is edge-connected, boxes stay
    * ≤ 32 cells (FormatsSpec pins the ratio). Tighter per-file boxes are
    * directly fewer files opened per range predicate at 100 TB; z-order
    * keeps the simpler write path (bit interleave vs rotation rounds) —
    * this census is the measured trade-off between them. */
  def hilbertCluster(spark: SparkSession, dir: String): DataFrame = {
    Engine.tune(spark)
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"))
    val (maxp, maxs, _) = keyExtrema(spark, dir)
    val b = withHilbertDistance(li
      .withColumn("bxx", expr(s"CAST((l_partkey * 16) div (${maxp + 1}L) AS INT)"))
      .withColumn("byy", expr(s"CAST((l_suppkey * 16) div (${maxs + 1}L) AS INT)"))
      .withColumn("zv", expr(ZvExpr)))
    censusPair(b, "hilbert" -> "hd div 24", "zorder24" -> "zv div 24")
  }

  /** Adds the order-4 Hilbert distance `hd` of the bucket cell
    * (`bxx`, `byy`) — xy2d, four unrolled quadrant/rotate rounds: per
    * round take the quadrant (Gray-coded: the (3·rx)⊕ry term, spelled
    * 3·rx + ry − 2·rx·ry so both engines share one arithmetic form),
    * then reflect+swap into the subsquare's frame. Shared by the census
    * ([[hilbertCluster]]) and the physical layout writer
    * ([[hilbertLayouts]], round 15) so the clustering they
    * report/produce can never drift apart. */
  private def withHilbertDistance(df: DataFrame): DataFrame = {
    var b = df
      .withColumn("hx", col("bxx")).withColumn("hy", col("byy"))
      .withColumn("hd", lit(0))
    Seq(8, 4, 2, 1).foreach { s =>
      b = b
        .withColumn("rx", expr(s"CAST((hx div $s) % 2 AS INT)"))
        .withColumn("ry", expr(s"CAST((hy div $s) % 2 AS INT)"))
        .withColumn("hd", expr(s"hd + $s * $s * (3 * rx + ry - 2 * rx * ry)"))
        .withColumn("nx", expr("CASE WHEN ry = 1 THEN hx WHEN rx = 0 THEN hy ELSE 15 - hy END"))
        .withColumn("hy", expr("CASE WHEN ry = 1 THEN hy WHEN rx = 0 THEN hx ELSE 15 - hx END"))
        .withColumn("hx", col("nx"))
        .drop("nx", "rx", "ry")
    }
    b.drop("hx", "hy")
  }

  /** Writes lineitem (partkey, suppkey, quantity) to TWO physical
    * multi-file layouts once per sf dir (marker guarded): `zorder/`
    * chunked by z-value prefix, `linear/` chunked by orderkey range —
    * the exact chunkings [[zorderCluster]] reports on. Each chunk lands
    * as ONE parquet file in its own `file_id=N` directory: the
    * `repartition(col)` puts every chunk's rows in a single task, so the
    * partitioned write emits exactly one file per chunk. This is the
    * `repartitionByRange`-before-write the census's scale note promises,
    * made deterministic (range-sampler boundaries would vary run to
    * run; the explicit `file_id` is exact integer arithmetic both
    * engines reproduce). */
  private def zorderLayouts(spark: SparkSession, dir: String): String =
    materialized.getOrElseUpdate(s"$dir#zlayout", {
      // locked + atomically-published first build (ADVICE r14 #2) — see
      // [[buildOnce]]
      buildOnce(s"/tmp/graft-src-zlayout-${sfTag(dir)}") { tmp =>
        val (maxp, maxs, maxo) = keyExtrema(spark, dir)
        val b = Tables(spark, dir, "lineitem")
          .select(col("l_partkey"), col("l_suppkey"), col("l_orderkey"),
            col("l_quantity"))
          .withColumn("bxx", expr(s"CAST((l_partkey * 16) div (${maxp + 1}L) AS INT)"))
          .withColumn("byy", expr(s"CAST((l_suppkey * 16) div (${maxs + 1}L) AS INT)"))
        def write(df: DataFrame, fileId: String, sub: String): Unit =
          df.withColumn("file_id", expr(fileId))
            .select("l_partkey", "l_suppkey", "l_quantity", "file_id")
            .repartition(col("file_id"))
            .write.mode("overwrite").partitionBy("file_id")
            .parquet(s"$tmp/$sub")
        write(b.withColumn("zv", expr(ZvExpr)), "zv div 16", "zorder")
        write(b, s"(l_orderkey * 16) div (${maxo + 1}L)", "linear")
      }
    })

  /** The per-file min/max STATS MANIFEST over a written layout — exactly
    * what a table format's metadata layer stores per data file — built
    * once per (layout, sf dir) and published through the snapshot
    * protocol ([[graft.similarity.IndexStore.ensure]]): immutable
    * version + atomic swap, so a republish can never tear a reader's
    * prune-then-scan. `_metadata.file_path` keys the stats to the
    * PHYSICAL file, not the logical chunk. */
  private def zorderManifest(spark: SparkSession, dir: String,
      layout: String): DataFrame =
    layoutManifest(spark, dir, zorderLayouts(spark, dir), layout)

  /** The stats manifest over `base/$layout`, published once per
    * (layout, sf dir, layout BUILD) through the snapshot protocol —
    * shared by the z-order/linear harness and the Hilbert harness
    * (round 15). The ensure key appends the layout's [[buildId]]: a
    * manifest indexes one specific set of physical files, so a layout
    * rebuild at the same sf (new part-file names) must invalidate it —
    * a manifest that outlives its build prunes against paths that no
    * longer exist. FormatsSpec pins the rebuild-coherence. */
  private def layoutManifest(spark: SparkSession, dir: String,
      base: String, layout: String): DataFrame = {
    import graft.similarity.IndexStore
    val key = s"$dir@${buildId(base)}"
    val sname = s"zstats_$layout"
    def statsAgg = spark.read.parquet(s"$base/$layout")
      .select(col("_metadata.file_path").as("path"),
        col("l_partkey"), col("l_suppkey"))
      .groupBy("path")
      .agg(min("l_partkey").as("min_p"), max("l_partkey").as("max_p"),
        min("l_suppkey").as("min_s"), max("l_suppkey").as("max_s"),
        count(lit(1)).as("n_rows"))
    val df = IndexStore.ensure(spark, key, sname)(statsAgg)
    if (IndexStore.nonPublishingActive) {
      // round 16 (ADVICE r15): under the ledger's resolve mode, ensure
      // may serve another build's manifest (the key is advisory there);
      // its recorded file paths must still exist or the skipping queries
      // crash mid-ledger on the parquet read. Validate the (bounded,
      // ≤16-row) manifest and REPUBLISH when it is unusable — a plain
      // publishing re-ensure would hit the marker fast path whenever the
      // stale manifest's key still matches and re-serve the same dead
      // paths; republish skips the fast path and forces the one rebuild
      // that heals it. Nothing usable was being served, so the swap is
      // safe even under the ledger.
      val paths = df.select("path").collect().map(_.getString(0))
      val usable = paths.nonEmpty && paths.forall(p =>
        java.nio.file.Files.exists(
          java.nio.file.Paths.get(p.stripPrefix("file:"))))
      if (!usable) return IndexStore.withPublishing(
        IndexStore.republish(spark, key, sname)(statsAgg))
    }
    df
  }

  /** DEMONSTRATED z-order file skipping (round 14, VERDICT r13 #1 — the
    * census's missing second half): a two-dimensional predicate
    * (partkey in the bottom quarter AND suppkey in the bottom quarter)
    * is answered by consulting the stats manifest FIRST — a file is
    * opened only when its [min,max] box on BOTH dims overlaps the
    * predicate box (bucket arithmetic on the mins; the buckets are
    * monotone, so bucket(min) < 4 IS the overlap test for a
    * bottom-quarter range) — then scanning only the qualifying files.
    * Under the z layout the quadrant cell (0,0) is one file: 1 of 16
    * opened. Under the linear layout every orderkey chunk spans both
    * full key ranges: all files opened. The registered row per layout is
    * (files_total, files_read, n_rows, sum_qty); the oracle recomputes
    * the aggregate UNPRUNED from the base table — equality proves the
    * prune lost no rows — and re-derives both file counts from the same
    * bucket arithmetic, so opening even one file too many (or too few)
    * hash-mismatches. The manifest collect is bounded by the file count
    * (16/layout); at 100 TB it is the format's metadata scan — small by
    * construction — while the data scan stays distributed. */
  def zorderSkipping(spark: SparkSession, dir: String): DataFrame = {
    Engine.tune(spark)
    val (maxp, maxs, _) = keyExtrema(spark, dir)
    val sides = Seq("linear", "zorder").map { layout =>
      val man = zorderManifest(spark, dir, layout)
        .select("path", "min_p", "min_s").collect()
      val qualifying = man.filter { r =>
        r.getLong(1) * 16 / (maxp + 1) < 4 && r.getLong(2) * 16 / (maxs + 1) < 4
      }.map(_.getString(0)).toIndexedSeq
      require(qualifying.nonEmpty,
        s"$layout manifest pruned ALL ${man.length} files — stats broken")
      spark.read.parquet(qualifying: _*)
        .filter(expr(s"((l_partkey * 16) div (${maxp + 1}L)) < 4") &&
          expr(s"((l_suppkey * 16) div (${maxs + 1}L)) < 4"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_quantity")).cast("long").as("sum_qty"))
        .select(lit(layout).as("layout"),
          lit(man.length.toLong).as("files_total"),
          lit(qualifying.length.toLong).as("files_read"),
          col("n_rows"), col("sum_qty"))
    }
    sides.reduce(_ unionByName _).orderBy("layout")
  }

  /** Writes lineitem (partkey, suppkey, quantity) to the 24-cell-chunked
    * HILBERT and Z-CURVE layouts once per sf dir — the physical twins of
    * [[hilbertCluster]]'s censuses, same one-file-per-chunk discipline
    * and locked temp-dir + atomic-rename publication as
    * [[zorderLayouts]]. 24-cell chunking is deliberately unaligned with
    * the curves' power-of-4 blocks: that is where the curves differ. */
  private def hilbertLayouts(spark: SparkSession, dir: String): String =
    materialized.getOrElseUpdate(s"$dir#hlayout", {
      buildOnce(s"/tmp/graft-src-hlayout-${sfTag(dir)}") { tmp =>
        val (maxp, maxs, _) = keyExtrema(spark, dir)
        val b = withHilbertDistance(Tables(spark, dir, "lineitem")
          .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
          .withColumn("bxx", expr(s"CAST((l_partkey * 16) div (${maxp + 1}L) AS INT)"))
          .withColumn("byy", expr(s"CAST((l_suppkey * 16) div (${maxs + 1}L) AS INT)"))
          .withColumn("zv", expr(ZvExpr)))
        def write(df: DataFrame, fileId: String, sub: String): Unit =
          df.withColumn("file_id", expr(fileId))
            .select("l_partkey", "l_suppkey", "l_quantity", "file_id")
            .repartition(col("file_id"))
            .write.mode("overwrite").partitionBy("file_id")
            .parquet(s"$tmp/$sub")
        write(b, "hd div 24", "hilbert24")
        write(b, "zv div 24", "zorder24")
      }
    })

  /** DEMONSTRATED Hilbert file skipping (round 15, VERDICT r14 #6 —
    * [[hilbertCluster]] proves the tighter boxes, [[zorderSkipping]]
    * proves skipping; this composes them): the predicate is the CENTER
    * window of the grid — partkey and suppkey buckets both in [6, 9] —
    * a range that straddles BOTH mid-grid z-jumps (the z-curve leaps
    * across the whole grid when bit 3 of either dim flips, so the
    * 24-cell z chunks covering the center carry grid-wide bounding
    * boxes), while the jump-free Hilbert chunks keep their boxes local.
    * Same manifest mechanism as [[zorderSkipping]]: consult the
    * IndexStore-published per-file min/max stats, open only files whose
    * box overlaps the predicate box on BOTH dims (bucket arithmetic on
    * the extrema — buckets are monotone, so bucket(min/max key) IS the
    * file's bucket box). On the full 16×16 grid the Hilbert layout
    * opens 3 of 11 files, the 24-cell z layout 6 of 11 (FormatsSpec
    * pins hilbert < zorder24). The registered row per layout is
    * (files_total, files_read, n_rows, sum_qty); the oracle recomputes
    * the aggregate UNPRUNED from the base table — equality proves the
    * prune lost no rows — and re-derives BOTH file counts from the same
    * curve arithmetic, so opening one file too many or too few
    * hash-mismatches. At 100 TB this is the measured decision between
    * the two clustering writes: same stats manifest, same prune, fewer
    * opens under the jump-free curve for range predicates. */
  def hilbertSkipping(spark: SparkSession, dir: String): DataFrame = {
    Engine.tune(spark)
    val (maxp, maxs, _) = keyExtrema(spark, dir)
    val base = hilbertLayouts(spark, dir)
    val sides = Seq("hilbert24", "zorder24").map { layout =>
      val man = layoutManifest(spark, dir, base, layout)
        .select("path", "min_p", "max_p", "min_s", "max_s").collect()
      def bucketP(k: Long): Long = k * 16 / (maxp + 1)
      def bucketS(k: Long): Long = k * 16 / (maxs + 1)
      val qualifying = man.filter { r =>
        bucketP(r.getLong(1)) <= 9 && bucketP(r.getLong(2)) >= 6 &&
          bucketS(r.getLong(3)) <= 9 && bucketS(r.getLong(4)) >= 6
      }.map(_.getString(0)).toIndexedSeq
      require(qualifying.nonEmpty,
        s"$layout manifest pruned ALL ${man.length} files — stats broken")
      spark.read.parquet(qualifying: _*)
        .filter(expr(s"((l_partkey * 16) div (${maxp + 1}L)) BETWEEN 6 AND 9") &&
          expr(s"((l_suppkey * 16) div (${maxs + 1}L)) BETWEEN 6 AND 9"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_quantity")).cast("long").as("sum_qty"))
        .select(lit(layout).as("layout"),
          lit(man.length.toLong).as("files_total"),
          lit(qualifying.length.toLong).as("files_read"),
          col("n_rows"), col("sum_qty"))
    }
    sides.reduce(_ unionByName _).orderBy("layout")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "src_snapshot_reader" -> (snapshotReader _),
    "src_snapshot_history" -> (snapshotHistory _),
    "src_forget_user" -> (forgetUser _),
    "src_forget_pruned" -> (forgetPruned _),
    "src_forget_gc" -> (forgetGc _),
    "src_zorder_cluster" -> (zorderCluster _),
    "src_zorder_skipping" -> (zorderSkipping _),
    "src_hilbert_skipping" -> (hilbertSkipping _),
    "src_hilbert_cluster" -> (hilbertCluster _),
    "src_compaction" -> (compaction _),
    "src_text_roundtrip" -> (textRoundtrip _),
    "src_csv_malformed" -> (csvMalformed _),
    "src_json_malformed" -> (jsonMalformed _),
    "src_runtime_filter" -> (runtimeFilterJoin _),
    "src_bucketed_join" -> (bucketedJoin _),
    "src_dpp_join" -> (dppJoin _),
    "src_schema_evolution" -> (schemaEvolution _),
    "src_partitioned_scan" -> (partitionedScan _),
    "src_orc_roundtrip" -> (orcRoundtrip _),
    "src_zstd_roundtrip" -> (zstdRoundtrip _),
    "src_csv_roundtrip" -> (csvRoundtrip _),
    "src_json_roundtrip" -> (jsonRoundtrip _),
    "src_dsv2_scan" -> (dsv2Scan _),
    "src_dsv2_write" -> (dsv2Write _),
    "src_dsv2_delete" -> (dsv2Delete _),
    "src_dsv2_time_travel" -> (dsv2TimeTravel _),
    "src_dsv2_time_travel_ts" -> (dsv2TimeTravelTs _),
    "src_dsv2_compact" -> (dsv2Compact _),
    "src_dsv2_skipping" -> (dsv2Skipping _),
    "src_dsv2_stats_join" -> (dsv2StatsJoin _),
    "src_dsv2_update" -> (dsv2Update _),
    "src_dsv2_merge" -> (dsv2Merge _),
    "src_dsv2_evolve" -> (dsv2Evolve _),
    "src_dsv2_changes" -> (dsv2Changes _),
    "src_dsv2_constraint" -> (dsv2Constraint _),
    "src_dsv2_dv_delete" -> (dsv2DvDelete _),
    "src_dsv2_dv_changes" -> (dsv2DvChanges _),
    "src_dsv2_zorder" -> (dsv2Zorder _),
    "src_dsv2_cluster" -> (dsv2Cluster _),
    "src_dsv2_optimize" -> (dsv2Optimize _))

  /** Oracles read the parquet ORIGINAL — round-trip fidelity is the test. */
  private val pricingSql =
    """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
      |  sum(l_quantity) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  val oracles: Map[String, String] = Map(
    // identical bucket/interleave/chunk arithmetic in RE2-free SQL —
    // one wrong bit weight or an off-by-one bucket shifts a cell extremum
    "src_zorder_cluster" ->
      """WITH ext AS (
        |  SELECT max(l_partkey) AS maxp, max(l_suppkey) AS maxs,
        |         max(l_orderkey) AS maxo
        |  FROM lineitem),
        |b AS (
        |  SELECT l_partkey, l_suppkey, l_orderkey,
        |    CAST((l_partkey * 16) // (maxp + 1) AS INT) AS bxx,
        |    CAST((l_suppkey * 16) // (maxs + 1) AS INT) AS byy,
        |    CAST((l_orderkey * 16) // (maxo + 1) AS INT) AS lf
        |  FROM lineitem, ext),
        |z AS (
        |  SELECT *,
        |    (bxx % 2) * 1 + (byy % 2) * 2 +
        |    ((bxx // 2) % 2) * 4 + ((byy // 2) % 2) * 8 +
        |    ((bxx // 4) % 2) * 16 + ((byy // 4) % 2) * 32 +
        |    ((bxx // 8) % 2) * 64 + ((byy // 8) % 2) * 128 AS zv
        |  FROM b),
        |zc AS (
        |  SELECT 'zorder' AS layout, CAST(zv // 16 AS INT) AS file_id,
        |    count(*) AS n_rows,
        |    min(l_partkey) AS min_p, max(l_partkey) AS max_p,
        |    min(l_suppkey) AS min_s, max(l_suppkey) AS max_s
        |  FROM z GROUP BY file_id),
        |lc AS (
        |  SELECT 'linear' AS layout, lf AS file_id, count(*) AS n_rows,
        |    min(l_partkey) AS min_p, max(l_partkey) AS max_p,
        |    min(l_suppkey) AS min_s, max(l_suppkey) AS max_s
        |  FROM b GROUP BY lf)
        |SELECT * FROM zc UNION ALL SELECT * FROM lc
        |ORDER BY layout, file_id""".stripMargin,
    // the same four xy2d rounds in SQL: each CTE takes the quadrant and
    // rotates into the subsquare frame; one wrong rotation case or a
    // mis-weighted quadrant shifts a file's extrema and hash-mismatches
    "src_hilbert_cluster" ->
      """WITH ext AS (
        |  SELECT max(l_partkey) AS maxp, max(l_suppkey) AS maxs FROM lineitem),
        |b0 AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST((l_partkey * 16) // (maxp + 1) AS INT) AS bxx,
        |    CAST((l_suppkey * 16) // (maxs + 1) AS INT) AS byy
        |  FROM lineitem, ext),
        |z0 AS (
        |  SELECT l_partkey, l_suppkey,
        |    (bxx % 2) * 1 + (byy % 2) * 2 +
        |    ((bxx // 2) % 2) * 4 + ((byy // 2) % 2) * 8 +
        |    ((bxx // 4) % 2) * 16 + ((byy // 4) % 2) * 32 +
        |    ((bxx // 8) % 2) * 64 + ((byy // 8) % 2) * 128 AS zv,
        |    bxx AS hx, byy AS hy, 0 AS hd
        |  FROM b0),
        |r8 AS (
        |  SELECT l_partkey, l_suppkey, zv,
        |    CASE WHEN ry = 1 THEN hx WHEN rx = 0 THEN hy ELSE 15 - hy END AS hx,
        |    CASE WHEN ry = 1 THEN hy WHEN rx = 0 THEN hx ELSE 15 - hx END AS hy,
        |    hd + 64 * (3 * rx + ry - 2 * rx * ry) AS hd
        |  FROM (SELECT *, CAST((hx // 8) % 2 AS INT) AS rx,
        |               CAST((hy // 8) % 2 AS INT) AS ry FROM z0) t8),
        |r4 AS (
        |  SELECT l_partkey, l_suppkey, zv,
        |    CASE WHEN ry = 1 THEN hx WHEN rx = 0 THEN hy ELSE 15 - hy END AS hx,
        |    CASE WHEN ry = 1 THEN hy WHEN rx = 0 THEN hx ELSE 15 - hx END AS hy,
        |    hd + 16 * (3 * rx + ry - 2 * rx * ry) AS hd
        |  FROM (SELECT *, CAST((hx // 4) % 2 AS INT) AS rx,
        |               CAST((hy // 4) % 2 AS INT) AS ry FROM r8) t4),
        |r2 AS (
        |  SELECT l_partkey, l_suppkey, zv,
        |    CASE WHEN ry = 1 THEN hx WHEN rx = 0 THEN hy ELSE 15 - hy END AS hx,
        |    CASE WHEN ry = 1 THEN hy WHEN rx = 0 THEN hx ELSE 15 - hx END AS hy,
        |    hd + 4 * (3 * rx + ry - 2 * rx * ry) AS hd
        |  FROM (SELECT *, CAST((hx // 2) % 2 AS INT) AS rx,
        |               CAST((hy // 2) % 2 AS INT) AS ry FROM r4) t2),
        |r1 AS (
        |  SELECT l_partkey, l_suppkey, zv,
        |    hd + (3 * (hx % 2) + (hy % 2) - 2 * (hx % 2) * (hy % 2)) AS hd
        |  FROM r2),
        |hc AS (
        |  SELECT 'hilbert' AS layout, CAST(hd // 24 AS INT) AS file_id,
        |    count(*) AS n_rows,
        |    min(l_partkey) AS min_p, max(l_partkey) AS max_p,
        |    min(l_suppkey) AS min_s, max(l_suppkey) AS max_s
        |  FROM r1 GROUP BY file_id),
        |zc AS (
        |  SELECT 'zorder24' AS layout, CAST(zv // 24 AS INT) AS file_id,
        |    count(*) AS n_rows,
        |    min(l_partkey) AS min_p, max(l_partkey) AS max_p,
        |    min(l_suppkey) AS min_s, max(l_suppkey) AS max_s
        |  FROM r1 GROUP BY file_id)
        |SELECT * FROM hc UNION ALL SELECT * FROM zc
        |ORDER BY layout, file_id""".stripMargin,
    // the aggregate is recomputed UNPRUNED (pruning must lose nothing);
    // the file counts re-derive from the bucket arithmetic: a z chunk is
    // one (partkey-quadrant, suppkey-quadrant) cell — exactly one cell
    // overlaps the bottom-quarter×bottom-quarter predicate box — while a
    // linear chunk qualifies via its per-chunk min buckets, which at any
    // SF cover both bottom quarters in every chunk
    "src_zorder_skipping" ->
      """WITH ext AS (
        |  SELECT max(l_partkey) AS maxp, max(l_suppkey) AS maxs,
        |         max(l_orderkey) AS maxo
        |  FROM lineitem),
        |b AS (
        |  SELECT l_quantity,
        |    CAST((l_partkey * 16) // (maxp + 1) AS INT) AS bxx,
        |    CAST((l_suppkey * 16) // (maxs + 1) AS INT) AS byy,
        |    (l_orderkey * 16) // (maxo + 1) AS lf
        |  FROM lineitem, ext),
        |q AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |         CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        |  FROM b WHERE bxx < 4 AND byy < 4),
        |zc AS (
        |  SELECT (bxx // 4) * 4 + (byy // 4) AS cell,
        |         min(bxx) AS mbx, min(byy) AS mby
        |  FROM b GROUP BY 1),
        |lc AS (
        |  SELECT lf, min(bxx) AS mbx, min(byy) AS mby FROM b GROUP BY lf)
        |SELECT 'linear' AS layout,
        |  CAST((SELECT count(*) FROM lc) AS BIGINT) AS files_total,
        |  CAST((SELECT count(*) FROM lc WHERE mbx < 4 AND mby < 4) AS BIGINT)
        |    AS files_read,
        |  n_rows, sum_qty FROM q
        |UNION ALL
        |SELECT 'zorder' AS layout,
        |  CAST((SELECT count(*) FROM zc) AS BIGINT) AS files_total,
        |  CAST((SELECT count(*) FROM zc WHERE mbx < 4 AND mby < 4) AS BIGINT)
        |    AS files_read,
        |  n_rows, sum_qty FROM q
        |ORDER BY layout""".stripMargin,
    // the same xy2d rounds as src_hilbert_cluster, then the same
    // prune-and-verify shape as src_zorder_skipping: the unpruned
    // center-window aggregate plus both layouts' file counts re-derived
    // from per-file bucket extrema (bucket(min/max key) = the file's
    // bucket box, buckets being monotone)
    "src_hilbert_skipping" ->
      """WITH ext AS (
        |  SELECT max(l_partkey) AS maxp, max(l_suppkey) AS maxs FROM lineitem),
        |b0 AS (
        |  SELECT l_quantity,
        |    CAST((l_partkey * 16) // (maxp + 1) AS INT) AS bxx,
        |    CAST((l_suppkey * 16) // (maxs + 1) AS INT) AS byy
        |  FROM lineitem, ext),
        |z0 AS (
        |  SELECT bxx, byy,
        |    (bxx % 2) * 1 + (byy % 2) * 2 +
        |    ((bxx // 2) % 2) * 4 + ((byy // 2) % 2) * 8 +
        |    ((bxx // 4) % 2) * 16 + ((byy // 4) % 2) * 32 +
        |    ((bxx // 8) % 2) * 64 + ((byy // 8) % 2) * 128 AS zv,
        |    bxx AS hx, byy AS hy, 0 AS hd
        |  FROM b0),
        |r8 AS (
        |  SELECT bxx, byy, zv,
        |    CASE WHEN ry = 1 THEN hx WHEN rx = 0 THEN hy ELSE 15 - hy END AS hx,
        |    CASE WHEN ry = 1 THEN hy WHEN rx = 0 THEN hx ELSE 15 - hx END AS hy,
        |    hd + 64 * (3 * rx + ry - 2 * rx * ry) AS hd
        |  FROM (SELECT *, CAST((hx // 8) % 2 AS INT) AS rx,
        |               CAST((hy // 8) % 2 AS INT) AS ry FROM z0) t8),
        |r4 AS (
        |  SELECT bxx, byy, zv,
        |    CASE WHEN ry = 1 THEN hx WHEN rx = 0 THEN hy ELSE 15 - hy END AS hx,
        |    CASE WHEN ry = 1 THEN hy WHEN rx = 0 THEN hx ELSE 15 - hx END AS hy,
        |    hd + 16 * (3 * rx + ry - 2 * rx * ry) AS hd
        |  FROM (SELECT *, CAST((hx // 4) % 2 AS INT) AS rx,
        |               CAST((hy // 4) % 2 AS INT) AS ry FROM r8) t4),
        |r2 AS (
        |  SELECT bxx, byy, zv,
        |    CASE WHEN ry = 1 THEN hx WHEN rx = 0 THEN hy ELSE 15 - hy END AS hx,
        |    CASE WHEN ry = 1 THEN hy WHEN rx = 0 THEN hx ELSE 15 - hx END AS hy,
        |    hd + 4 * (3 * rx + ry - 2 * rx * ry) AS hd
        |  FROM (SELECT *, CAST((hx // 2) % 2 AS INT) AS rx,
        |               CAST((hy // 2) % 2 AS INT) AS ry FROM r4) t2),
        |r1 AS (
        |  SELECT bxx, byy, zv,
        |    hd + (3 * (hx % 2) + (hy % 2) - 2 * (hx % 2) * (hy % 2)) AS hd
        |  FROM r2),
        |q AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |         CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        |  FROM b0 WHERE bxx BETWEEN 6 AND 9 AND byy BETWEEN 6 AND 9),
        |hc AS (
        |  SELECT hd // 24 AS f, min(bxx) AS mnx, max(bxx) AS mxx,
        |         min(byy) AS mny, max(byy) AS mxy
        |  FROM r1 GROUP BY 1),
        |zc AS (
        |  SELECT zv // 24 AS f, min(bxx) AS mnx, max(bxx) AS mxx,
        |         min(byy) AS mny, max(byy) AS mxy
        |  FROM r1 GROUP BY 1)
        |SELECT 'hilbert24' AS layout,
        |  CAST((SELECT count(*) FROM hc) AS BIGINT) AS files_total,
        |  CAST((SELECT count(*) FROM hc
        |        WHERE mnx <= 9 AND mxx >= 6 AND mny <= 9 AND mxy >= 6) AS BIGINT)
        |    AS files_read,
        |  n_rows, sum_qty FROM q
        |UNION ALL
        |SELECT 'zorder24' AS layout,
        |  CAST((SELECT count(*) FROM zc) AS BIGINT) AS files_total,
        |  CAST((SELECT count(*) FROM zc
        |        WHERE mnx <= 9 AND mxx >= 6 AND mny <= 9 AND mxy >= 6) AS BIGINT)
        |    AS files_read,
        |  n_rows, sum_qty FROM q
        |ORDER BY layout""".stripMargin,
    // current = version 3 (whole table), previous = version 2 (two
    // thirds) — both re-derived from the base table, covering the kept
    // predecessor's bytes and previousVersion's resolution
    "src_snapshot_history" ->
      """WITH cur AS (
        |  SELECT 'current' AS snap, user_id, count(*) AS n_events,
        |         CAST(3 AS BIGINT) AS version
        |  FROM events GROUP BY user_id),
        |prev AS (
        |  SELECT 'previous' AS snap, user_id, count(*) AS n_events,
        |         CAST(2 AS BIGINT) AS version
        |  FROM events WHERE event_id % 3 < 2 GROUP BY user_id)
        |SELECT * FROM cur UNION ALL SELECT * FROM prev
        |ORDER BY snap, user_id""".stripMargin,
    // census over the post-delete snapshot: the oracle recomputes it
    // from the base table under the forget predicate, so a surviving
    // forgotten row or a lost innocent one hash-mismatches
    "src_forget_user" ->
      s"""SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_val
         |FROM events WHERE user_id % $ForgetModulus <> 0
         |GROUP BY event_type ORDER BY event_type""".stripMargin,
    // the post-reclaim census re-derived from the base table under the
    // forget predicate; the three protocol claims are constants by
    // contract — exactly one version on disk, lineage severed, zero
    // forgotten rows in the surviving bytes (the scan-side counter)
    "src_forget_gc" ->
      s"""SELECT CAST(1 AS BIGINT) AS versions_remaining,
         |  CAST(1 AS BIGINT) AS predecessor_gone,
         |  CAST(0 AS BIGINT) AS forgotten_in_current,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_val
         |FROM events WHERE user_id % $ForgetModulus <> 0""".stripMargin,
    // the prune test re-derived from per-bucket extrema (the manifest),
    // the census from the forget predicate: one file too many or too
    // few rewritten, or one row lost/kept wrongly, hash-mismatches
    "src_forget_pruned" ->
      s"""WITH ext AS (SELECT max(user_id) AS maxu FROM events),
         |b AS (SELECT user_id, value,
         |        CAST((user_id * 16) // (maxu + 1) AS INT) AS ub,
         |        CAST((user_id * 32) // (maxu + 1) AS INT) AS ub32
         |      FROM events, ext),
         |st AS (SELECT ub, min(user_id) AS lo, max(user_id) AS hi
         |       FROM b GROUP BY ub),
         |fb AS (SELECT (maxu * 32) // (maxu + 1) AS fb32 FROM ext),
         |rw AS (SELECT st.ub FROM st, ext, fb
         |       WHERE (hi * 32) // (maxu + 1) >= fb32
         |         AND (lo * 32) // (maxu + 1) <= fb32),
         |kept AS (SELECT b.* FROM b, fb WHERE ub32 <> fb32)
         |SELECT CAST((SELECT count(*) FROM st) AS BIGINT) AS files_total,
         |  CAST((SELECT count(*) FROM rw) AS BIGINT) AS files_rewritten,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_val
         |FROM kept""".stripMargin,
    // final snapshot = version 3 = the per-user census of the WHOLE table
    "src_snapshot_reader" ->
      """SELECT user_id, count(*) AS n_events, CAST(3 AS BIGINT) AS version
        |FROM events
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "src_compaction" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_ids
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "src_text_roundtrip" ->
      """WITH l AS (SELECT length(text) AS len FROM documents)
        |SELECT len // 100 AS len_bucket,
        |  CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(len) AS BIGINT) AS char_sum
        |FROM l GROUP BY 1 ORDER BY len_bucket""".stripMargin,
    // the quarantine boundary re-derived from the synthesis arithmetic
    "src_csv_malformed" ->
      s"""SELECT count(*) AS n_rows,
         |  CAST(sum(CASE WHEN i % $MalformedEvery = 0 THEN 0 ELSE 1 END)
         |    AS BIGINT) AS n_good,
         |  CAST(sum(CASE WHEN i % $MalformedEvery = 0 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_bad,
         |  CAST(sum(CASE WHEN i % $MalformedEvery = 0 THEN 0 ELSE i * 3 END)
         |    AS BIGINT) AS sum_val
         |FROM range(0, $MalformedRows) t(i)""".stripMargin,
    "src_json_malformed" ->
      s"""SELECT count(*) AS n_rows,
         |  CAST(sum(CASE WHEN i % $MalformedEvery = 0 THEN 0 ELSE 1 END)
         |    AS BIGINT) AS n_good,
         |  CAST(sum(CASE WHEN i % $MalformedEvery = 0 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_bad,
         |  CAST(sum(CASE WHEN i % $MalformedEvery = 0 THEN 0 ELSE i * 3 END)
         |    AS BIGINT) AS sum_val
         |FROM range(0, $MalformedRows) t(i)""".stripMargin,
    // the dim assigns exactly {en, zh} to the surviving tier, so the
    // join degenerates to a partition-column IN — what DPP prunes to
    "src_dpp_join" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE lang IN ('en', 'zh')
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "src_runtime_filter" ->
      """SELECT o_orderpriority, count(*) AS n_lines,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "src_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n_lines,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // even doc_ids predate the source column -> NULL after the merge
    "src_schema_evolution" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_with_source,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "src_partitioned_scan" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE lang = 'en'
        |GROUP BY source ORDER BY source""".stripMargin,
    "src_orc_roundtrip" -> pricingSql,
    "src_zstd_roundtrip" -> pricingSql,
    "src_csv_roundtrip" -> pricingSql,
    "src_json_roundtrip" -> pricingSql,
    // the connector's arithmetic reproduced from range(): same Knuth
    // multiplicative hash in exact BIGINT, same decimal-summed doubles
    "src_dsv2_scan" ->
      """WITH src AS (
        |  SELECT (i * 2654435761) % 2147483648 AS h
        |  FROM range(0, 100000) t(i))
        |SELECT CAST(h % 16 AS INTEGER) AS bucket, count(*) AS cnt,
        |  CAST(sum(CAST(CAST(h % 1000 AS DOUBLE) / 1000.0 AS DECIMAL(18,6))) AS DOUBLE) AS sum_score
        |FROM src GROUP BY bucket ORDER BY bucket""".stripMargin,
    // the write face: overwrite lands [0, base), append adds
    // [base, base+append) — the oracle re-derives the union from range()
    // arithmetic, so the codec round-trip and the manifest accumulation
    // are both under the hash without DuckDB reading the custom format
    "src_dsv2_write" ->
      s"""WITH src AS (
         |  SELECT (i * 2654435761) % 2147483648 AS h
         |  FROM range(0, ${Dsv2WriteBase + Dsv2WriteAppend}) t(i))
         |SELECT CAST(h % 16 AS INTEGER) AS bucket, count(*) AS cnt,
         |  CAST(sum(CAST(CAST(h % 1000 AS DOUBLE) / 1000.0 AS DECIMAL(18,6))) AS DOUBLE) AS sum_score
         |FROM src GROUP BY bucket ORDER BY bucket""".stripMargin,
    // compaction must not change a row: the write-face oracle verbatim
    "src_dsv2_compact" ->
      s"""WITH src AS (
         |  SELECT (i * 2654435761) % 2147483648 AS h
         |  FROM range(0, ${Dsv2WriteBase + Dsv2WriteAppend}) t(i))
         |SELECT CAST(h % 16 AS INTEGER) AS bucket, count(*) AS cnt,
         |  CAST(sum(CAST(CAST(h % 1000 AS DOUBLE) / 1000.0 AS DECIMAL(18,6))) AS DOUBLE) AS sum_score
         |FROM src GROUP BY bucket ORDER BY bucket""".stripMargin,
    // the survivor set after DELETE WHERE bucket = 3, re-derived from
    // the same arithmetic
    "src_dsv2_delete" ->
      s"""WITH src AS (
         |  SELECT (i * 2654435761) % 2147483648 AS h
         |  FROM range(0, ${Dsv2WriteBase + Dsv2WriteAppend}) t(i))
         |SELECT CAST(h % 16 AS INTEGER) AS bucket, count(*) AS cnt,
         |  CAST(sum(CAST(CAST(h % 1000 AS DOUBLE) / 1000.0 AS DECIMAL(18,6))) AS DOUBLE) AS sum_score
         |FROM src WHERE h % 16 <> 3 GROUP BY bucket ORDER BY bucket""".stripMargin,
    // past = the overwrite snapshot [0, base); current = base + append —
    // a time-travel read that leaks or loses an appended row mismatches
    "src_dsv2_time_travel" ->
      s"""WITH cur AS (
         |  SELECT (i * 2654435761) % 2147483648 AS h, i
         |  FROM range(0, ${Dsv2WriteBase + Dsv2WriteAppend}) t(i))
         |SELECT 'current' AS snap, CAST(h % 16 AS INTEGER) AS bucket,
         |  count(*) AS cnt,
         |  CAST(sum(CAST(CAST(h % 1000 AS DOUBLE) / 1000.0 AS DECIMAL(18,6))) AS DOUBLE) AS sum_score
         |FROM cur GROUP BY 2
         |UNION ALL
         |SELECT 'past' AS snap, CAST(h % 16 AS INTEGER) AS bucket,
         |  count(*) AS cnt,
         |  CAST(sum(CAST(CAST(h % 1000 AS DOUBLE) / 1000.0 AS DECIMAL(18,6))) AS DOUBLE) AS sum_score
         |FROM cur WHERE i < $Dsv2WriteBase GROUP BY 2
         |ORDER BY snap, bucket""".stripMargin,
    // the TIMESTAMP AS OF twin: same two snapshots, resolved by the
    // first commit's own publish instant instead of its seq
    "src_dsv2_time_travel_ts" ->
      s"""WITH cur AS (
         |  SELECT (i * 2654435761) % 2147483648 AS h, i
         |  FROM range(0, ${Dsv2WriteBase + Dsv2WriteAppend}) t(i))
         |SELECT 'current' AS snap, CAST(h % 16 AS INTEGER) AS bucket,
         |  count(*) AS cnt,
         |  CAST(sum(CAST(CAST(h % 1000 AS DOUBLE) / 1000.0 AS DECIMAL(18,6))) AS DOUBLE) AS sum_score
         |FROM cur GROUP BY 2
         |UNION ALL
         |SELECT 'past' AS snap, CAST(h % 16 AS INTEGER) AS bucket,
         |  count(*) AS cnt,
         |  CAST(sum(CAST(CAST(h % 1000 AS DOUBLE) / 1000.0 AS DECIMAL(18,6))) AS DOUBLE) AS sum_score
         |FROM cur WHERE i < $Dsv2WriteBase GROUP BY 2
         |ORDER BY snap, bucket""".stripMargin,
    // file skipping prunes the pre-9000 batches at planning time; the
    // oracle gates the SURVIVING range's aggregate, so a non-conservative
    // skip (a lost row) breaks the hash and the query's own files=K/N
    // require breaks a skip-nothing regression
    "src_dsv2_skipping" ->
      """WITH src AS (
        |  SELECT (i * 2654435761) % 2147483648 AS h
        |  FROM range(9000, 12000) t(i))
        |SELECT CAST(h % 16 AS INTEGER) AS bucket, count(*) AS cnt,
        |  CAST(sum(CAST(CAST(h % 1000 AS DOUBLE) / 1000.0 AS DECIMAL(18,6))) AS DOUBLE) AS sum_score
        |FROM src GROUP BY bucket ORDER BY bucket""".stripMargin,
    // the 16-row graft dimension joined to the 100k derived fact — the
    // query itself requires the unhinted BroadcastHashJoin; the oracle
    // gates the join arithmetic
    "src_dsv2_stats_join" ->
      """WITH f AS (
        |  SELECT (i * 2654435761) % 2147483648 AS h
        |  FROM range(0, 100000) t(i)),
        |d AS (
        |  SELECT CAST(i AS INTEGER) AS bucket,
        |    CASE WHEN i < 4 THEN 'hot' WHEN i < 10 THEN 'warm' ELSE 'cold' END AS tier
        |  FROM range(0, 16) t(i))
        |SELECT d.tier, count(*) AS cnt,
        |  CAST(sum(CAST(CAST(f.h % 1000 AS DOUBLE) / 1000.0 AS DECIMAL(18,6))) AS DOUBLE) AS sum_score
        |FROM f JOIN d ON CAST(f.h % 16 AS INTEGER) = d.bucket
        |GROUP BY d.tier ORDER BY d.tier""".stripMargin,
    // UPDATE ... WHERE bucket = 3 adds 1.0 to the matched rows' scores —
    // the oracle re-derives the post-update table from the arithmetic
    "src_dsv2_update" ->
      s"""WITH src AS (
         |  SELECT (i * 2654435761) % 2147483648 AS h
         |  FROM range(0, ${Dsv2WriteBase + Dsv2WriteAppend}) t(i))
         |SELECT CAST(h % 16 AS INTEGER) AS bucket, count(*) AS cnt,
         |  CAST(sum(CAST(CAST(h % 1000 AS DOUBLE) / 1000.0
         |    + CASE WHEN h % 16 = 3 THEN 1.0 ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE) AS sum_score
         |FROM src GROUP BY bucket ORDER BY bucket""".stripMargin,
    // MERGE regimes: [0,6000) untouched, [6000,12000) matched (score
    // doubles), [12000,18000) inserted — re-derived from the arithmetic
    "src_dsv2_merge" ->
      """WITH src AS (
        |  SELECT i, (i * 2654435761) % 2147483648 AS h
        |  FROM range(0, 18000) t(i))
        |SELECT CAST(h % 16 AS INTEGER) AS bucket, count(*) AS cnt,
        |  CAST(sum(CAST(CAST(h % 1000 AS DOUBLE) / 1000.0
        |    * CASE WHEN i >= 6000 AND i < 12000 THEN 2.0 ELSE 1.0 END AS DECIMAL(18,6))) AS DOUBLE) AS sum_score
        |FROM src GROUP BY bucket ORDER BY bucket""".stripMargin,
    // OPTIMIZE must not change a row: the write-face oracle verbatim
    "src_dsv2_optimize" ->
      s"""WITH src AS (
         |  SELECT (i * 2654435761) % 2147483648 AS h
         |  FROM range(0, ${Dsv2WriteBase + Dsv2WriteAppend}) t(i))
         |SELECT CAST(h % 16 AS INTEGER) AS bucket, count(*) AS cnt,
         |  CAST(sum(CAST(CAST(h % 1000 AS DOUBLE) / 1000.0 AS DECIMAL(18,6))) AS DOUBLE) AS sum_score
         |FROM src GROUP BY bucket ORDER BY bucket""".stripMargin,
    // the striped-then-sorted table holds exactly the [0,12000) id set
    // at every step; the gated aggregate is the surviving range, same
    // shape as the skipping oracle
    "src_dsv2_cluster" ->
      """WITH src AS (
        |  SELECT (i * 2654435761) % 2147483648 AS h
        |  FROM range(9000, 12000) t(i))
        |SELECT CAST(h % 16 AS INTEGER) AS bucket, count(*) AS cnt,
        |  CAST(sum(CAST(CAST(h % 1000 AS DOUBLE) / 1000.0 AS DECIMAL(18,6))) AS DOUBLE) AS sum_score
        |FROM src GROUP BY bucket ORDER BY bucket""".stripMargin,
    // the net change feed over the scripted lifecycle: update pre/post
    // images for the matched bucket-3 rows, deletes for bucket 5,
    // inserts for the append — compaction invisible (asserted in-query)
    "src_dsv2_changes" ->
      """WITH pre AS (
        |  SELECT (i * 2654435761) % 2147483648 AS h
        |  FROM range(0, 12000) t(i)),
        |app AS (
        |  SELECT (i * 2654435761) % 2147483648 AS h
        |  FROM range(12000, 14000) t(i)),
        |changes AS (
        |  SELECT 'update_preimage' AS change_type,
        |    CAST(h % 16 AS INTEGER) AS bucket,
        |    CAST(h % 1000 AS DOUBLE) / 1000.0 AS score
        |  FROM pre WHERE h % 16 = 3
        |  UNION ALL
        |  SELECT 'update_postimage', CAST(h % 16 AS INTEGER),
        |    CAST(h % 1000 AS DOUBLE) / 1000.0 + 1.0
        |  FROM pre WHERE h % 16 = 3
        |  UNION ALL
        |  SELECT 'delete', CAST(h % 16 AS INTEGER),
        |    CAST(h % 1000 AS DOUBLE) / 1000.0
        |  FROM pre WHERE h % 16 = 5
        |  UNION ALL
        |  SELECT 'insert', CAST(h % 16 AS INTEGER),
        |    CAST(h % 1000 AS DOUBLE) / 1000.0
        |  FROM app)
        |SELECT change_type, bucket, count(*) AS cnt,
        |  CAST(sum(CAST(score AS DECIMAL(18,6))) AS DOUBLE) AS sum_score
        |FROM changes GROUP BY change_type, bucket
        |ORDER BY change_type, bucket""".stripMargin,
    // violating commits rejected atomically (asserted in-query); the
    // surviving state is the 12k load with the conforming bucket-3 +1.0
    // update — the src_dsv2_update shape on the 12k base
    "src_dsv2_constraint" ->
      """WITH src AS (
        |  SELECT (i * 2654435761) % 2147483648 AS h
        |  FROM range(0, 12000) t(i))
        |SELECT CAST(h % 16 AS INTEGER) AS bucket, count(*) AS cnt,
        |  CAST(sum(CAST(CAST(h % 1000 AS DOUBLE) / 1000.0
        |    + CASE WHEN h % 16 = 3 THEN 1.0 ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE) AS sum_score
        |FROM src GROUP BY bucket ORDER BY bucket""".stripMargin,
    // survivors after the two masked ranges, materialized by OPTIMIZE
    // (in-query asserts pin the zero-rewrite and mask accounting)
    "src_dsv2_dv_delete" ->
      """WITH src AS (
        |  SELECT (i * 2654435761) % 2147483648 AS h
        |  FROM range(0, 12000) t(i)
        |  WHERE (i < 4000 OR i >= 5000) AND (i < 9000 OR i >= 9500))
        |SELECT CAST(h % 16 AS INTEGER) AS bucket, count(*) AS cnt,
        |  CAST(sum(CAST(CAST(h % 1000 AS DOUBLE) / 1000.0 AS DECIMAL(18,6))) AS DOUBLE) AS sum_score
        |FROM src GROUP BY bucket ORDER BY bucket""".stripMargin,
    // per-commit delta deletes: seq 2 masks [4000,5000), seq 3 masks
    // only the NEWLY masked [4500,6000) minus the already-dead overlap
    "src_dsv2_dv_changes" ->
      """WITH d AS (
        |  SELECT 2 AS seq, (i * 2654435761) % 2147483648 AS h
        |  FROM range(4000, 5000) t(i)
        |  UNION ALL
        |  SELECT 3, (i * 2654435761) % 2147483648
        |  FROM range(5000, 6000) t(i))
        |SELECT 'delete' AS change_type, CAST(seq AS BIGINT) AS seq,
        |  CAST(h % 16 AS INTEGER) AS bucket, count(*) AS cnt,
        |  CAST(sum(CAST(CAST(h % 1000 AS DOUBLE) / 1000.0 AS DECIMAL(18,6))) AS DOUBLE) AS sum_score
        |FROM d GROUP BY change_type, seq, bucket
        |ORDER BY change_type, seq, bucket""".stripMargin,
    // the z-ordered rewrite is content-identical: the box aggregate is
    // plain arithmetic over the surviving (id, score) region
    "src_dsv2_zorder" ->
      """WITH src AS (
        |  SELECT i AS id, (i * 2654435761) % 2147483648 AS h
        |  FROM range(0, 12000) t(i))
        |SELECT CAST(h % 16 AS INTEGER) AS bucket, count(*) AS cnt,
        |  CAST(sum(CAST(CAST(h % 1000 AS DOUBLE) / 1000.0 AS DECIMAL(18,6))) AS DOUBLE) AS sum_score
        |FROM src
        |WHERE id >= 9000 AND CAST(h % 1000 AS DOUBLE) / 1000.0 < 0.1
        |GROUP BY bucket ORDER BY bucket""".stripMargin,
    // two schema eras: [0,6000) written pre-ALTER (score NULL via the
    // width ledger), [6000,12000) post-ALTER with real scores
    "src_dsv2_evolve" ->
      """WITH src AS (
        |  SELECT i, (i * 2654435761) % 2147483648 AS h
        |  FROM range(0, 12000) t(i))
        |SELECT CAST(h % 16 AS INTEGER) AS bucket, count(*) AS cnt,
        |  CAST(count(CASE WHEN i >= 6000 THEN 1 END) AS BIGINT) AS cnt_scored,
        |  CAST(sum(CAST(CASE WHEN i >= 6000 THEN CAST(h % 1000 AS DOUBLE) / 1000.0 ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE) AS sum_score
        |FROM src GROUP BY bucket ORDER BY bucket""".stripMargin)
}
