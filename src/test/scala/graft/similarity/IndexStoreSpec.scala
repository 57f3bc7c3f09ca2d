package graft.similarity

import java.nio.file.{Files, Paths}
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Atomic cross-process publication (round 12): racing builders must
  * collapse to one build, concurrent readers must never observe a torn
  * artifact, and republication (sf change) must leave the superseded
  * version intact for in-flight readers.
  *
  * Pointer-parameterized (round 14, VERDICT r13 #8): the suite runs
  * against the default [[PosixSymlinkPointer]] here and again against
  * [[ManifestFilePointer]] via [[IndexStoreManifestPointerSpec]] — the
  * protocol above the seam must not care how "current" is spelled. The
  * two symlink-ERA migration tests register only under the POSIX
  * pointer: the legacy layouts they seed were only ever produced by
  * symlink-era publishes. */
class IndexStoreSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterAll {

  /** Overridden by the manifest-pointer run of this suite. */
  protected def pointerImpl: SnapshotPointer = PosixSymlinkPointer

  override def beforeAll(): Unit = { IndexStore.pointer = pointerImpl }
  override def afterAll(): Unit = { IndexStore.pointer = PosixSymlinkPointer }

  // cleanup uses the PRODUCTION delete the protocol itself relies on
  private def rmTree(p: java.nio.file.Path): Unit =
    if (Files.exists(p, java.nio.file.LinkOption.NOFOLLOW_LINKS))
      IndexStore.deleteRecursively(p)

  private def wipe(name: String): Unit = {
    val link = Paths.get(IndexStore.Root, name)
    Files.deleteIfExists(link)
    Files.deleteIfExists(Paths.get(IndexStore.Root, s"$name.ptr"))
    Files.deleteIfExists(Paths.get(IndexStore.Root, s"$name.sf"))
    // per-name version subdirectory (round 13 layout) — an exact-path
    // delete, so no prefix-collision hazard with sibling artifact names
    rmTree(Paths.get(IndexStore.Root, ".v", name))
    // legacy flat layout: `<name>-<8hex>-<3hex>` token shape only
    val v = Paths.get(IndexStore.Root, ".v")
    val legacy = java.util.regex.Pattern.compile(
      java.util.regex.Pattern.quote(name) + "-[0-9a-f]{8}-[0-9a-f]{3}")
    if (Files.exists(v)) {
      val listing = Files.list(v)
      try listing.forEach { p =>
        if (legacy.matcher(p.getFileName.toString).matches()) rmTree(p)
      } finally listing.close()
    }
  }

  private def fixture(n: Int, tag: Long) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, i.toLong * 31L + tag)).toDF("id", "v")
  }

  test("racing builders collapse to one build; every read is complete") {
    val name = "spec_race"
    wipe(name)
    val builds = new AtomicInteger(0)
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(4)
    val results = (0 until 4).map { _ =>
      pool.submit(new java.util.concurrent.Callable[Seq[(Long, Long)]] {
        def call(): Seq[(Long, Long)] = {
          start.await()
          val df = IndexStore.ensure(spark, "/tmp/sfA", name) {
            builds.incrementAndGet()
            fixture(200, 7L)
          }
          df.orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
        }
      })
    }
    start.countDown()
    val rows = results.map(_.get(120, TimeUnit.SECONDS))
    pool.shutdown()
    // one winner builds; losers re-check under the lock and read its
    // publication — and every thread sees the same complete 200 rows
    assert(builds.get() == 1, s"expected 1 build, got ${builds.get()}")
    val expected = (0 until 200).map(i => (i.toLong, i.toLong * 31L + 7L))
    rows.foreach(r => assert(r == expected))
  }

  test("readers racing a republish never see a torn or mixed artifact") {
    val name = "spec_swap"
    wipe(name)
    // publish version A (sf /tmp/sfA, tag 1), then hammer reads while a
    // writer republishes for a different sf (tag 2). Every read must be
    // all-tag-1 or all-tag-2, never a mixture or a partial row set.
    IndexStore.ensure(spark, "/tmp/sfA", name)(fixture(300, 1L)).count()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val torn = new java.util.concurrent.atomic.AtomicReference[String](null)
    val reader = new Thread(() => {
      while (!stop.get() && torn.get() == null) {
        // ensure() with EITHER sf never tears; use sfA so the reader
        // only rebuilds if it beats the writer's lock (allowed), and
        // validate shape + single-tag purity of whatever it got. A read
        // that THROWS (the GC-race failure mode this test exists to
        // catch) is itself a torn read — record it, don't die silently.
        try {
          val got = IndexStore.ensure(spark, "/tmp/sfA", name)(fixture(300, 1L))
            .select(col("v") - col("id") * 31L).as("tag")
            .distinct().collect().map(_.getLong(0)).toSeq
          if (got.size != 1 || !Set(1L, 2L).contains(got.head))
            torn.set(s"mixed/torn read: tags=$got")
        } catch {
          case e: Throwable => torn.set(s"reader threw: $e")
        }
      }
    })
    reader.start()
    try {
      (0 until 3).foreach { _ =>
        IndexStore.ensure(spark, "/tmp/sfB", name)(fixture(300, 2L)).count()
        IndexStore.ensure(spark, "/tmp/sfA", name)(fixture(300, 1L)).count()
      }
    } finally {
      stop.set(true)
      reader.join(120000)
    }
    assert(torn.get() == null, String.valueOf(torn.get()))
  }

  test("a deferred reader two republishes behind keeps its files (GC grace)") {
    val name = "spec_grace"
    wipe(name)
    // resolve version 1 lazily — the DataFrame holds the immutable real
    // path but defers its scan until after TWO republishes land
    val deferred = IndexStore.ensure(spark, "/tmp/sfA", name)(fixture(50, 1L))
    IndexStore.ensure(spark, "/tmp/sfB", name)(fixture(50, 2L)).count()
    IndexStore.ensure(spark, "/tmp/sfC", name)(fixture(50, 3L)).count()
    // version 1 is no longer `previous`, but it is younger than the GC
    // grace window, so the deferred scan still finds every file
    val got = deferred.agg(sum("v")).collect()(0).getLong(0)
    assert(got == (0 until 50).map(i => i * 31L + 1L).sum)
    // the oracle's scan SQL is pinned to the RESOLVED immutable version
    // path, not the live symlink — Spark and DuckDB read the same snapshot
    val sql = IndexStore.duckdbScan(name)
    assert(sql.contains("/.v/"), sql)
  }

  test("grace measures SUPERSESSION, not build time: an old current version " +
      "is not born-expired when it falls two republishes behind") {
    val name = "spec_grace_age"
    wipe(name)
    IndexStore.ensure(spark, "/tmp/sfA", name)(fixture(20, 1L)).count()
    // simulate a version that has been CURRENT for 20 minutes (mtime far
    // in the past); without supersession re-stamping, two republishes
    // would GC it instantly — mid-scan for any reader that just resolved it
    val v1 = IndexStore.currentVersion(name).get
    Files.setLastModifiedTime(v1,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 20L * 60L * 1000L))
    val deferred = IndexStore.ensure(spark, "/tmp/sfA", name)(fixture(20, 1L))
    IndexStore.ensure(spark, "/tmp/sfB", name)(fixture(20, 2L)).count()
    IndexStore.ensure(spark, "/tmp/sfC", name)(fixture(20, 3L)).count()
    assert(Files.exists(v1), "v1 was superseded seconds ago — grace must hold")
    assert(deferred.agg(sum("v")).collect()(0).getLong(0)
      == (0 until 20).map(i => i * 31L + 1L).sum)
  }

  test("expired superseded versions are GC'd; current + previous survive") {
    val name = "spec_gc"
    wipe(name)
    val saved = IndexStore.GcGraceMs
    IndexStore.GcGraceMs = 0L // everything superseded is immediately expired
    try {
      IndexStore.ensure(spark, "/tmp/sfA", name)(fixture(10, 1L)).count()
      IndexStore.ensure(spark, "/tmp/sfB", name)(fixture(10, 2L)).count()
      IndexStore.ensure(spark, "/tmp/sfC", name)(fixture(10, 3L)).count()
      val dir = Paths.get(IndexStore.Root, ".v", name)
      val listing = Files.list(dir)
      val n = try listing.count() finally listing.close()
      assert(n == 2, s"expected current + previous, got $n versions")
      // the previous version is kept UNCONDITIONALLY (keep-set by file
      // name), even with a zero grace window
      val current = IndexStore.currentVersion(name).get
      assert(Files.readString(current.resolve(IndexStore.SfMarker)).trim
        == "/tmp/sfC")
    } finally IndexStore.GcGraceMs = saved
  }

  test("sf change invalidates; unchanged sf serves the cached version") {
    val name = "spec_sf"
    wipe(name)
    val builds = new AtomicInteger(0)
    def run(sf: String, tag: Long) =
      IndexStore.ensure(spark, sf, name) { builds.incrementAndGet(); fixture(10, tag) }
        .agg(sum("v")).collect()(0).getLong(0)
    val a1 = run("/tmp/sfA", 5L)
    val a2 = run("/tmp/sfA", 999L) // stale build arg must NOT run
    assert(builds.get() == 1 && a1 == a2, "warm serve must not rebuild")
    val b = run("/tmp/sfB", 6L)
    assert(builds.get() == 2 && b != a1, "sf change must rebuild")
    assert(run("/tmp/sfA", 5L) == a1 && builds.get() == 3)
  }

  test("nonPublishing resolves the current version across an sf mismatch " +
      "without rebuilding; builds only when nothing is published (r15)") {
    val name = "spec_nonpub"
    wipe(name)
    val builds = new AtomicInteger(0)
    def run(sf: String, tag: Long) =
      IndexStore.ensure(spark, sf, name) { builds.incrementAndGet(); fixture(10, tag) }
        .agg(sum("v")).collect()(0).getLong(0)
    // clean slate: non-publishing mode still builds (nothing a concurrent
    // reader could be scanning) and publishes once
    val first = IndexStore.nonPublishing { run("/tmp/sfA", 5L) }
    assert(builds.get() == 1)
    val published = IndexStore.currentVersion(name).get
    // sf MISMATCH under non-publishing: serve the current version as-is —
    // no rebuild, no pointer swap (a concurrent sfA session keeps its data)
    val served = IndexStore.nonPublishing { run("/tmp/sfB", 999L) }
    assert(builds.get() == 1, "non-publishing must not rebuild on sf change")
    assert(served == first, "must serve the published (sfA) content")
    assert(IndexStore.currentVersion(name).get == published,
      "the pointer must not move under non-publishing mode")
    // outside the mode the same sf change rebuilds as always
    val b = run("/tmp/sfB", 6L)
    assert(builds.get() == 2 && b != first)
  }

  if (pointerImpl eq PosixSymlinkPointer)
  test("time travel resolves a legacy flat-layout predecessor (ADVICE r13): " +
      "the first post-migration publish still has a previous version") {
    val name = "spec_prev_legacy"
    wipe(name)
    // seed the pre-round-13 FLAT layout: the published version lives at
    // .v/<name>-<8hex>-<3hex> with the link pointing straight at it
    val legacyVersion = Paths.get(IndexStore.Root, ".v", s"$name-deadbeef-abc")
    fixture(7, 3L).write.mode("overwrite").parquet(legacyVersion.toString)
    Files.writeString(legacyVersion.resolve(IndexStore.SfMarker), "legacy")
    val link = Paths.get(IndexStore.Root, name)
    Files.deleteIfExists(link)
    Files.createSymbolicLink(link, legacyVersion)
    // first post-migration commit records the flat dir as its predecessor;
    // the PrevMarker name then resolves under .v/, not .v/<name>/
    IndexStore.commit(name, "v2")(fixture(7, 4L))
    val prev = IndexStore.previousVersion(name)
    assert(prev.contains(legacyVersion.toRealPath()) ||
      prev.contains(legacyVersion),
      s"expected fallback to the flat-layout predecessor, got $prev")
    // and the kept predecessor's bytes are still scannable
    assert(spark.read.parquet(prev.get.toString)
      .agg(sum("v")).collect()(0).getLong(0)
      == (0 until 7).map(i => i * 31L + 3L).sum)
  }

  if (pointerImpl eq PosixSymlinkPointer)
  test("legacy non-symlink directory layout is migrated, not trusted") {
    val name = "spec_legacy"
    wipe(name)
    // seed the pre-round-12 layout: plain dir + desyncable sidecar marker
    val legacy = Paths.get(IndexStore.Root, name)
    fixture(5, 111L).write.mode("overwrite").parquet(legacy.toString)
    Files.writeString(Paths.get(IndexStore.Root, s"$name.sf"), "/tmp/sfA")
    val got = IndexStore.ensure(spark, "/tmp/sfA", name)(fixture(5, 42L))
      .agg(sum("v")).collect()(0).getLong(0)
    // rebuilt fresh (tag 42), published as a symlink, sidecar gone
    assert(got == (0 until 5).map(i => i * 31L + 42L).sum)
    assert(Files.isSymbolicLink(legacy))
    assert(!Files.exists(Paths.get(IndexStore.Root, s"$name.sf")))
  }
}

/** The ENTIRE suite above, re-run against the object-store pointer
  * spelling ([[ManifestFilePointer]]): a pointer FILE replaced by atomic
  * rename instead of a symlink. Same assertions, untouched — what
  * VERDICT r13 #8 asks the seam to prove. */
class IndexStoreManifestPointerSpec extends IndexStoreSpec {
  override protected def pointerImpl: SnapshotPointer = ManifestFilePointer
}
