package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The r17 one-pass LSH bucket collection: [[BottomKLongTuples]]'s
  * buffer laws and [[graft.dedup.Dedup.bucketPairs]]'s equivalence to
  * the count→filter→join-back→self-join spelling it replaced. */
class BottomKSpec extends SparkSpec {

  // ---- pure buffer laws (no session) ----

  private def collect(buf: BottomKBuf): Seq[Seq[Long]] =
    (0 until buf.size).map(s =>
      (0 until buf.arity).map(i => buf.data(s * buf.arity + i)))

  test("buffer keeps exactly the k lexicographically-smallest tuples, sorted") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 200) {
      val arity = 1 + rnd.nextInt(3)
      val k = 1 + rnd.nextInt(10)
      val n = rnd.nextInt(40)
      val tuples = Seq.fill(n)(Array.fill(arity)(rnd.nextInt(8).toLong))
      val buf = new BottomKBuf(arity, k)
      tuples.foreach(t => buf.add(t, 0))
      val expected = tuples.map(_.toSeq).sorted(
        Ordering.Implicits.seqOrdering[Seq, Long]).take(k)
      assert(collect(buf) == expected, s"trial $trial arity=$arity k=$k")
    }
  }

  test("buffer merge law: any split of the input merges to the whole") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 200) {
      val arity = 1 + rnd.nextInt(2)
      val k = 1 + rnd.nextInt(6)
      val n = rnd.nextInt(30)
      val tuples = Seq.fill(n)(Array.fill(arity)(rnd.nextInt(6).toLong))
      val cut = if (n == 0) 0 else rnd.nextInt(n + 1)
      val whole = new BottomKBuf(arity, k)
      tuples.foreach(t => whole.add(t, 0))
      val l = new BottomKBuf(arity, k)
      val r = new BottomKBuf(arity, k)
      tuples.take(cut).foreach(t => l.add(t, 0))
      tuples.drop(cut).foreach(t => r.add(t, 0))
      val agg = BottomKLongTuples(Nil.padTo(arity,
        org.apache.spark.sql.catalyst.expressions.Literal(0L)), k)
      val merged = agg.merge(l, r)
      assert(collect(merged) == collect(whole), s"trial $trial")
    }
  }

  // ---- DataFrame equivalence against the replaced spelling ----

  test("bucketPairs == count-filter-join-self-join spelling on hostile random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    for (trial <- 0 until 5) {
      // small key space forces mega-buckets (> MaxBucket) and singletons
      val rows = Seq.fill(800) {
        val band = rnd.nextInt(3).toLong
        val key = rnd.nextInt(12).toLong
        val doc = rnd.nextInt(500).toLong
        val hash = rnd.nextInt(1 << 16).toLong
        (band, key, doc, hash)
      }.distinct // one row per (band, key, doc): the LSH shape
        .map { case (b, kk, d, h) => (b, kk, d, h) }
      val banded = rows.toDF("band", "key", "doc_id", "h")
      val newPairs = graft.dedup.Dedup.bucketPairs(
          banded, Seq("band", "key"), col("doc_id"), col("h"))
        .select("doc_a", "doc_b", "a_c1", "b_c1")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      // the replaced spelling, verbatim
      val small = banded.groupBy("band", "key")
        .agg(count(lit(1)).as("bsz"))
        .filter(col("bsz").between(2, graft.dedup.Dedup.MaxBucket))
        .select("band", "key")
      val capped = banded.join(small, Seq("band", "key"))
      val oldPairs = capped.alias("a")
        .join(capped.alias("b"),
          col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id"), col("a.h"), col("b.h"))
        .distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(newPairs == oldPairs, s"trial $trial")
    }
  }

  test("null payload fields count toward bucket size but collect nothing") {
    import spark.implicits._
    // bucket of 3 rows, one with a null doc: the old join spelling
    // emitted pairs among the 2 non-null members only (null joins
    // nothing) while the bsz count saw 3 rows
    val banded = Seq(
      (0L, 1L, Some(10L)), (0L, 1L, Some(20L)), (0L, 1L, None)
    ).toDF("band", "key", "doc_id")
      .select(col("band"), col("key"), col("doc_id"))
    val pairs = graft.dedup.Dedup.bucketPairs(
        banded, Seq("band", "key"), col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((10L, 20L)))
  }
}
