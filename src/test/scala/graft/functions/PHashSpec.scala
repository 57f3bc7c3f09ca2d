package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** The pHash kernel against a from-first-principles recomputation, plus
  * the property that distinguishes it from the average hash: a uniform
  * shift of every sample (brightness change) lands entirely in the DC
  * coefficient, which the hash skips — so the hash is invariant.
  */
class PHashSpec extends AnyFunSuite {

  private def brute(text: String): Long = {
    import PHashConsts._
    val cps = text.codePoints().toArray
    val p = Array.tabulate(Samples)(k =>
      cps((((cps.length - 1).toLong * k) / (Samples - 1)).toInt).toLong)
    val f = Array.tabulate(Grid, Grid) { (u, v) =>
      (for (x <- 0 until Grid; y <- 0 until Grid)
        yield Dct(u)(x) * Dct(v)(y) * p(x * Grid + y)).sum
    }
    val ac = (for (u <- 0 until Grid; v <- 0 until Grid if u != 0 || v != 0)
      yield f(u)(v)).toArray
    val median = ac.sorted.apply((Samples - 1) / 2)
    ac.zipWithIndex.map { case (c, k) => if (c > median) 1L << k else 0L }.sum
  }

  test("kernel equals the brute-force integer DCT on assorted strings") {
    val texts = Seq("a", "hello world, this is a chunk of text for hashing",
      "aaaaaaaabbbbbbbbccccccccdddddddd" * 4,
      (0 until 200).map(i => ('a' + i % 26).toChar).mkString)
    texts.foreach { t =>
      assert(TextHashes.phash(UTF8String.fromString(t)).longValue() == brute(t), t)
    }
    assert(TextHashes.phash(UTF8String.fromString("")) == null)
  }

  test("uniform sample shift (brightness) leaves the hash unchanged") {
    val base = (0 until 100).map(i => ('A' + (i * 7) % 26).toChar).mkString
    val shifted = base.map(c => (c + 5).toChar).mkString
    val h1 = TextHashes.phash(UTF8String.fromString(base)).longValue()
    val h2 = TextHashes.phash(UTF8String.fromString(shifted)).longValue()
    assert(h1 == h2)
    // and the basis is the advertised fixed-point cosine table
    assert(PHashConsts.Dct(0).forall(_ == 1024L))
    assert(PHashConsts.Dct(1)(0) == math.round(1024 * math.cos(math.Pi / 16)))
  }

  test("contrast scaling flips no bits while structural change does") {
    val base = (0 until 128).map(i => (40 + (i * 13) % 60).toChar).mkString
    // doubling every sample scales every AC coefficient AND the median
    // by 2: strict comparisons are preserved
    val doubled = base.map(c => (c * 2).toChar).mkString
    assert(TextHashes.phash(UTF8String.fromString(base)) ==
      TextHashes.phash(UTF8String.fromString(doubled)))
    // reversing the sample order changes the frequency structure
    val reversed = base.reverse
    assert(TextHashes.phash(UTF8String.fromString(base)) !=
      TextHashes.phash(UTF8String.fromString(reversed)))
  }

  test("4x16 banding is pigeonhole-complete for Hamming <= 3") {
    // any two 63-bit hashes within Hamming 3 share at least one of the
    // four 16-bit bands (3 flipped bits cannot touch 4 disjoint bands)
    def bands(h: Long): Seq[Long] = (0 until 4).map(b => (h >>> (16 * b)) & 0xffffL)
    val h = TextHashes.phash(UTF8String.fromString(
      (0 until 90).map(i => (35 + (i * 11) % 80).toChar).mkString)).longValue()
    val flips = for (a <- 0 until 63; b <- a until 63; c <- b until 63)
      yield h ^ (1L << a) ^ (1L << b) ^ (1L << c)
    flips.foreach { h2 =>
      assert(bands(h).zip(bands(h2)).exists { case (x, y) => x == y })
    }
  }
}
