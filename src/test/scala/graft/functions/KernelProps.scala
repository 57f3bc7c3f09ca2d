package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

/** Property-based invariants of the remaining pure kernels: the moments
  * aggregator's MERGE law (the property that makes it distribute — any
  * split of the input into partial buffers must finish identically) and
  * the perceptual/entropy kernels' bit-width and range contracts. */
object KernelProps extends Properties("Kernels") {

  private val vals: Gen[List[Long]] =
    Gen.listOf(Gen.choose(-1000L, 1000L))

  property("moments merge law: any partition of the input finishes identically") =
    Prop.forAll(vals, Gen.choose(0, 100)) { (xs, cutPct) =>
      val whole = xs.foldLeft(MomentsAgg.zero)(MomentsAgg.reduce)
      val cut = xs.length * cutPct / 100
      val (l, r) = xs.splitAt(cut)
      val merged = MomentsAgg.merge(
        l.foldLeft(MomentsAgg.zero)(MomentsAgg.reduce),
        r.foldLeft(MomentsAgg.zero)(MomentsAgg.reduce))
      MomentsAgg.finish(merged) == MomentsAgg.finish(whole)
    }

  private val text: Gen[String] = for {
    n <- Gen.choose(0, 80)
    cs <- Gen.listOfN(n, Gen.frequency(
      6 -> Gen.alphaNumChar, 1 -> Gen.oneOf('é', '中', ' ')))
  } yield cs.mkString

  property("simhash48 stays within its 48 declared bits") =
    Prop.forAll(text) { s =>
      val h = TextHashes.simhash48(UTF8String.fromString(s))
      h == null || (h.longValue() >>> 48) == 0L
    }

  property("entropy range (nats): |H| <= eps for uniform, else 0 <= H <= ln(distinct)") =
    Prop.forAll(text) { s =>
      val h = CharEntropy.entropy(UTF8String.fromString(s))
      val distinct = s.codePoints().distinct().count()
      // uniform strings: ln(n) - n·ln(n)/n leaves an IEEE residue of a
      // few ulps (possibly negative), so the check is |H| <= eps, not == 0
      if (distinct <= 1) math.abs(h) <= 1e-12
      else h >= -1e-12 && h <= math.log(distinct.toDouble) + 1e-9
    }

  property("entropy is permutation-invariant (depends on the histogram only)") =
    Prop.forAll(text, Gen.choose(Long.MinValue, Long.MaxValue)) { (s, seed) =>
      val shuffled = new scala.util.Random(seed)
        .shuffle(s.toList).mkString
      CharEntropy.entropy(UTF8String.fromString(s)) ==
        CharEntropy.entropy(UTF8String.fromString(shuffled))
    }
}
