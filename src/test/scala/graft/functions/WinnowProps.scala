package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

/** Property-based guarantees of the winnowing kernel — the MOSS paper's
  * contracts, checked against a brute-force reimplementation on random
  * strings (ASCII and multi-byte). Pure JVM: the kernel is the same
  * static method the generated code links. */
object WinnowProps extends Properties("Winnow") {

  private val K = 4
  private val W = 5

  private def fps(s: String): Seq[Long] = {
    val arr = Winnow.fingerprints(UTF8String.fromString(s), K, W)
    (0 until arr.numElements()).map(arr.getLong)
  }

  /** Brute-force k-gram hashes over UTF-16 code units — the SQL
    * spelling's arithmetic, restated independently. */
  private def grams(s: String): Seq[Long] = {
    val units = s.toCharArray.map(_.toInt)
    (0 to units.length - K).map { i =>
      units.slice(i, i + K).foldLeft(0L)((acc, u) =>
        (acc * Winnow.HashBase + u) % Winnow.HashMod)
    }
  }

  private val textGen: Gen[String] = for {
    n <- Gen.choose(0, 60)
    cs <- Gen.listOfN(n, Gen.frequency(
      6 -> Gen.choose('a', 'd'), // tiny alphabet → repeated grams
      2 -> Gen.choose(' ', '~'),
      1 -> Gen.oneOf('é', 'ü', '中', '文')))
  } yield cs.mkString

  property("every fingerprint is the min of some w-window of gram hashes") =
    Prop.forAll(textGen) { s =>
      val g = grams(s)
      val wins = (0 to g.length - W).map(i => g.slice(i, i + W).min)
      fps(s).forall(wins.contains)
    }

  property("coverage guarantee: every w-window contributes its min") =
    Prop.forAll(textGen) { s =>
      val g = grams(s)
      val f = fps(s).toSet
      (0 to g.length - W).forall(i => f.contains(g.slice(i, i + W).min))
    }

  property("order-preserving dedupe: no adjacent-window duplicates remain") =
    Prop.forAll(textGen) { s =>
      val f = fps(s)
      f.distinct == f
    }

  property("short strings (< k+w-1 units) fingerprint to empty, never throw") =
    Prop.forAll(Gen.choose(0, K + W - 2), Gen.choose('a', 'z')) { (n, c) =>
      fps(c.toString * n).isEmpty
    }
}
