package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}
import scala.util.Random

/** Property-based invariants of the MinHash signature kernel — the set
  * semantics every dedup-family claim rests on: the signature depends on
  * the DISTINCT token set only, so duplication, reordering, and extra
  * whitespace can never change an LSH bucket. Pure JVM. */
object TextHashesProps extends Properties("TextHashes") {

  private val Seeds = 8
  private val Band = 2

  private def sig(text: String, bandWidth: Int = 0): Seq[String] = {
    val arr = TextHashes.minhashSignature(
      UTF8String.fromString(text), Seeds, bandWidth)
    if (arr == null) null
    else (0 until arr.numElements()).map(arr.getUTF8String(_).toString)
  }

  private val tokenGen: Gen[String] = for {
    n <- Gen.choose(1, 6)
    cs <- Gen.listOfN(n, Gen.frequency(8 -> Gen.alphaNumChar,
      1 -> Gen.oneOf('é', '中')))
  } yield cs.mkString

  private val docGen: Gen[(List[String], Long)] = for {
    toks <- Gen.listOf(tokenGen)
    seed <- Gen.choose(Long.MinValue, Long.MaxValue)
  } yield (toks, seed)

  property("set semantics: reorder + duplicate + extra spaces preserve the signature") =
    Prop.forAll(docGen) { case (toks, seed) =>
      val rnd = new Random(seed)
      val scrambled = rnd.shuffle(toks ++ rnd.shuffle(toks).take(toks.length / 2))
      val a = sig(toks.mkString(" "))
      val b = sig(scrambled.mkString("  ") + " ")
      a == b
    }

  property("monotone under union: a superset's per-seed min never increases") =
    Prop.forAll(docGen, tokenGen) { case ((toks, _), extra) =>
      val base = toks.mkString(" ")
      val sup = (extra :: toks).mkString(" ")
      val (a, b) = (sig(base), sig(sup))
      a == null || (0 until Seeds).forall(j => b(j) <= a(j))
    }

  property("banding is a pure regrouping of the raw signature") =
    Prop.forAll(docGen) { case (toks, _) =>
      val raw = sig(toks.mkString(" "))
      val banded = sig(toks.mkString(" "), Band)
      if (raw == null) banded == null
      else banded == raw.grouped(Band).map(_.mkString("|")).toSeq
    }

  property("tokenless text signs to null, matching the aggregate path's empty group") =
    Prop.forAll(Gen.choose(0, 5)) { n => sig(" " * n) == null }
}
