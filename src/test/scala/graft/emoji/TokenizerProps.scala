package graft.emoji

import java.util.regex.Pattern

import org.scalacheck.{Gen, Prop, Properties}

/** Property-based invariants of the strict emoji class (SURVEY.md §5.2).
  * Evaluated against java.util.regex directly — the same engine Spark's
  * RegExpExtractAll uses — so properties run fast without a session. */
object TokenizerProps extends Properties("EmojiClass") {

  private val p = Pattern.compile(EmojiOps.EmojiClass)

  private def extract(s: String): List[String] = {
    val m = p.matcher(s)
    val b = List.newBuilder[String]
    while (m.find()) b += m.group()
    b.result()
  }

  private val emojiGen: Gen[String] = Gen.oneOf(
    Gen.choose(0x1F300, 0x1F5FF), Gen.choose(0x1F600, 0x1F64F),
    Gen.choose(0x1F900, 0x1F9FF)).map(cp => new String(Character.toChars(cp)))

  private val asciiGen: Gen[String] =
    Gen.listOf(Gen.choose(' ', '~')).map(_.mkString)

  private val mixedGen: Gen[List[String]] =
    Gen.listOf(Gen.frequency(3 -> asciiGen, 2 -> emojiGen))

  property("every extracted token is a single code point inside the class") =
    Prop.forAll(mixedGen) { parts =>
      extract(parts.mkString).forall { t =>
        t.codePointCount(0, t.length) == 1 && p.matcher(t).matches()
      }
    }

  property("extraction count equals the number of emoji parts injected") =
    Prop.forAll(mixedGen) { parts =>
      val expected = parts.count(s => s.length == 2 && p.matcher(s).matches())
      extract(parts.mkString).size == expected
    }

  property("extraction is concatenation-homomorphic (single-codepoint class)") =
    Prop.forAll(mixedGen, mixedGen) { (a, b) =>
      extract(a.mkString + b.mkString) == extract(a.mkString) ::: extract(b.mkString)
    }

  property("extraction order preserves input order") =
    Prop.forAll(Gen.listOf(emojiGen)) { es =>
      extract(es.mkString) == es
    }
}
