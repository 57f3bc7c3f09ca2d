package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** Kernel-level semantics of the native char-entropy expression: entropy
  * from code-point counts in nats, code points (not bytes) as the symbol
  * unit, deterministic summation. The query-level oracle gate
  * (text_entropy) covers the codegen path end to end.
  */
class CharEntropySpec extends AnyFunSuite {

  private def h(s: String): Double = CharEntropy.entropy(UTF8String.fromString(s))

  private def bruteForce(s: String): Double = {
    val cps = s.codePoints().toArray
    if (cps.isEmpty) return 0.0
    val n = cps.length.toDouble
    cps.groupBy(identity).values.map { g =>
      val p = g.length / n
      -p * math.log(p)
    }.sum
  }

  test("uniform-symbol strings hit the closed forms") {
    assert(h("aaaa") == 0.0)
    assert(math.abs(h("ab") - math.log(2)) < 1e-12)
    assert(math.abs(h("abcd") - math.log(4)) < 1e-12)
    assert(h("") == 0.0)
  }

  test("matches the brute-force definition on mixed text") {
    for (s <- Seq("hello world", "the quick brown fox", "aab", "abab",
                  "key agg row scan slow fast table value"))
      assert(math.abs(h(s) - bruteForce(s)) < 1e-12, s)
  }

  test("an emoji is one symbol, not four bytes") {
    // U+1F600 twice + 'a' twice = two symbols, uniform → ln 2
    assert(math.abs(h("😀a😀a") - math.log(2)) < 1e-12)
  }

  test("entropy is insensitive to symbol order (count-based)") {
    assert(h("aabbcc") == h("abcabc"))
    assert(h("abcabc") == h("ccbbaa"))
  }

  test("malformed UTF-8 counts U+FFFD symbols like a validating decoder") {
    def hb(bytes: Array[Byte]): Double = CharEntropy.entropy(UTF8String.fromBytes(bytes))
    // a lead byte followed by a NON-continuation byte must not absorb it:
    // 0xC3 'a' = [FFFD, a] — two distinct symbols → ln 2
    assert(math.abs(hb(Array(0xc3.toByte, 'a'.toByte)) - math.log(2)) < 1e-12)
    // truncated trailing sequence: 'a' then a dangling 3-byte lead
    assert(math.abs(hb(Array('a'.toByte, 0xe2.toByte)) - math.log(2)) < 1e-12)
    // orphan continuation bytes each count as one replacement symbol:
    // [80, 80, 'a'] = two FFFD + one 'a' → counts (2,1)
    val expected = {
      val n = 3.0
      -(2 / n) * math.log(2 / n) - (1 / n) * math.log(1 / n)
    }
    assert(math.abs(hb(Array(0x80.toByte, 0x80.toByte, 'a'.toByte)) - expected) < 1e-12)
    // invalid lead 0xFF resumes at the next byte, not past it
    assert(math.abs(hb(Array(0xff.toByte, 'a'.toByte)) - math.log(2)) < 1e-12)
    // valid multi-byte sequences still decode as single symbols
    assert(math.abs(hb("é€😀".getBytes("UTF-8")) - math.log(3)) < 1e-12)
  }
}
