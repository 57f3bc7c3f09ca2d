package graft.functions

import org.scalacheck.{Gen, Prop, Properties}

/** Property-based invariants of the Morton-interleave kernel — pure JVM
  * (the same static `interleave16` the generated code links), so the
  * full default case budget runs in milliseconds. */
object ZOrderProps extends Properties("ZOrder") {

  private val coord: Gen[Long] = Gen.choose(0L, 0xffffL)

  /** De-interleave even bit positions back to a 16-bit coordinate. */
  private def unspread16(z: Long): Long = {
    var v = z & 0x55555555L
    v = (v | (v >> 1)) & 0x33333333L
    v = (v | (v >> 2)) & 0x0f0f0f0fL
    v = (v | (v >> 4)) & 0x00ff00ffL
    v = (v | (v >> 8)) & 0x0000ffffL
    v
  }

  property("interleave is invertible: both coordinates recover exactly") =
    Prop.forAll(coord, coord) { (x, y) =>
      val z = ZOrder.interleave16(x, y)
      unspread16(z) == x && unspread16(z >> 1) == y
    }

  property("interleave is injective: distinct points map to distinct keys") =
    Prop.forAll(coord, coord, coord, coord) { (x1, y1, x2, y2) =>
      ((x1, y1) == (x2, y2)) ==
        (ZOrder.interleave16(x1, y1) == ZOrder.interleave16(x2, y2))
    }

  property("z-value is monotone in each coordinate with the other fixed") =
    Prop.forAll(coord, coord, coord) { (x1, x2, y) =>
      val (lo, hi) = (math.min(x1, x2), math.max(x1, x2))
      ZOrder.interleave16(lo, y) <= ZOrder.interleave16(hi, y) &&
        ZOrder.interleave16(y, lo) <= ZOrder.interleave16(y, hi)
    }

  property("masking beyond 16 bits: high bits never leak into the key") =
    Prop.forAll(Gen.choose(Long.MinValue, Long.MaxValue),
      Gen.choose(Long.MinValue, Long.MaxValue)) { (x, y) =>
      ZOrder.interleave16(x, y) ==
        ZOrder.interleave16(x & 0xffffL, y & 0xffffL)
    }
}
