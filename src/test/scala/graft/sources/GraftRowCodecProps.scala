package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Round-trip property of the graft table format's row codec: any
  * sequence of rows over the full supported type set — nulls anywhere,
  * empty and multi-byte (non-BMP) strings, empty/large binary, extreme
  * numerics (NaN, ±Inf, MinValue) — decodes byte-for-value identical,
  * with clean EOF after the last row. The write path's atomicity story
  * rests on manifests; the BYTES' story rests here. */
object GraftRowCodecProps extends Properties("GraftRowCodec") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(60)

  private val schema = new StructType()
    .add("b", BooleanType).add("i", IntegerType).add("l", LongType)
    .add("f", FloatType).add("d", DoubleType).add("s", StringType)
    .add("bin", BinaryType).add("dt", DateType).add("ts", TimestampType)
  private val types = schema.fields.map(_.dataType)

  private def nullable[A](g: Gen[A]): Gen[Option[A]] =
    Gen.frequency(4 -> g.map(Some(_)), 1 -> Gen.const(None))

  private val strGen: Gen[String] = Gen.oneOf(
    Gen.const(""),
    Gen.alphaNumStr,
    Gen.const("héllo wörld"),
    Gen.const("emoji 😀🔥 tail"), // non-BMP surrogates
    Gen.listOfN(300, Gen.choose('a', 'z')).map(_.mkString))

  private val rowGen: Gen[Seq[Option[Any]]] = for {
    b <- nullable(Gen.oneOf(true, false))
    i <- nullable(Gen.oneOf(Gen.choose(-100, 100), Gen.oneOf(Int.MinValue, Int.MaxValue)).flatMap(identity(_)))
    l <- nullable(Gen.oneOf(Gen.choose(-100L, 100L), Gen.oneOf(Long.MinValue, Long.MaxValue)).flatMap(identity(_)))
    f <- nullable(Gen.oneOf(0.5f, -1.5f, Float.NaN, Float.PositiveInfinity, Float.MinValue))
    d <- nullable(Gen.oneOf(0.25, -2.75, Double.NaN, Double.NegativeInfinity, Double.MinPositiveValue))
    s <- nullable(strGen)
    bin <- nullable(Gen.oneOf(
      Gen.const(Array.empty[Byte]),
      Gen.listOfN(64, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)).flatMap(identity(_)))
    dt <- nullable(Gen.choose(-30000, 30000)) // days
    ts <- nullable(Gen.choose(-4102444800000000L, 4102444800000000L)) // micros
  } yield Seq(b, i, l, f, d, s, bin, dt, ts)

  private def toInternal(vals: Seq[Option[Any]]): InternalRow = {
    val r = new GenericInternalRow(vals.length)
    vals.zipWithIndex.foreach {
      case (None, i) => r.setNullAt(i)
      case (Some(v), i) => v match {
        case s: String => r.update(i, UTF8String.fromString(s))
        case other => r.update(i, other)
      }
    }
    r
  }

  private def eq(a: Any, b: Any): Boolean = (a, b) match {
    case (null, null) => true
    case (x: Array[Byte], y: Array[Byte]) => x.sameElements(y)
    case (x: Double, y: Double) =>
      java.lang.Double.doubleToLongBits(x) == java.lang.Double.doubleToLongBits(y)
    case (x: Float, y: Float) =>
      java.lang.Float.floatToIntBits(x) == java.lang.Float.floatToIntBits(y)
    case (x, y) => x == y
  }

  property("write-then-read is identity over any row sequence") =
    Prop.forAll(Gen.listOfN(5, rowGen)) { rows =>
      val buf = new ByteArrayOutputStream()
      val out = new DataOutputStream(buf)
      rows.foreach(v => GraftRowCodec.write(out, types, toInternal(v)))
      out.close()
      val in = new DataInputStream(new ByteArrayInputStream(buf.toByteArray))
      val decoded = Iterator.continually(GraftRowCodec.read(in, schema))
        .takeWhile(_ != null).toList
      decoded.length == rows.length &&
        decoded.zip(rows).forall { case (got, want) =>
          want.zipWithIndex.forall { case (w, i) =>
            val g = if (got.isNullAt(i)) null
              else got.get(i, types(i)) match {
                case u: UTF8String => u.toString
                case other => other
              }
            eq(g, w.orNull)
          }
        } && GraftRowCodec.read(in, schema) == null // clean EOF, stays EOF
    }
}
