package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties, Test}

/** THE file-skipping soundness invariant, property-tested: for ANY file
  * contents (hostile strings, NaN/±Inf, nulls anywhere, truncation-length
  * strings) and ANY supported filter, `canSkip == true` implies NO row of
  * the file satisfies the filter under the row-level evaluator
  * ([[GraftFilterEval.matches]] — the same three-valued semantics the
  * engine applies). A single counterexample would mean planning-time
  * pruning silently drops matching rows at 100 TB — the one failure mode
  * a skipping index must never have. False POSITIVES (kept files with no
  * match) are allowed by design; this property hunts false negatives.
  * Also: the stats codec round-trips through its manifest encoding on
  * every case, so the on-disk form is under the same property. */
object GraftStatsProps extends Properties("GraftStatsSkip") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(400)

  private val schema = new StructType()
    .add("l", LongType).add("d", DoubleType).add("s", StringType)
    .add("b", BooleanType)

  // string pool crafted around the truncation boundary (MaxStringBound =
  // 64) and the prefix-successor edge (￿ runs)
  private val strPool: Gen[String] = Gen.oneOf(
    Gen.const(""),
    Gen.alphaNumStr.map(_.take(8)),
    Gen.const("k" * 63), Gen.const("k" * 64), Gen.const("k" * 65),
    Gen.const("k" * 64 + "zzz"),
    Gen.const("￿" * 64 + "a"),
    Gen.const("héllo😀" * 12),
    // the UTF-16-vs-UTF-8 divergence class the round's review fix
    // closed: U+E000 sorts ABOVE a supplementary char in UTF-16 code
    // units but BELOW it in UTF-8 bytes — with the Spark-consistent
    // comparator these now exercise both sides of that boundary
    Gen.const(""), Gen.const("😀"), Gen.const("😀"),
    Gen.const("a" * 33), // >64 chars, non-ASCII truncation path
    Gen.listOfN(70, Gen.oneOf('a', 'b', '￿')).map(_.mkString))

  private def opt[A](g: Gen[A]): Gen[Option[A]] =
    Gen.frequency(3 -> g.map(Some(_)), 1 -> Gen.const(None))

  private val cellL: Gen[Option[Long]] =
    opt(Gen.oneOf(Gen.choose(-50L, 50L),
      Gen.oneOf(Long.MinValue, Long.MaxValue, 0L)).flatMap(identity(_)))
  private val cellD: Gen[Option[Double]] =
    opt(Gen.oneOf(0.0, -0.0, 1.5, -2.25, Double.NaN,
      Double.PositiveInfinity, Double.NegativeInfinity, Double.MinPositiveValue))
  private val cellS: Gen[Option[String]] = opt(strPool)
  private val cellB: Gen[Option[Boolean]] = opt(Gen.oneOf(true, false))

  private val rowGen: Gen[(Option[Long], Option[Double], Option[String], Option[Boolean])] =
    for { l <- cellL; d <- cellD; s <- cellS; b <- cellB } yield (l, d, s, b)

  private def toRow(t: (Option[Long], Option[Double], Option[String], Option[Boolean])): InternalRow = {
    val r = new GenericInternalRow(4)
    t._1.foreach(v => r.setLong(0, v)); if (t._1.isEmpty) r.setNullAt(0)
    t._2.foreach(v => r.setDouble(1, v)); if (t._2.isEmpty) r.setNullAt(1)
    t._3.foreach(v => r.update(2, UTF8String.fromString(v))); if (t._3.isEmpty) r.setNullAt(2)
    t._4.foreach(v => r.setBoolean(3, v)); if (t._4.isEmpty) r.setNullAt(3)
    r
  }

  // filter literals mix values LIKELY IN the file (drawn from the same
  // pools) with boundary constants, so both skip and no-skip paths are
  // exercised
  private val litL: Gen[Long] = Gen.oneOf(
    Gen.choose(-60L, 60L), Gen.oneOf(Long.MinValue, Long.MaxValue)).flatMap(identity(_))
  private val litD: Gen[Double] = Gen.oneOf(0.0, -0.0, 1.5, -2.25,
    Double.NaN, Double.PositiveInfinity, 100.0)
  private val litS: Gen[String] = strPool
  private def colLit: Gen[(String, Any)] = Gen.oneOf(
    litL.map(v => ("l", v: Any)),
    litD.map(v => ("d", v: Any)),
    litS.map(v => ("s", v: Any)),
    Gen.oneOf(true, false).map(v => ("b", v: Any)))

  private def leafGen: Gen[Filter] = Gen.oneOf(
    colLit.map { case (a, v) => EqualTo(a, v) },
    colLit.map { case (a, v) => EqualNullSafe(a, v) },
    colLit.map { case (a, v) => GreaterThan(a, v) },
    colLit.map { case (a, v) => GreaterThanOrEqual(a, v) },
    colLit.map { case (a, v) => LessThan(a, v) },
    colLit.map { case (a, v) => LessThanOrEqual(a, v) },
    Gen.listOfN(3, colLit).map(vs =>
      In(vs.head._1, vs.filter(_._1 == vs.head._1).map(_._2).toArray)),
    Gen.oneOf("l", "d", "s", "b").map(IsNull(_)),
    Gen.oneOf("l", "d", "s", "b").map(IsNotNull(_)),
    litS.map(p => StringStartsWith("s", p.take(6))))

  private def filterGen(depth: Int): Gen[Filter] =
    if (depth == 0) leafGen
    else Gen.frequency(
      3 -> leafGen,
      1 -> (for { a <- filterGen(depth - 1); b <- filterGen(depth - 1) } yield And(a, b)),
      1 -> (for { a <- filterGen(depth - 1); b <- filterGen(depth - 1) } yield Or(a, b)))

  property("canSkip==true implies no row matches (after codec round-trip)") =
    Prop.forAll(Gen.listOfN(12, rowGen), filterGen(2)) { (rowsT, f) =>
      val rows = rowsT.map(toRow)
      val collector = new GraftStats.Collector(schema)
      rows.foreach(collector.update)
      // the stats the SCAN sees are the persisted form — round-trip them
      val stats = GraftStats.decode(GraftStats.encode(collector.result()))
      val skip = GraftStatsSkip.canSkip(f, schema, stats, rows.length.toLong)
      val anyMatch = rows.exists(r => GraftFilterEval.matches(f, r, schema))
      Prop(!skip || !anyMatch).label(
        s"filter=$f skip=$skip anyMatch=$anyMatch rows=${rowsT.take(4)}...")
    }

  property("usable filters never crash the evaluator; unusable never skip") =
    Prop.forAll(Gen.listOfN(5, rowGen), filterGen(2)) { (rowsT, f) =>
      val rows = rowsT.map(toRow)
      val collector = new GraftStats.Collector(schema)
      rows.foreach(collector.update)
      val stats = collector.result()
      val skip = GraftStatsSkip.canSkip(f, schema, stats, rows.length.toLong)
      // a filter the usability gate rejects must never claim a skip,
      // and canSkip must be total (no exceptions) either way
      Prop(GraftStatsSkip.usable(f, schema) || !skip)
    }
}
