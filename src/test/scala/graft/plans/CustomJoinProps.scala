package graft.plans

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property-based equivalence of the custom join tiers against the
  * built-in compositions they replace, on ADVERSARIAL random data the
  * event fixture cannot produce: tiny key/time domains (heavy key
  * collisions, repeated times, back-to-back intervals), nulls in keys
  * and times, empty sides, degenerate (point) intervals. Few cases —
  * each runs two Spark jobs — maximally hostile shapes. */
object CustomJoinProps extends Properties("CustomJoins") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withMaxDiscardRatio(10)

  private lazy val spark = graft.TestSpark.spark

  private def mkNullable(g: Gen[Long]): Gen[java.lang.Long] =
    Gen.frequency(9 -> g.map(java.lang.Long.valueOf),
      1 -> Gen.const(null.asInstanceOf[java.lang.Long]))

  // (key?, time?) pairs on tiny domains; the unique id is appended after
  private val sideGen: Gen[List[(java.lang.Long, java.lang.Long)]] = for {
    n <- Gen.choose(0, 120)
    rows <- Gen.listOfN(n, for {
      k <- mkNullable(Gen.choose(0L, 4L))  // 5 keys -> deep collisions
      t <- mkNullable(Gen.choose(0L, 20L)) // 21 times -> heavy ties
    } yield (k, t))
  } yield rows

  property("as-of == range join + per-left max on hostile random data") =
    Prop.forAll(sideGen, sideGen) { (ls, rs) =>
      import spark.implicits._
      val left = ls.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
        .toDF("lk", "lt", "lid")
      // dedup right per (key, time) so the as-of match is unique (the
      // registered-query discipline); keep max rid as the payload
      val right = rs.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
        .toDF("rk", "rt", "rid0")
        .groupBy("rk", "rt").agg(max("rid0").as("rid"))
      val got = AsOf.join(left, right, Seq("lk" -> "rk"), "lt", "rt")
        .select(col("lid"), col("rid")).orderBy("lid")
        .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toSeq

      val best = left.join(right,
          left("lk") === right("rk") && right("rt") <= left("lt"))
        .groupBy("lid").agg(max(struct(col("rt"), col("rid"))).as("m"))
      val expected = left.join(best, Seq("lid"), "left")
        .select(col("lid"), col("m.rid"))
        .orderBy("lid")
        .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toSeq
      got == expected
    }

  // intervals as (key?, start?, width) — width 0..3 makes point and
  // touching intervals common
  private val ivlGen: Gen[List[(java.lang.Long, java.lang.Long, Long)]] = for {
    n <- Gen.choose(0, 80)
    rows <- Gen.listOfN(n, for {
      k <- mkNullable(Gen.choose(0L, 3L))
      s <- mkNullable(Gen.choose(0L, 15L))
      w <- Gen.choose(0L, 3L)
    } yield (k, s, w))
  } yield rows

  property("interval sweep == equi-join + overlap filter on hostile random data") =
    Prop.forAll(ivlGen, ivlGen) { (ls, rs) =>
      import spark.implicits._
      def side(rows: List[(java.lang.Long, java.lang.Long, Long)], p: String) =
        rows.zipWithIndex.map { case ((k, s, w), i) =>
          val e = if (s == null) null
            else java.lang.Long.valueOf(s.longValue() + w)
          (k, s, e, i.toLong)
        }.toDF(s"${p}k", s"${p}s", s"${p}e", s"${p}id")
      val left = side(ls, "l")
      val right = side(rs, "r")
      val got = Interval.join(left, right, Seq("lk" -> "rk"),
          ("ls", "le"), ("rs", "re"))
        .select(col("lid"), col("rid")).orderBy("lid", "rid")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

      val expected = left.join(right,
          left("lk") === right("rk") &&
            right("rs") <= left("le") && right("re") >= left("ls"))
        .select(col("lid"), col("rid")).orderBy("lid", "rid")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      got == expected
    }
}
