package graft.similarity

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** GDPR delete propagated into the served ANN artifact (round 17,
  * VERDICT r16 #4): the scrubbed index version contains no forgotten
  * key, the base index still does (proving the anti-join bit), and the
  * version lifecycle holds — the superseded version keeps serving
  * in-flight readers until the pointer swap and is physically unlinked
  * only by a grace-expired gc. */
class IvfForgetSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("the scrubbed index version carries no forgotten key") {
    val out = Similarity.queries("sim_ivf_forget")(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // retrieval never returns a forgotten vector
    assert(rows.forall(r =>
      r.getLong(r.fieldIndex("vec_id")) % Similarity.ForgetVecModulus !=
        Similarity.ForgetVecRemainder))
    // the PERSISTED artifact bytes: scrubbed version has zero forgotten
    // keys, the base index it derived from has some (the delete moved
    // real rows, not vacuously)
    val scrubbed = IndexStore.readCurrent(spark, "ivf_assign_forget")
    val base = IndexStore.readCurrent(spark, "ivf_assign")
    def forgottenCount(df: org.apache.spark.sql.DataFrame): Long =
      df.filter(col("vec_id") % Similarity.ForgetVecModulus ===
        Similarity.ForgetVecRemainder).count()
    assert(forgottenCount(scrubbed) == 0L)
    assert(forgottenCount(base) > 0L)
    // and nothing else was lost: survivors carry over one-for-one
    assert(scrubbed.count() == base.count() - forgottenCount(base))
  }

  test("the superseded index version serves until swap; gc unlinks after grace") {
    import spark.implicits._
    val name = "spec_forget_lifecycle"
    // v1 = the "full" index a reader may be mid-scan on
    val v1 = IndexStore.commit(name, "full") {
      Seq((1L, 0L), (7L, 1L), (12L, 2L)).toDF("vec_id", "cell")
    }
    // an in-flight reader resolves the pointer BEFORE the delete lands
    val resolvedPreSwap = IndexStore.currentVersion(name).get
    assert(resolvedPreSwap == v1)
    // the forget publish: v2 = v1 minus the forgotten keys
    val v2 = IndexStore.commit(name, "forget") {
      spark.read.parquet(v1.toString).filter(col("vec_id") % 10 =!= 7)
    }
    assert(IndexStore.currentVersion(name).get == v2)
    // the old version still EXISTS and still serves the pre-swap reader
    assert(Files.isDirectory(resolvedPreSwap))
    assert(spark.read.parquet(resolvedPreSwap.toString).count() == 3)
    // new readers resolve the scrubbed version
    assert(IndexStore.readCurrent(spark, name).count() == 2)
    // compliance phase: grace expired -> the full version stops existing
    val remaining = IndexStore.gc(name, graceMs = 0L)
    assert(remaining == 1, s"expected only the current version, got $remaining")
    assert(!Files.exists(resolvedPreSwap))
    assert(IndexStore.readCurrent(spark, name).count() == 2)
  }
}
