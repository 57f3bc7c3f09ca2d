package graft.ingest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deterministic DOCUMENT corpus generator with planted near-duplicate
  * structure (round 16, VERDICT r15 #5): the [[HighDimCorpus]]
  * discipline applied to text — closed-form arithmetic, no RNG state,
  * generated distributedly from `spark.range` (the driver never holds a
  * row), so the soak can extend the graph-mining trend a decade past
  * the largest driver fixture (sf0.1 = 5,000 docs) without new files
  * under /root/testdata.
  *
  * Structure (doc i, group g = i div 4, member m = i mod 4):
  *  - every 8th group (g ≡ 0 mod 8) is a planted near-dup CLUSTER: its
  *    4 members share a group-keyed 40-word sequence, with member m's
  *    first m positions overwritten by member-unique tokens. Pairwise
  *    token Jaccard ≥ 37/43 ≈ 0.86, so each of the 6 width-2 MinHash
  *    bands hits w.p. ≥ 0.74 and a pair is missed w.p. ≤ 0.26⁶ ≈ 3e-4
  *    — a group disconnects w.p. ≪ 1e-9 (each member has 3 partners).
  *  - every other doc draws all 40 words from a DOC-keyed namespace:
  *    token sets of distinct non-dup docs are DISJOINT, so their
  *    Jaccard is exactly 0 and LSH can emit no spurious pair (md5
  *    collisions aside). That keeps the component census closed-form —
  *    exactly n/32 clusters of exactly 4 docs — at ANY scale, which is
  *    what lets the soak REQUIRE correctness while it measures time.
  *
  * Work volume (tokens, signatures, band rows, candidate pairs, label
  * rows) all scale linearly in n, and component diameter stays 1, so a
  * super-linear soak trend indicts the ENGINE (a shuffle or a plan that
  * stopped scaling), not the corpus.
  */
object DocCorpus {

  /** Writes `n` documents (n divisible by 32) as `<out>/documents.parquet`
    * in the Tables layout (doc_id BIGINT, text, lang, source, n_chars) so
    * every registered dedup/text query runs against the directory
    * unchanged. Returns `out`. */
  def write(spark: SparkSession, out: String, n: Long): String = {
    require(n % 32 == 0, s"n=$n must be divisible by 32 (planted-cluster period)")
    val df = spark.range(n).select(col("id").as("doc_id"))
      .withColumn("g", expr("doc_id div 4"))
      .withColumn("m", col("doc_id") % 4)
      .withColumn("dup", col("g") % 8 === 0)
      .withColumn("text", expr(
        """concat_ws(' ', transform(sequence(0, 39), p ->
          |  CASE
          |    WHEN dup AND p < m THEN concat('u', doc_id, '_', p)
          |    WHEN dup THEN concat('w', g, '_', pmod(g * 1315423911L + p * 2654435761L, 50021))
          |    ELSE concat('d', doc_id, '_', pmod(doc_id * 1315423911L + p * 2654435761L, 50021))
          |  END))""".stripMargin))
      .select(col("doc_id"), col("text"),
        lit("en").as("lang"), lit("synth").as("source"),
        length(col("text")).cast("long").as("n_chars"))
    df.write.mode("overwrite").parquet(s"$out/documents.parquet")
    out
  }
}
