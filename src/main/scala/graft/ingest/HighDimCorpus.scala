package graft.ingest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deterministic HIGH-DIMENSIONAL embedding corpus generator (round 14,
  * VERDICT r13 #7): label-clustered vectors at arbitrary dimension, all
  * closed-form arithmetic — no RNG state — so every run (and both
  * engines, were an oracle to want it) derives the identical corpus.
  * The TweetCorpus discipline applied to vectors.
  *
  * Why it exists: the fixture embeddings are 64-dim, where a raw vector
  * is 256 bytes and brute force is cheap; PQ/SQ's compression argument
  * is strongest at 512+ dims — a raw float vector is 2 KiB, while the
  * PQ code stays m bytes and the ADC serve cost stays m lookup-adds per
  * candidate REGARDLESS of dimension. HighDimPqSpec runs the registered
  * PQ pipeline on this corpus at 64 and 512 dims and pins exactly that.
  *
  * Component j of vector i (label l = i % labels):
  * {{{
  *   centroid(l, j) = ((l * 31 + j * 7) % 13) / 13            cluster structure
  *   noise(i, j)    = ((i * 1315423911 + j * 2654435761) % 1000) / 1000 * 0.08
  *   x(i, j)        = centroid + noise                        ∈ [0, 1.08)
  * }}}
  * Separability is an AGGREGATE property, not a per-coordinate one:
  * with D = (Δl·31) mod 13, a coordinate pair's centroid distance is
  * D/13 or (13−D)/13 depending on where j's offset wraps — the
  * per-coordinate minimum is min(D, 13−D)/13, which can be as low as
  * 1/13 ≈ 0.077 (labels 0 ↔ 5 have D = 12), BELOW the 0.08 noise
  * amplitude. But the complementary fraction of coordinates carries
  * the large max(D, 13−D)/13 step (≥ 7/13 when the min is 1/13), so
  * the squared distance summed over d coordinates dwarfs the noise's
  * d·0.08² — that aggregate margin, not any per-coordinate bound, is
  * what makes recall/purity against brute-force truth measure the
  * INDEX, not an unlearnable corpus. (`labels` must stay ≤ 13: l and
  * l+13 would alias to one centroid, Δ distance exactly 0.)
  */
object HighDimCorpus {

  /** Writes `n` vectors of dimension `d` over `labels` clusters as
    * `<out>/embeddings.parquet` — the Tables layout (vec_id BIGINT,
    * embedding ARRAY<FLOAT>, label INT), so every registered similarity
    * query runs against the directory unchanged. Returns `out`. */
  def write(spark: SparkSession, out: String, n: Long, d: Int,
      labels: Int = 8): String = {
    require(d % 4 == 0, s"dim $d must be divisible by the PQ subspace count")
    require(labels <= 13, s"labels=$labels would alias centroids (mod-13 grid)")
    val df = spark.range(n).select(
        col("id").as("vec_id"),
        (col("id") % labels).cast("int").as("label"))
      .withColumn("embedding", expr(
        s"""transform(sequence(0, ${d - 1}), j -> CAST(
           |  ((label * 31 + j * 7) % 13) / 13.0 +
           |  ((vec_id * 1315423911L + j * 2654435761L) % 1000) / 1000.0 * 0.08
           |AS FLOAT))""".stripMargin))
    df.write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    out
  }
}
