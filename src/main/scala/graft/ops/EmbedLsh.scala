package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.DotProduct

/** Random-hyperplane LSH over the embedding column — the second ANN scale
  * path next to [[EmbedSim.knnIvf]]'s IVF, per the training-data-pipeline
  * charter ("an IVF or LSH-bucketed variant as the scale path").
  *
  * Sign-random-projection LSH (Charikar's SimHash for vectors): bit i of a
  * vector's signature is `sign(dot(v, h_i))` for a fixed hyperplane h_i; the
  * collision probability of one bit is `1 - angle(a,b)/pi`, so banding
  * B bands of W bits gives near-certain collision for high-cosine pairs and
  * vanishing collision for near-orthogonal ones. That makes it the right
  * tool exactly for NEAR-DUP detection (threshold 0.9 => angle ~26 deg =>
  * per-bit match ~0.86, >=1-of-6 six-bit bands ~0.95+), and the wrong tool
  * for general top-k over this corpus (background neighbors at cos 0.3-0.5
  * collide rarely) — which is why the general-KNN scale path stays IVF.
  *
  * Scale shape: signatures are a shuffle-free projection (B*W native dot
  * products per row, whole-stage codegen'd); candidate generation is ONE
  * shuffle (groupBy bucket) with per-bucket suffix pairing and a hard
  * bucket-size cap (dropped buckets observable via `observe` metrics, same
  * trade as [[TextDedup.candidatePairs]]); verification joins candidates
  * back to the corpus by key — never an all-pairs product.
  *
  * Hyperplanes are deterministic Rademacher vectors (entries +-1 from the
  * low bit of md5("lsh:<plane>:<dim>")) — sign random projections with
  * +-1 entries are a standard LSH family, and exact +-1.0 doubles make the
  * dot products bit-identical in Spark and in the DuckDB oracle, where the
  * same arrays are inlined as literals (see SqlText.embedDupsLsh).
  */
object EmbedLsh {

  /** Hyperplane dimensionality — matches the testdata embedding dim; for
    * wider embeddings regenerate with a larger Dim (DotProduct folds over
    * the shorter of the two arrays, so a mismatch truncates, not crashes).
    */
  val Dim = 64
  val Bands = 6
  val BandBits = 6
  val MaxBucket = 1000

  /** Deterministic Rademacher hyperplanes, plane p component d =
    * +-1.0 by the low bit of md5("lsh:p:d").
    */
  lazy val hyperplanes: IndexedSeq[Array[Double]] =
    (0 until Bands * BandBits).map { p =>
      Array.tabulate(Dim) { d =>
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(s"lsh:$p:$d".getBytes("UTF-8"))
        if ((h(15) & 1) == 1) 1.0 else -1.0
      }
    }

  /** One bucket id per band, encoded band-major: bucket = band * 2^W + key,
    * key = sum of sign bits within the band (bit j set iff
    * dot(emb, h_{band*W+j}) >= 0).
    */
  def bucketCols(emb: Column): Column =
    array((0 until Bands).map { b =>
      (0 until BandBits).map { j =>
        when(DotProduct(emb, lit(hyperplanes(b * BandBits + j))) >= 0,
          lit(1 << j)).otherwise(lit(0))
      }.reduce(_ + _) + lit(b * (1 << BandBits))
    }: _*)

  /** Candidate pairs sharing >= 1 band bucket: one shuffle (groupBy bucket),
    * per-bucket ordered suffix pairing, buckets above `maxBucket` dropped
    * with the drop observable (`emb_lsh_buckets` observe metrics) — pair
    * count is quadratic in bucket size, so one hot bucket (e.g. a
    * zero-vector pileup) must bound, not straggle, the stage.
    */
  def candidatePairs(sigs: DataFrame,
      maxBucket: Int = MaxBucket): DataFrame = {
    val buckets = sigs
      .select(col("vec_id"), explode(col("buckets")).as("bucket"))
      .groupBy(col("bucket"))
      .agg(sort_array(collect_list(col("vec_id"))).as("ids"))
      .observe("emb_lsh_buckets",
        sum(when(size(col("ids")) > maxBucket, 1L).otherwise(0L))
          .as("emb_lsh_dropped_buckets"),
        max(size(col("ids"))).as("emb_lsh_max_bucket"))
    val ids = col("ids")
    val pairs = flatten(transform(ids, (a, i) =>
      transform(slice(ids, i + lit(2), size(ids)),
        b => struct(a.as("vec_a"), b.as("vec_b")))))
    buckets
      .filter(size(ids) <= maxBucket)
      .select(explode(pairs).as("p"))
      .select(col("p.vec_a"), col("p.vec_b"))
      .distinct()
  }

  /** Embedding-cosine near-dup detection over the perturbed corpus
    * ([[EmbedSim.dupCorpus]]), LSH-bucketed: candidates from band-bucket
    * collisions, then exact cosine >= [[EmbedSim.DupThreshold]] verify.
    * Output matches q_embed_dups: (vec_a, vec_b, cos_sim).
    */
  def embedDupsLsh(spark: SparkSession, dir: String): DataFrame =
    embedDupsLshOf(EmbedSim.dupCorpus(spark, dir))

  def embedDupsLshOf(corpus: DataFrame): DataFrame = {
    val sigs = corpus.select(col("vec_id"),
      bucketCols(col("emb")).as("buckets"))
    val cand = candidatePairs(sigs)
    val a = corpus.select(col("vec_id").as("vec_a"), col("emb").as("aemb"),
      col("norm").as("anorm"))
    val b = corpus.select(col("vec_id").as("vec_b"), col("emb").as("bemb"),
      col("norm").as("bnorm"))
    cand.join(a, "vec_a").join(b, "vec_b")
      .select(col("vec_a"), col("vec_b"),
        round(DotProduct(col("aemb"), col("bemb")) /
          (col("anorm") * col("bnorm")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= EmbedSim.DupThreshold)
      .orderBy("vec_a", "vec_b")
  }
}
