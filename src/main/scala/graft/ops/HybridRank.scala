package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.DotProduct

/** Hybrid retrieval: BM25 keyword ranking fused with embedding-cosine
  * ranking by reciprocal-rank fusion (Cormack et al. 2009:
  * `score(d) = Σ_lists 1/(K + rank_list(d))`) — the standard hybrid
  * search shape a retrieval-curation pipeline runs (keyword recall +
  * semantic recall, fused without score calibration: RRF only consumes
  * RANKS, which is what makes fusing incomparable score scales sound).
  *
  * Determinism: both per-list ranks come from already-oracle-exact
  * chains (bm25's rational-idf scores; cosine rounded 6dp, doc_id
  * tiebreaks); 1/(K+rank) is an IEEE-identical division and the 2-term
  * fusion sum has fixed order.
  *
  * Scale shape: each side reduces to its top-k with TakeOrdered (no
  * global sort), ranks attach with a window over the already-k-row
  * frame, and the fusion is a full outer join of two k-row frames —
  * trivially broadcastable regardless of corpus size.
  */
object HybridRank {

  val RrfK = 60 // the standard RRF dampening constant
  val CosK = 50 // semantic-list depth
  val OutK = 20
  val QueryVec = 0L // vec_id of the fixed query embedding

  def hybridRank(spark: SparkSession, dir: String): DataFrame = {
    val kw = TextAnalysis.bm25(Tables.load(spark, dir, "documents"))
    val rb = kw.select(col("doc_id"),
      row_number().over(Window.orderBy(desc("bm25"), col("doc_id")))
        .as("kw_rank"))

    val e = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val q = e.filter(col("vec_id") === QueryVec)
      .select(col("emb").as("qemb"))
    val cos = e.filter(col("vec_id") =!= QueryVec)
      .crossJoin(broadcast(q))
      .select(col("vec_id").as("doc_id"),
        round(DotProduct(col("emb"), col("qemb")) /
          (sqrt(DotProduct(col("emb"), col("emb"))) *
            sqrt(DotProduct(col("qemb"), col("qemb")))), 6).as("c"))
      .orderBy(desc("c"), col("doc_id")).limit(CosK)
    val rc = cos.select(col("doc_id"),
      row_number().over(Window.orderBy(desc("c"), col("doc_id")))
        .as("sem_rank"))

    rb.join(rc, Seq("doc_id"), "outer")
      .select(col("doc_id"), col("kw_rank"), col("sem_rank"),
        round(
          coalesce(lit(1.0) / (lit(RrfK) + col("kw_rank")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(RrfK) + col("sem_rank")), lit(0.0)), 6)
          .as("rrf"))
      .orderBy(desc("rrf"), col("doc_id"))
      .limit(OutK)
  }
}
