package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: fuse a lexical (term-match) ranking and a vector
  * (cosine) ranking with Reciprocal Rank Fusion — the public
  * construction production search stacks run when neither keywords nor
  * embeddings alone are trustworthy. RRF needs only the RANKS:
  * `score(d) = sum over rankings of 1 / (k + rank_d)` (k=60 from the
  * original Cormack/Clarke/Buettcher paper), which makes the fusion
  * immune to incomparable score scales.
  *
  * Scale shape: each side reduces to a top-`candidates` list BEFORE
  * anything global happens — the lexical side prunes to docs matching
  * at least one query term (at 100 TB this is the inverted index's
  * posting intersection — see TermIndex — here a scan-filter suffices),
  * the vector side is the TakeOrdered top-k scan (or any ANN tier).
  * The global rank windows then run on `candidates` rows, not the
  * corpus, so the single-partition window is bounded by construction.
  */
object HybridSearch {

  def rrfSearch(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      embeddings: DataFrame,
      vecCol: String,
      vecIdCol: String,
      queryTerms: Seq[String],
      queryVec: Seq[Double],
      candidates: Int = 50,
      k: Int = 60,
      topK: Int = 10): DataFrame = {
    // Lexical candidates: distinct-term overlap with the query (integer
    // score -> deterministic cross-engine), pruned before ranking.
    val termScore = size(array_intersect(
      array_distinct(TextAnalysis.words(lower(col(textCol)))),
      lit(queryTerms.map(_.toLowerCase).toArray)))
    val termCand = docs
      .select(col(idCol).as("id"), termScore.as("t_score"))
      .filter(col("t_score") > 0)
      .orderBy(col("t_score").desc, col("id"))
      .limit(candidates)
    val tRanked = termCand.withColumn("t_rank",
      row_number().over(Window.orderBy(col("t_score").desc, col("id")))
        .cast("long"))
    // Vector candidates: rounded-cosine top-k (ties pinned by id), same
    // discipline as q_embed_topk.
    val vecCand = Similarity.bruteForceTopK(
        embeddings, vecCol, vecIdCol, queryVec, k = candidates, roundTo = 4)
      .withColumnRenamed(vecIdCol, "id")
      .withColumnRenamed("cosine", "v_score")
    val vRanked = vecCand.withColumn("v_rank",
      row_number().over(Window.orderBy(col("v_score").desc, col("id")))
        .cast("long"))
    // Fuse: rank 0 = absent from that ranking = no contribution.
    val fused = tRanked.select(col("id"), col("t_rank"))
      .join(vRanked.select(col("id"), col("v_rank")), Seq("id"), "full_outer")
      .na.fill(0L, Seq("t_rank", "v_rank"))
    def contrib(rank: Column): Column =
      when(rank > 0, lit(1.0) / (lit(k.toDouble) + rank.cast("double")))
        .otherwise(lit(0.0))
    fused
      .withColumn("rrf_score",
        round(contrib(col("t_rank")) + contrib(col("v_rank")), 6))
      .select(col("id").as("doc_id"), col("t_rank"), col("v_rank"),
        col("rrf_score"))
      .orderBy(col("rrf_score").desc, col("doc_id"))
      .limit(topK)
  }
}
