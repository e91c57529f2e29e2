package graft

import graft.operators.HybridSearch

/** RRF fusion semantics on a hand-built corpus. */
class HybridSearchSpec extends SparkSpec {

  test("rrf: both-list docs outrank single-list docs; absent side contributes 0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark join window"), // 3 term hits
      (2L, "spark join"), // 2 term hits
      (3L, "nothing relevant here"), // lexical miss
      (4L, "spark") // 1 term hit
    ).toDF("doc_id", "text")
    // embeddings: doc 3 is the vector query itself (vec_id=0 pattern not
    // used here — pass the query vector directly); doc 1 near, 2 far, 4 absent
    val emb = Seq(
      (1L, Array(0.9f, 0.1f)),
      (2L, Array(-1.0f, 0.0f)),
      (3L, Array(1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = HybridSearch.rrfSearch(docs, "text", "doc_id",
        emb, "embedding", "vec_id",
        queryTerms = Seq("spark", "join", "window"),
        queryVec = Seq(1.0, 0.0), candidates = 10, k = 60, topK = 10)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("t_rank"), r.getAs[Long]("v_rank"),
          r.getAs[Double]("rrf_score")))).toMap
    // lexical ranks: 1 (3 hits), 2 (2 hits), 4 (1 hit); vector ranks:
    // 3 (cos 1), 1 (cos ~0.99), 2 (cos -1)
    assert(out(1L)._1 === 1L && out(1L)._2 === 2L)
    assert(out(3L)._1 === 0L && out(3L)._2 === 1L)
    assert(out(4L)._2 === 0L)
    // doc 1 (both lists) must outrank every single-list doc
    val top = out.toSeq.maxBy(_._2._3)
    assert(top._1 === 1L)
    // absent-side contribution is exactly zero
    assert(math.abs(out(3L)._3 - 1.0 / 61) < 1e-6)
    assert(math.abs(out(1L)._3 - (1.0 / 61 + 1.0 / 62)) < 1e-6)
  }
}
