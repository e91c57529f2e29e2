package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.DataFrame

/** Near/exact dedup families on a controlled corpus: known duplicates must
  * be found, known non-duplicates must not.
  */
class DedupSpec extends SparkSpec {

  private def docs: DataFrame = {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val nearDup = "the quick brown fox jumps over the lazy dog near the river bank now"
    val other = "completely different content about distributed query engines and shuffles"
    Seq(
      (1L, base), (2L, base),            // exact dups
      (3L, nearDup),                     // near-dup of 1/2
      (4L, other), (5L, "short text")
    ).toDF("doc_id", "text")
  }

  test("exact: identical texts collapse to min-id representative") {
    val out = Dedup.exact(docs, "text", "doc_id")
      .orderBy("keep_id").collect()
    assert(out.length === 4)
    val g = out.find(_.getAs[Long]("keep_id") == 1L).get
    assert(g.getAs[Long]("n_copies") === 2)
  }

  test("exactRows keeps whole first row per text") {
    val out = Dedup.exactRows(docs, "text", "doc_id")
    assert(out.count() === 4)
    assert(!out.collect().map(_.getLong(0)).contains(2L))
  }

  test("jaccard pairs: exact dup = 1.0, near-dup high, unrelated absent") {
    val pairs = Dedup.jaccardPairs(docs, "text", "doc_id", n = 3, minJaccard = 0.5)
      .collect().map(r => ((r.getAs[Long]("id_a"), r.getAs[Long]("id_b")),
        r.getAs[Double]("jaccard"))).toMap
    assert(pairs((1L, 2L)) === 1.0)
    assert(pairs((1L, 3L)) > 0.7 && pairs((1L, 3L)) < 1.0)
    assert(!pairs.keySet.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("jaccard maxDf cap bounds stop-shingle candidate blowup") {
    import spark.implicits._
    // 40 documents that all share one stop-shingle ("common stop shingle")
    // but are otherwise pairwise unrelated, plus one true near-dup pair.
    val corpus = (1L to 40L).map(i =>
      (i, s"common stop shingle unique$i word$i token$i item$i thing$i")) ++
      Seq((100L, "alpha beta gamma delta epsilon zeta"),
          (101L, "alpha beta gamma delta epsilon eta"))
    val df = corpus.toDF("doc_id", "text")
    // Uncapped, the stop shingle alone generates C(40,2) = 780 candidate
    // pairs; with maxDf below 40 it is dropped from the universe and only
    // genuinely-overlapping pairs survive candidate generation.
    val capped = Dedup.jaccardPairs(df, "text", "doc_id",
      n = 3, minJaccard = 0.1, maxDf = 10)
    val pairs = capped.collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs === Set((100L, 101L)))
    // and the metric over the retained universe is still a true Jaccard
    val j = Dedup.jaccardPairs(df, "text", "doc_id", n = 3, minJaccard = 0.1, maxDf = 10)
      .collect().head.getAs[Double]("jaccard")
    assert(j > 0.3 && j < 1.0)
  }

  test("minhash LSH finds exact and near dups, skips unrelated") {
    val pairs = Dedup.minHashLsh(docs, "text", "doc_id",
        numHashes = 64, bands = 16, threshold = 0.5)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("simhash: identical -> hamming 0; reported pairs respect threshold") {
    val maxH = 15 // pigeonhole completeness requires maxHamming < pieces
    val pairs = Dedup.simHashNearDup(docs, "text", "doc_id",
        maxHamming = maxH, pieces = 16)
      .collect().map(r => ((r.getAs[Long]("id_a"), r.getAs[Long]("id_b")),
        r.getAs[Int]("hamming"))).toMap
    assert(pairs((1L, 2L)) === 0)
    assert(pairs.values.forall(_ <= maxH))
    assert(!pairs.keySet.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("simhash fingerprints: deterministic, equal only for equal word bags") {
    val sigs = Dedup.simHash(docs, "text", "doc_id")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("simhash")).toMap
    assert(sigs(1L) === sigs(2L))
    assert(sigs(1L) !== sigs(4L))
  }

  test("embedding near-dup via LSH buckets") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.1f)),
      (2L, Array(0.99f, 0.01f, 0.0f, 0.1f)), // ~same direction
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDup(vecs, "embedding", "vec_id",
        threshold = 0.98, planes = 4)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs === Set((1L, 2L)))
  }
}
