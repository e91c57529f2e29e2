package graft

import graft.operators.Dsir
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DSIR importance resampling: feature hashing, model-ratio scoring,
  * and the sort-free top-K boundary construction.
  */
class DsirSpec extends SparkSpec {

  import spark.implicits._

  test("featureOccurrences emits unigrams + bigrams, none for short docs") {
    val docs = Seq(
      (1L, "a b c"),        // 3 uni + 2 bi
      (2L, "solo"),         // 1 uni, 0 bi
      (3L, ""),             // nothing
      (4L, "  x   y  ")     // trim/split hygiene: 2 uni + 1 bi
    ).toDF("id", "text")
    val occ = Dsir.featureOccurrences(docs, "text", "id", lit(false), 64)
    val counts = occ.groupBy("id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts === Map(1L -> 5L, 2L -> 1L, 4L -> 3L))
    val range = occ.agg(min(col("bucket")), max(col("bucket"))).head()
    assert(range.getLong(0) >= 0L && range.getLong(1) < 64L)
  }

  test("importanceScores ranks target-like raw docs above junk") {
    val target = (1 to 10).map(i =>
      (100L + i, "the quick brown fox jumps over the lazy dog", true))
    val raw = Seq(
      (1L, "the quick brown fox jumps high", false),
      (2L, "zzz qqq vvv kkk www", false))
    val docs = (target ++ raw).toDF("id", "text", "tgt")
    val scored = Dsir.importanceScores(docs, "text", "id", col("tgt"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    assert(scored.keySet === Set(1L, 2L))
    // 6 words -> 6 uni + 5 bi = 11 features; 5 words -> 9
    assert(scored(1L)._1 === 11L)
    assert(scored(2L)._1 === 9L)
    assert(scored(1L)._2 > scored(2L)._2,
      "target-vocabulary doc must out-score junk")
    // every junk feature is unseen in target: its score must be negative
    assert(scored(2L)._2 < 0.0)
  }

  test("featureOccurrences lowercases like the sibling tokenizers") {
    val docs = Seq((1L, "  The Quick FOX "), (2L, "the quick fox"))
      .toDF("id", "text")
    val occ = Dsir.featureOccurrences(docs, "text", "id", lit(false), 256)
    def buckets(id: Long): Seq[Long] =
      occ.filter(col("id") === id).select("bucket")
        .collect().map(_.getLong(0)).toSeq.sorted
    assert(buckets(1L) === buckets(2L),
      "natural-case text must hash to the same feature buckets")
  }

  test("selectTopK is bit-identical to the global row_number formulation") {
    val scores = Seq(
      (1L, 3.5), (2L, 2.0), (3L, 2.0), (4L, 2.0), (5L, 1.0),
      (6L, -0.5), (7L, 2.0), (8L, 3.5)
    ).toDF("id", "score")
    def reference(k: Long): Set[Long] =
      scores.withColumn("_rn", row_number().over(
          Window.orderBy(col("score").desc, col("id"))))
        .filter(col("_rn") <= k)
        .collect().map(_.getLong(0)).toSet
    // k inside the tied 2.0 bucket, on bucket edges, 0, and beyond n
    Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 100L).foreach { k =>
      val got = Dsir.selectTopK(scores, "score", "id", k)
        .filter(col("selected")).collect().map(_.getLong(0)).toSet
      assert(got === reference(k), s"k=$k")
      // and the unselected complement is intact (flagging, not filtering)
      assert(Dsir.selectTopK(scores, "score", "id", k).count() === 8L)
    }
  }

  test("selectTopK histogram refinement matches row_number on a wide domain") {
    // 250 distinct scores, each tied twice, spread over a real-valued
    // range: with fanout=8 / maxDistinct=4 the boundary is located
    // through several histogram-refinement levels, never by collecting
    // one row per distinct score.
    val scores = (1 to 500)
      .map(i => (i.toLong, (i % 250) * 0.7311 - 91.3))
      .toDF("id", "score")
    def reference(k: Long): Set[Long] =
      scores.withColumn("_rn", row_number().over(
          Window.orderBy(col("score").desc, col("id"))))
        .filter(col("_rn") <= k)
        .collect().map(_.getLong(0)).toSet
    Seq(1L, 7L, 123L, 250L, 251L, 252L, 499L).foreach { k =>
      val flagged = Dsir.selectTopK(scores, "score", "id", k,
        fanout = 8, maxDistinct = 4)
      assert(flagged.count() === 500L, s"k=$k must flag, not filter")
      val got = flagged.filter(col("selected"))
        .collect().map(_.getLong(0)).toSet
      assert(got === reference(k), s"k=$k")
    }
  }
}
