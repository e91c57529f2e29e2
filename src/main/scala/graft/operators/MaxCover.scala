package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Coverage-based data selection — greedy MAX-COVERAGE over hashed
  * n-gram feature buckets: pick the k documents that together cover the
  * most distinct vocabulary buckets. The classic submodular-selection
  * objective (Nemhauser, Wolsey & Fisher 1978: greedy is a (1 − 1/e)
  * approximation), the coverage-diversity complement of the
  * distance-based [[Coreset]] family — k-center spreads picks in
  * embedding space, max-cover spreads them in FEATURE space.
  *
  * Features are [[Dsir.featureOccurrences]]'s hashed unigrams+bigrams
  * (md5-prefix buckets — the oracle-replayable hash), deduplicated to
  * distinct (doc, bucket) pairs; gains are exact integer bucket counts,
  * so the (gain DESC, id ASC) argmax is a total order any engine
  * replays.
  *
  * 100 TB shape: the corpus collapses ONCE to the distinct (doc,
  * bucket) pair table (a map-side-combinable aggregate); each of the k
  * greedy rounds is one scan of that table — the covered set (≤ B
  * integers) rides into the scan as a broadcast literal set filter, the
  * per-doc gain is a hash aggregate, the argmax a TakeOrdered. Driver
  * state is the covered-bucket set (≤ B ints) + k picks. Total cost k
  * linear scans of the pair table, the published lazy-greedy shape
  * without the per-element priority queue.
  */
object MaxCover {

  /** One greedy pick: `gain` = newly covered buckets, `covered` =
    * running total after the pick.
    */
  case class CoverPick(round: Long, id: Long, gain: Long, covered: Long)

  /** Distinct (id, bucket) feature pairs of every document — uni+bigram
    * hashed occurrences deduplicated per doc.
    */
  def featurePairs(docs: DataFrame, textCol: String, idCol: String,
      buckets: Int): DataFrame =
    Dsir.featureOccurrences(docs, textCol, idCol, lit(false), buckets)
      .select(col("id"), col("bucket")).distinct()

  /** Greedy max-coverage selection: k rounds of (gain DESC, id ASC)
    * argmax over the uncovered-bucket counts. Gains are >= 1 by
    * construction (a document with no uncovered bucket produces no
    * uncovered pair and cannot be the argmax), so the early stop is
    * exactly "no uncovered pair remains" — full coverage reached, more
    * picks cannot add anything; a picked document's buckets are all
    * covered, so it can never be re-picked.
    *
    * `pairs` must be the [[featurePairs]] table (or any distinct
    * (id, bucket) frame); materialize it first — each round scans it
    * once.
    */
  def greedyMaxCover(pairs: DataFrame, k: Int): Seq[CoverPick] = {
    require(k >= 1, "max-cover needs at least one pick")
    val covered = scala.collection.mutable.HashSet.empty[Long]
    val picks = scala.collection.mutable.ArrayBuffer.empty[CoverPick]
    var i = 1
    while (i <= k) {
      val uncovered =
        if (covered.isEmpty) pairs
        else pairs.filter(!col("bucket").isInCollection(covered.toSeq))
      val top = uncovered
        .groupBy(col("id")).agg(count(lit(1)).as("gain"))
        .orderBy(col("gain").desc, col("id"))
        .limit(1).collect()
      if (top.isEmpty) i = k + 1 // nothing uncovered anywhere: stop
      else {
        val (id, gain) = (top(0).getLong(0), top(0).getLong(1))
        val newBuckets = pairs.filter(col("id") === id)
          .select(col("bucket").cast(LongType)).collect().map(_.getLong(0))
        covered ++= newBuckets
        picks += CoverPick(i.toLong, id, gain, covered.size.toLong)
        i += 1
      }
    }
    picks.toSeq
  }

  /** The selection as a DataFrame gate surface. */
  def coverSelect(spark: org.apache.spark.sql.SparkSession,
      picks: Seq[CoverPick], idCol: String): DataFrame = {
    import spark.implicits._
    picks.map(p => (p.round, p.id, p.gain, p.covered))
      .toDF("round", idCol, "gain", "covered")
  }
}
