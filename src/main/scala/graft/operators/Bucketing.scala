package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: the co-located-join lever for repeated joins
  * on the same key at 100 TB.
  *
  * A shuffle-based join repartitions BOTH sides on every query; writing
  * the fact tables bucketed (and sorted) by the join key pays that
  * shuffle once at write time, after which every join on the bucket key
  * is a zero-exchange sort-merge join of co-located buckets — the plan
  * contains no Exchange at all (BucketingSpec asserts exactly that).
  * Bucket count is a write-time scale decision: it bounds join-task
  * parallelism, so size it to the target cluster (e.g. 2-4x executor
  * cores), not the current data.
  *
  * This complements, not replaces, the other join levers in this
  * library: broadcast for small dims ([[graft.SparkEntry]] `q_join_fk`),
  * AQE + salting for skew ([[SkewJoin]]). Bucketing wins when BOTH sides
  * are large, rewritten rarely, and joined repeatedly on the same key.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted table; `path` makes it
    * external (data under the caller's directory instead of the session
    * warehouse — what per-run artifact isolation needs).
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      numBuckets: Int,
      sortCols: Seq[String] = Nil,
      path: Option[String] = None): Unit = {
    require(bucketCols.nonEmpty, "bucketing requires at least one column")
    val sorts = if (sortCols.nonEmpty) sortCols else bucketCols
    val w = df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(sorts.head, sorts.tail: _*)
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Join two tables bucketed on the same key with the same bucket
    * count. With bucketing enabled (Spark default) the planner aligns
    * buckets and skips both exchanges.
    */
  def bucketedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      keys: Seq[String],
      joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys, joinType)
}
