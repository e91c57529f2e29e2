package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-containment (range) join: match each point row to the
  * interval rows of the same key that contain its timestamp.
  *
  * Spark plans a raw `ts BETWEEN start AND end` join as a non-equi
  * nested-loop per key — quadratic per key once intervals number in the
  * thousands. The standard scalable shape is BUCKET EXPANSION: chop time
  * into fixed-width buckets, explode each interval into the buckets it
  * overlaps, bucket each point, equi-join on (key, bucket) — which
  * Spark shuffle-partitions like any join — and apply the exact
  * containment predicate as a residual filter. Each point carries
  * exactly one bucket, so a (point, interval) pair can match at most
  * once: no post-join dedup needed.
  *
  * `bucketWidthSec` trades replication for selectivity: intervals are
  * replicated ceil(span/width) times, so pick a width near the typical
  * interval span (too narrow -> interval blowup; too wide -> each
  * bucket degenerates toward the per-key cross product).
  *
  * Contract notes: rows with a NULL timestamp or NULL interval endpoint
  * drop out (a null bucket joins nothing; `sequence` of a null bound is
  * null and explodes to no rows) — callers with open-ended intervals
  * must clamp them to the data's time range first. An inverted interval
  * (end before start) matches nothing, like its BETWEEN formulation.
  */
object RangeJoin {

  def intervalJoin(
      points: DataFrame,
      intervals: DataFrame,
      keys: Seq[String],
      pointTsCol: String,
      startTsCol: String,
      endTsCol: String,
      bucketWidthSec: Long = 3600L): DataFrame = {
    require(keys.nonEmpty, "range join requires at least one key column")
    require(bucketWidthSec > 0, "bucket width must be positive")
    val widthUs = bucketWidthSec * 1000000L
    def bucket(c: Column): Column = floor(unix_micros(c) / widthUs)
    val expanded = intervals.withColumn("_rb",
      explode(sequence(bucket(col(startTsCol)), bucket(col(endTsCol)))))
    points
      .withColumn("_rb", bucket(col(pointTsCol)))
      .join(expanded, keys :+ "_rb")
      .filter(col(pointTsCol) >= col(startTsCol) &&
        col(pointTsCol) <= col(endTsCol))
      .drop("_rb")
  }
}
