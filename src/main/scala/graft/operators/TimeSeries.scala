package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an irregular event stream onto a
  * fixed bucket grid and fill the gaps by carrying the last observation
  * forward — the standard preprocessing step before any per-entity
  * sequence model or rate computation over telemetry.
  *
  * The reference (rnjane/client_data_ingester) has no time-series
  * surface; this is engine-provided capability over the `events`
  * testdata table, in the spirit of its per-tenant event queries.
  *
  * Scale shape (the 100 TB argument):
  *  - the bucket aggregate is a map-side-combinable `groupBy(key,
  *    bucket)` — raw events collapse to at most one row per key per
  *    bucket BEFORE any further shuffle;
  *  - the spine is generated per key with `sequence(min,max)` +
  *    `explode`, so its size is bounded by each key's own timeline
  *    length (never `keys x global-span`, which would explode for
  *    short-lived keys in a years-long corpus);
  *  - the forward-fill is a single running `last(ignoreNulls)` window
  *    per key — O(1) carried state per row, no self-join, and the
  *    window shares the `key` partitioning the spine join already
  *    established.
  * Skewed keys (one device with a years-long dense timeline) cost
  * O(own span), not O(corpus); there is no all-pairs or per-key
  * nested-loop anywhere.
  */
object TimeSeries {

  /** Bucket `obs` rows onto `bucketCol` (a pre-computed integral bucket
    * index), sum `valueCol` per (key, bucket), then densify each key's
    * [min,max] bucket range and forward-fill missing buckets.
    *
    * Output: key, bucket, `v_fill` (last non-null bucket sum carried
    * forward — never null because each key's range starts at an
    * observed bucket), `was_gap` (true where the bucket had no
    * observation).
    */
  def resampleFill(obs: DataFrame, keyCol: String, bucketCol: String,
      valueCol: String): DataFrame = {
    val agg = obs.groupBy(col(keyCol), col(bucketCol))
      .agg(sum(col(valueCol)).as("v_sum"))
    val spine = agg.groupBy(col(keyCol))
      .agg(min(col(bucketCol)).as("b0"), max(col(bucketCol)).as("b1"))
      .select(col(keyCol),
        explode(sequence(col("b0"), col("b1"))).as(bucketCol))
    val joined = spine.join(agg, Seq(keyCol, bucketCol), "left")
    val w = Window.partitionBy(keyCol).orderBy(bucketCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined.select(col(keyCol), col(bucketCol),
      last(col("v_sum"), ignoreNulls = true).over(w).as("v_fill"),
      col("v_sum").isNull.as("was_gap"))
  }

  /** Linear interpolation variant: instead of carrying the last value
    * forward, interpolate linearly between the previous and next
    * OBSERVED bucket values. Gaps after the last observation keep the
    * last value (no extrapolation). Same scale shape as
    * [[resampleFill]] plus one backward-looking window pass.
    *
    * Implementation: alongside the running `last(ignoreNulls)` carry,
    * compute the NEXT observed value and its bucket with a reversed
    * `first(ignoreNulls)` window, then blend by the fractional position
    * of the gap bucket between its bracketing observed buckets. All
    * window passes share the same `key` hash partitioning — Catalyst
    * plans one Exchange for the three of them.
    */
  def resampleInterpolate(obs: DataFrame, keyCol: String,
      bucketCol: String, valueCol: String): DataFrame = {
    val agg = obs.groupBy(col(keyCol), col(bucketCol))
      .agg(sum(col(valueCol)).cast("double").as("v_sum"))
    val spine = agg.groupBy(col(keyCol))
      .agg(min(col(bucketCol)).as("b0"), max(col(bucketCol)).as("b1"))
      .select(col(keyCol),
        explode(sequence(col("b0"), col("b1"))).as(bucketCol))
    val joined = spine.join(agg, Seq(keyCol, bucketCol), "left")
    val back = Window.partitionBy(keyCol).orderBy(bucketCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(keyCol).orderBy(bucketCol)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsBucket = when(col("v_sum").isNotNull, col(bucketCol))
    val prevV = last(col("v_sum"), ignoreNulls = true).over(back)
    val prevB = last(obsBucket, ignoreNulls = true).over(back)
    val nextV = first(col("v_sum"), ignoreNulls = true).over(fwd)
    val nextB = first(obsBucket, ignoreNulls = true).over(fwd)
    joined.select(col(keyCol), col(bucketCol),
      when(col("v_sum").isNotNull, col("v_sum"))
        .when(nextB.isNull, prevV)
        .otherwise(prevV + (nextV - prevV)
          * (col(bucketCol) - prevB).cast("double")
          / (nextB - prevB).cast("double"))
        .as("v_interp"),
      col("v_sum").isNull.as("was_gap"))
  }
}
