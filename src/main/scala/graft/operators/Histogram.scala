package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Equi-width histogram with data-dependent bounds — the two-pass shape
  * every distributed engine uses: pass one is a 1-row min/max aggregate,
  * broadcast to pass two, which buckets every row at scan speed and
  * aggregates counts by bucket id. Bucket arithmetic is plain IEEE
  * double math in a fixed expression order, so any engine reproduces the
  * exact assignment bit for bit; the top boundary value lands in the
  * last bucket (the standard closed-top convention via least()).
  *
  * At scale: the min/max pass is map-side combinable to one row; the
  * bucketing pass shuffles only (bucket_id, partial count) — `buckets`
  * rows per task. Nothing holds per-value state.
  */
object Histogram {

  def equiWidth(df0: DataFrame, valueCol: String, buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    // NULL values are excluded (the SQL aggregate convention): unfiltered,
    // a null x makes floor(...) null and least(buckets-1, null) returns
    // buckets-1 — least() SKIPS nulls — silently inflating the TOP bucket;
    // an all-null column would put every row at bucket buckets-1 with
    // null bounds.
    val df = df0.filter(col(valueCol).isNotNull)
    val bounds = df.agg(
      min(col(valueCol)).cast("double").as("_lo"),
      max(col(valueCol)).cast("double").as("_hi"))
    val x = col(valueCol).cast("double")
    val span = col("_hi") - col("_lo")
    val bucket = when(span === 0.0, lit(0L)).otherwise(
      least(lit(buckets - 1).cast("long"),
        floor((x - col("_lo")) * buckets / span)))
    df.crossJoin(broadcast(bounds))
      .select(bucket.as("bucket_id"), col("_lo"), col("_hi"))
      .groupBy(col("bucket_id"), col("_lo"), col("_hi"))
      .agg(count(lit(1)).as("n"))
      .select(col("bucket_id"),
        (col("_lo") + col("bucket_id") * (col("_hi") - col("_lo")) / buckets)
          .as("bucket_lo"),
        (col("_lo") + (col("bucket_id") + 1) * (col("_hi") - col("_lo")) / buckets)
          .as("bucket_hi"),
        col("n"))
  }
}
