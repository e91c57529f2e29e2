package graft

import org.apache.spark.sql.functions._

/** Mergeable-sketch algebra: per-shard HLL sketches union into a
  * corpus-wide distinct estimate without touching rows again.
  */
class SketchAlgebraSpec extends SparkSpec {

  test("union of disjoint shard sketches estimates the total, deterministically") {
    import spark.implicits._
    // two disjoint shards of 3000 distinct keys each
    val df = (0L until 6000L).map(i => (if (i < 3000) "a" else "b", i))
      .toDF("shard", "k")
    val shards = df.groupBy("shard")
      .agg(expr("hll_sketch_agg(k, 12)").as("sk"))
    val union = shards.agg(expr("hll_union_agg(sk, true)").as("sk"))
      .select(expr("hll_sketch_estimate(sk)").as("est"))
      .head().getLong(0)
    // 3x the lgK=12 relative standard error (~1.6%) -> 5% envelope.
    assert(math.abs(union - 6000L) <= 300,
      s"union estimate $union outside the 5% envelope of 6000")
    // Bucket-max updates are order-insensitive: any partitioning of the
    // same rows produces the identical estimate.
    val re = df.repartition(13).groupBy("shard")
      .agg(expr("hll_sketch_agg(k, 12)").as("sk"))
      .agg(expr("hll_union_agg(sk, true)").as("sk"))
      .select(expr("hll_sketch_estimate(sk)").as("est"))
      .head().getLong(0)
    assert(re === union)
  }
}
