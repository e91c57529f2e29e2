package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.{graftBloomAgg, graftMightContain}

/** Semi-join acceleration with a Bloom-filter prefilter — the explicit
  * form of Spark's own runtime row-level filtering (Catalyst's
  * `InjectRuntimeFilter` builds exactly this plan when its heuristics
  * allow; this operator makes the pattern a first-class, always-available
  * primitive built on the same `BloomFilterAggregate` /
  * `BloomFilterMightContain` expressions).
  *
  * Why it matters at 100 TB: a plain semi-join shuffles EVERY fact row to
  * its join partition, including the overwhelming majority that match
  * nothing. The Bloom prefilter evaluates at scan speed on the map side
  * (codegen'd xxhash64 + bitmap probe, no shuffle, no broadcast-hash
  * build of the actual keys) and drops non-matching rows before the
  * exchange, so the shuffle carries only candidate rows plus the sketch's
  * false-positive rate. The exact semi-join afterwards removes those
  * false positives, so results are EXACTLY the plain semi-join's — the
  * sketch is pure acceleration, never semantics.
  *
  * The sketch travels driver-side as a `numBits/8`-byte bitmap — bounded
  * by the requested capacity, NOT by the dim-side row count (1% fpp at
  * one million keys is ~1.2 MB), the same bounded-driver-state envelope
  * as the IVF centroid sample. Keys are hashed with xxhash64 (seed 42)
  * identically on build and probe.
  */
object BloomJoin {

  /** Number of bits for a target capacity and false-positive rate
    * (standard Bloom sizing: -n ln p / (ln 2)^2).
    */
  def optimalNumBits(expectedItems: Long, fpp: Double): Long = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    math.ceil(-expectedItems.toDouble * math.log(fpp) /
      (math.log(2) * math.log(2))).toLong
  }

  /** The fact rows whose `factKey` appears in `dim.dimKey` — result is
    * identical to `fact.join(dim, fact(factKey) === dim(dimKey),
    * "left_semi")`, computed as Bloom prefilter (map-side, scan speed)
    * then exact semi-join on the survivors.
    *
    * `expectedItems` is a capacity DESIGN INPUT (dim-side distinct-key
    * bound), deliberately not derived with a `count()` pass — at scale
    * the caller knows the dimension's cardinality class, and undersizing
    * only raises the false-positive rate, never breaks correctness.
    */
  def bloomSemiJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      expectedItems: Long,
      fpp: Double = 0.01): DataFrame = {
    val pre = bloomPrefilter(fact, dim, col(factKey), col(dimKey), expectedItems, fpp)
    pre.join(dim.select(col(dimKey).as("__bloom_k")),
        col(factKey) === col("__bloom_k"), "left_semi")
  }

  /** Just the prefilter stage (exposed so its selectivity is testable):
    * fact rows that MIGHT match — guaranteed to include every true match
    * (Bloom filters have no false negatives), plus ~fpp false positives.
    */
  def bloomPrefilter(
      fact: DataFrame,
      dim: DataFrame,
      factKey: Column,
      dimKey: Column,
      expectedItems: Long,
      fpp: Double = 0.01): DataFrame = {
    val numBits = optimalNumBits(expectedItems, fpp)
    // Distributed build (map-side combinable aggregate merges per-task
    // bitmaps with OR); only the finished fixed-size bitmap reaches the
    // driver, where it folds into the probe as a binary literal — which
    // is exactly what lets BloomFilterMightContain constant-fold the
    // deserialization and codegen the per-row probe.
    val bitmap = dim.agg(graftBloomAgg(dimKey, expectedItems, numBits).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    fact.filter(graftMightContain(lit(bitmap), factKey))
  }
}
