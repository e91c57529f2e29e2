package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.{graftDot, graftNorm2}

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>). Two tiers:
  *
  *  - [[bruteForceTopK]]: exact cosine top-k — one codegen'd projection
  *    followed by a distributed TakeOrdered; the correctness baseline and
  *    fine up to ~10^7 vectors.
  *  - [[lshTopK]]: sign-random-projection LSH — deterministic hyperplanes
  *    from a fixed seed hash the corpus into 2^planes buckets; the query
  *    probes its own bucket (multi-probe: plus Hamming-1 neighbors), so at
  *    100 TB the scan prunes to ~corpus/2^planes with bucket as a
  *    partition key.
  *
  * All vector math goes through the native [[graft.functions.DotProduct]]
  * expression (tight primitive loop inside whole-stage codegen — no UDFs,
  * no interpreted higher-order functions, no per-element boxing).
  */
object Similarity {

  /** Codegen'd dot product of two numeric arrays (float or double). */
  def dot(a: Column, b: Column): Column = graftDot(a, b)

  def norm(a: Column): Column = sqrt(graftNorm2(a))

  def toDouble(vec: Column): Column = transform(vec, x => x.cast("double"))

  /** Adds `_unit`: the L2-normalized double-precision copy of vecCol. */
  def withUnitVector(df: DataFrame, vecCol: String): DataFrame = {
    val v = toDouble(col(vecCol))
    df.withColumn("_dvec", v)
      .withColumn("_norm", norm(col("_dvec")))
      .withColumn("_unit", transform(col("_dvec"), x => x / col("_norm")))
      .drop("_dvec")
  }

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k by cosine similarity against a literal query vector.
    * sort+limit compiles to TakeOrderedAndProject: each partition keeps its
    * local k, the driver merges — no full shuffle-sort.
    *
    * `roundTo >= 0` rounds the cosine to that many digits BEFORE ranking,
    * so the (score, id) ordering is reproducible by any engine that agrees
    * on the rounded value — two vectors whose exact cosines differ only
    * past the rounding digit tie-break deterministically by id instead of
    * by sub-ULP noise.
    */
  def bruteForceTopK(
      embeddings: DataFrame,
      vecCol: String,
      idCol: String,
      queryVec: Seq[Double],
      k: Int = 10,
      roundTo: Int = -1): DataFrame = {
    val qNorm = math.sqrt(queryVec.map(x => x * x).sum)
    val v = col(vecCol)
    val cos = graftDot(v, lit(queryVec.toArray)) / (sqrt(graftNorm2(v)) * lit(qNorm))
    embeddings
      .withColumn("cosine", if (roundTo >= 0) round(cos, roundTo) else cos)
      .select(col(idCol), col("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic pseudo-random hyperplanes (seed fixed) — public
    * sign-random-projection construction.
    */
  private[graft] def hyperplanes(planes: Int, dim: Int = 64): Array[Array[Double]] = {
    val rnd = new scala.util.Random(7)
    Array.fill(planes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Bucket id = sign bits of the vector against `planes` hyperplanes.
    * Scale-invariant (sign of v·h), so it works on raw or unit vectors.
    */
  def hyperplaneBucket(vec: Column, planes: Int, dim: Int = 64): Column = {
    val hp = hyperplanes(planes, dim)
    (0 until planes).map { i =>
      when(graftDot(vec, lit(hp(i))) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
  }

  /** ANN top-k via LSH: score only vectors whose bucket matches the query
    * bucket or differs by one bit (multi-probe), then exact-cosine rank.
    */
  def lshTopK(
      embeddings: DataFrame,
      vecCol: String,
      idCol: String,
      queryVec: Seq[Double],
      k: Int = 10,
      planes: Int = 8,
      roundTo: Int = -1): DataFrame = {
    val dim = queryVec.length
    val hp = hyperplanes(planes, dim)
    val qNorm = math.sqrt(queryVec.map(x => x * x).sum)
    val qBucket = (0 until planes).map { i =>
      val d = queryVec.zip(hp(i)).map { case (x, y) => x * y }.sum
      if (d >= 0) 1L << i else 0L
    }.reduce(_ | _)
    val probes = qBucket +: (0 until planes).map(i => qBucket ^ (1L << i))
    // Bucket straight from the raw vector (sign is scale-invariant); the
    // exact cosine only runs on rows surviving the bucket filter
    // (~ (planes+1)/2^planes of the corpus).
    val v = col(vecCol)
    val cos = graftDot(v, lit(queryVec.toArray)) / (sqrt(graftNorm2(v)) * lit(qNorm))
    embeddings
      .withColumn("_bucket", hyperplaneBucket(v, planes, dim))
      .filter(col("_bucket").isin(probes: _*))
      .withColumn("cosine", if (roundTo >= 0) round(cos, roundTo) else cos)
      .select(col(idCol), col("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** All-pairs cosine >= threshold within LSH buckets (see Dedup for the
    * near-dup variant that uses this shape).
    */
  def bucketedPairs(
      embeddings: DataFrame,
      vecCol: String,
      idCol: String,
      threshold: Double,
      planes: Int = 8): DataFrame =
    Dedup.embeddingNearDup(embeddings, vecCol, idCol, threshold, planes)
}
