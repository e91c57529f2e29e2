package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>). Two tiers:
  *
  *  - [[bruteForceTopK]]: exact cosine top-k — one codegen'd projection
  *    (zip_with + aggregate, all double math) followed by a distributed
  *    TakeOrdered; the correctness baseline and fine up to ~10^7 vectors.
  *  - [[lshTopK]]: sign-random-projection LSH — deterministic hyperplanes
  *    from a fixed seed hash the corpus into 2^planes buckets; the query
  *    probes its own bucket (multi-probe: plus Hamming-1 neighbors), so at
  *    100 TB the scan prunes to ~corpus/2^planes with bucket as a
  *    partition key.
  *
  * Everything is expression-based; no UDFs, no driver-side vectors beyond
  * the query literal.
  */
object Similarity {

  /** Dot product of two double arrays. Higher-order functions are
    * interpreted (not codegen'd) — use [[flatDot]] when one side is a
    * driver-side literal.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Dot against a literal weight vector, unrolled to flat arithmetic
    * (element_at + multiply-add) that stays inside whole-stage codegen —
    * ~10x faster per pass than the interpreted HOF form.
    */
  def flatDot(v: Column, w: Seq[Double]): Column =
    w.zipWithIndex.map { case (x, i) =>
      element_at(v, i + 1).cast("double") * lit(x)
    }.reduce(_ + _)

  /** Squared L2 norm with known dimensionality, codegen-friendly. */
  def flatNorm2(v: Column, dim: Int): Column =
    (1 to dim).map { i =>
      val e = element_at(v, i).cast("double"); e * e
    }.reduce(_ + _)

  def norm(a: Column): Column = sqrt(dot(a, a))

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
    */
  def bruteForceTopK(
      embeddings: DataFrame,
      vecCol: String,
      idCol: String,
      queryVec: Seq[Double],
      k: Int = 10): DataFrame = {
    val dim = queryVec.length
    val qNorm = math.sqrt(queryVec.map(x => x * x).sum)
    val v = col(vecCol)
    embeddings
      .withColumn("cosine",
        flatDot(v, queryVec) / (sqrt(flatNorm2(v, dim)) * lit(qNorm)))
      .select(col(idCol), col("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic pseudo-random hyperplanes (seed fixed) — public
    * sign-random-projection construction.
    */
  private[operators] def hyperplanes(planes: Int, dim: Int = 64): Array[Array[Double]] = {
    val rnd = new scala.util.Random(7)
    Array.fill(planes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Bucket id = sign bits of the vector against `planes` hyperplanes.
    * `dim` must match the embedding dimensionality — a mismatched plane
    * length would null out the dot product (zip_with pads with nulls).
    */
  def hyperplaneBucket(unitVec: Column, planes: Int, dim: Int = 64): Column = {
    val hp = hyperplanes(planes, dim)
    (0 until planes).map { i =>
      when(dot(unitVec, lit(hp(i))) >= 0, lit(1L << i)).otherwise(lit(0L))
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
      planes: Int = 8): DataFrame = {
    val dim = queryVec.length
    val hp = hyperplanes(planes, dim)
    val qNorm = math.sqrt(queryVec.map(x => x * x).sum)
    val qBucket = (0 until planes).map { i =>
      val d = queryVec.zip(hp(i)).map { case (x, y) => x * y }.sum
      if (d >= 0) 1L << i else 0L
    }.reduce(_ | _)
    val probes = qBucket +: (0 until planes).map(i => qBucket ^ (1L << i))
    // The sign of v.h is scale-invariant, so bucket straight from the raw
    // vector — no normalization pass. All dots are flat codegen arithmetic;
    // the exact cosine only runs on rows surviving the bucket filter
    // (~ (planes+1)/2^planes of the corpus).
    val v = col(vecCol)
    val bucket = (0 until planes).map { i =>
      when(flatDot(v, hp(i).toSeq) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    embeddings
      .withColumn("_bucket", bucket)
      .filter(col("_bucket").isin(probes: _*))
      .withColumn("cosine",
        flatDot(v, queryVec) / (sqrt(flatNorm2(v, dim)) * lit(qNorm)))
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
