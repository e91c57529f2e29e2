package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document deduplication operators for large-scale training-data
  * pipelines. All of them are pure DataFrame plans (no driver loops, no
  * UDFs): exact dedup is a hash aggregate, the near-dup families follow
  * the standard shingle -> signature -> band-bucket -> candidate-join ->
  * verify shape so that the candidate join is an equi-join Spark can
  * shuffle-partition by bucket — never an O(N^2) cross join.
  *
  * Scale: every self-join here is keyed on a high-cardinality bucket
  * column; skewed buckets (a shingle appearing in half the corpus) are the
  * classic hazard, so candidate generation caps bucket width via a
  * per-bucket row_number guard where noted.
  */
object Dedup {

  /** Exact duplicate groups: one representative (min id) per identical
    * text, plus the duplicate count. A plain map-side-combinable hash
    * aggregate — the cheapest possible dedup at any scale.
    */
  def exact(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Exact dedup that keeps whole representative rows (first by id). */
  def exactRows(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(textCol)).orderBy(col(idCol))
    docs.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** Distinct word n-gram shingles per document: (id, shingle). */
  def shingles(docs: DataFrame, textCol: String, idCol: String, n: Int = 3): DataFrame = {
    // Guard: sequence(0, -1) is a DESCENDING sequence in Spark, so a doc
    // with fewer than n words must short-circuit to an empty shingle set.
    val grams = expr(
      s"""CASE WHEN size(split(trim(`$textCol`), '\\\\s+')) >= $n THEN
         |  transform(
         |    sequence(0, size(split(trim(`$textCol`), '\\\\s+')) - $n),
         |    i -> concat_ws(' ', slice(split(trim(`$textCol`), '\\\\s+'), i + 1, $n)))
         |ELSE array() END""".stripMargin)
    docs
      .select(col(idCol).as("id"), explode(grams).as("shingle"))
      .filter(length(col("shingle")) > 0)
      .distinct()
  }

  /** Exact pairwise n-gram Jaccard >= threshold. The shingle equi-join is
    * the candidate generator; Jaccard = |A∩B| / (|A|+|B|-|A∩B|) from three
    * aggregates. Quadratic only within a shingle bucket, which is the
    * standard trade: restrict corpus (or cap buckets) upstream.
    */
  def jaccardPairs(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3,
      minJaccard: Double = 0.8): DataFrame = {
    val sh = shingles(docs, textCol, idCol, n)
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("n_sh"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
      .withColumn("jaccard",
        col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }

  /** Deterministic affine permutation constants for MinHash, from a fixed
    * seed so signatures are reproducible across runs/sessions.
    */
  private def minhashParams(numHashes: Int): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(42)
    val a = Array.fill(numHashes)(math.abs(rnd.nextLong()) % MersennePrime | 1L)
    val b = Array.fill(numHashes)(math.abs(rnd.nextLong()) % MersennePrime)
    (a, b)
  }
  // 2^31-1: products a*h stay under 2^62, no 64-bit overflow in codegen.
  private val MersennePrime = (1L << 31) - 1

  /** MinHash signature per document: sig[i] = min over shingles of
    * (a_i * xxhash64(shingle) + b_i) mod p. One explode + one hash
    * aggregate; the elementwise-min is a single `transform`+`min` on the
    * per-shingle hash array via posexplode, keyed (id, i) — both shuffles
    * are on high-cardinality keys.
    */
  def minHashSignatures(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      numHashes: Int = 64,
      shingleN: Int = 3): DataFrame = {
    val (a, b) = minhashParams(numHashes)
    val aSql = a.mkString("array(", "L,", "L)")
    val bSql = b.mkString("array(", "L,", "L)")
    val sh = shingles(docs, textCol, idCol, shingleN)
      .withColumn("h", pmod(xxhash64(col("shingle")), lit(MersennePrime)))
    // per-shingle k-vector of permuted hashes, then elementwise min:
    sh.select(col("id"),
        posexplode(expr(
          s"""transform(sequence(0, ${numHashes - 1}),
             |  i -> ($aSql[i] * h + $bSql[i]) % ${MersennePrime}L)"""
            .stripMargin)).as(Seq("i", "hv")))
      .groupBy("id", "i").agg(min("hv").as("mh"))
      .groupBy("id").agg(
        array_sort(collect_list(struct(col("i"), col("mh")))).as("_s"))
      .select(col("id"), expr("transform(_s, x -> x.mh)").as("signature"))
  }

  /** MinHash-LSH near-duplicate pairs: band the signature, bucket-join on
    * (band, hash(band-slice)), then filter candidates by the signature
    * Jaccard estimate (fraction of equal positions).
    */
  def minHashLsh(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.7,
      shingleN: Int = 3): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val r = numHashes / bands
    val sigs = minHashSignatures(docs, textCol, idCol, numHashes, shingleN)
    val banded = sigs.select(col("id"), col("signature"),
      posexplode(expr(
        s"transform(sequence(0, ${bands - 1}), b -> hash(slice(signature, b * $r + 1, $r)))"))
        .as(Seq("band", "bucket")))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        col("x.signature").as("sig_a"), col("y.signature").as("sig_b"))
      .distinct()
    cand
      .withColumn("est_jaccard",
        expr(s"aggregate(zip_with(sig_a, sig_b, (p, q) -> if(p = q, 1, 0)), 0, (acc, v) -> acc + v)")
          .cast("double") / numHashes)
      .filter(col("est_jaccard") >= threshold)
      .select("id_a", "id_b", "est_jaccard")
  }

  /** 64-bit SimHash per document from word-level xxhash64: bit i of the
    * fingerprint is the sign of the sum over words of (+1 if word-hash has
    * bit i set, else -1). Pure expressions; one aggregate.
    */
  def simHash(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val words = docs.select(col(idCol).as("id"),
        explode(split(trim(col(textCol)), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .withColumn("h", xxhash64(col("w")))
    val bitSums = (0 until 64).map(i =>
      sum(when(expr(s"(h >> $i) & 1") === 1, 1).otherwise(-1)).as(s"_b$i"))
    val assembled = (0 until 64).map(i =>
      when(col(s"_b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
    words.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("id"), assembled.reduce(_.bitwiseOR(_)).as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance <= maxHamming, using the
    * pigeonhole band trick: split 64 bits into `pieces` chunks; any pair
    * within distance maxHamming (< pieces) shares at least one exact chunk,
    * so candidates come from an equi-join on (chunk_idx, chunk_value).
    */
  def simHashNearDup(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      maxHamming: Int = 3,
      pieces: Int = 4): DataFrame = {
    val width = 64 / pieces
    val sigs = simHash(docs, textCol, idCol)
    val chunked = sigs.select(col("id"), col("simhash"),
      posexplode(expr(
        s"transform(sequence(0, ${pieces - 1}), p -> (simhash >> (p * $width)) & ${(1L << width) - 1}L)"))
        .as(Seq("piece", "chunk")))
    chunked.as("x").join(chunked.as("y"),
        col("x.piece") === col("y.piece") && col("x.chunk") === col("y.chunk") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        col("x.simhash").as("sh_a"), col("y.simhash").as("sh_b"))
      .distinct()
      .withColumn("hamming", expr("bit_count(sh_a ^ sh_b)"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Embedding near-duplicate pairs: cosine >= threshold, candidates from
    * sign-LSH buckets (see [[Similarity.hyperplaneBucket]]) instead of a
    * cross join.
    */
  def embeddingNearDup(
      embeddings: DataFrame,
      vecCol: String,
      idCol: String,
      threshold: Double = 0.95,
      planes: Int = 8,
      dim: Int = 64): DataFrame = {
    val unit = Similarity.withUnitVector(embeddings, vecCol).select(
      col(idCol).as("id"), col("_unit"),
      Similarity.hyperplaneBucket(col("_unit"), planes, dim).as("bucket"))
    unit.as("x").join(unit.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.id") < col("y.id"))
      .withColumn("cosine", Similarity.dot(col("x._unit"), col("y._unit")))
      .filter(col("cosine") >= threshold)
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"), col("cosine"))
  }
}
