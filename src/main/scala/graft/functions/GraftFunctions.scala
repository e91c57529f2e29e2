package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge => B}

/** Column-API entry points for the native Catalyst expressions. These
  * build Columns directly (no session registry needed), so they work in
  * any SparkSession; [[graft.GraftExtensions]] additionally registers the
  * same expressions as SQL functions for `spark.sql("... graft_dot(...)")`.
  */
object GraftFunctions {

  /** Codegen'd dot product over array<float|double>. */
  def graftDot(a: Column, b: Column): Column =
    B.column(DotProduct(B.expression(a), B.expression(b)))

  /** Squared L2 norm — dot of a vector with itself. */
  def graftNorm2(v: Column): Column = graftDot(v, v)

  /** Exact top-k aggregate: smallest k `value` structs by `key`, as a
    * sorted array. Encode DESC by negating the key component.
    */
  def graftTopK(key: Column, value: Column, k: Int): Column =
    B.column(
      TopKRows(B.expression(key), B.expression(value),
        org.apache.spark.sql.catalyst.expressions.Literal(k))
        .toAggregateExpression())

  /** Distinct word n-gram shingles of a text column — one codegen'd pass
    * per row (replaces the interpreted transform/slice/concat_ws chain).
    */
  def graftShingles(text: Column, n: Int): Column =
    B.column(WordShingles(B.expression(text),
      org.apache.spark.sql.catalyst.expressions.Literal(n)))

  /** Count of whitespace words of `text` that are in the literal word
    * set — one codegen'd pass (replaces interpreted filter+isin chains).
    */
  def graftWordSetCount(text: Column, words: Seq[String]): Column =
    B.column(WordSetCount(B.expression(text),
      B.expression(org.apache.spark.sql.functions.typedLit(words))))

  /** Bounded edit distance: 0 equal / 1 one edit / -1 further — the
    * levenshtein(a, b, 1) contract via a two-pointer scan. See
    * [[EditWithin1]].
    */
  def graftEditWithin1(a: Column, b: Column): Column =
    B.column(EditWithin1(B.expression(a), B.expression(b)))

  /** Unicode canonicalization for curation: NFC, accent strip
    * (utf8proc STRIPMARK rule), ROOT-locale lowercase, whitespace
    * collapse — one codegen'd pass. See [[NormalizeText]].
    */
  def graftNormalizeText(text: Column): Column =
    B.column(NormalizeText(B.expression(text)))

  /** 64-bit SimHash fingerprint aggregate over per-row word hashes. */
  def graftSimHash(hash: Column): Column =
    B.column(SimHashAgg(B.expression(hash)).toAggregateExpression())

  /** All hash tables' sign-LSH buckets of an embedding in one native
    * call — see [[LshBuckets]].
    */
  def graftLshBuckets(vec: Column, planes: Int, tables: Int, dim: Int): Column = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    B.column(LshBuckets(B.expression(vec),
      Literal(planes), Literal(tables), Literal(dim)))
  }

  /** Banded LSH bucket keys of a MinHash signature, packed
    * (band << 48) | bucket — see [[MinHashBandKeys]].
    */
  def graftMinHashBands(sig: Column, bands: Int): Column =
    B.column(MinHashBandKeys(B.expression(sig),
      org.apache.spark.sql.catalyst.expressions.Literal(bands)))

  /** Equal-position count of two long signatures (MinHash estimator
    * numerator) — see [[SignatureOverlap]].
    */
  def graftSigOverlap(a: Column, b: Column): Column =
    B.column(SignatureOverlap(B.expression(a), B.expression(b)))

  /** Per-document bigram stats struct (total, distinct, max count) in
    * one codegen'd pass — see [[BigramStats]].
    */
  def graftBigramStats(text: Column): Column =
    B.column(BigramStats(B.expression(text)))

  /** Karp-Rabin word hash (base 131 mod 1000003) in one codegen'd char
    * loop — see [[KarpRabinHash]].
    */
  def graftWordHash(word: Column): Column =
    B.column(KarpRabinHash(B.expression(word)))

  /** Character n-grams of the canonical rendering (with multiplicity,
    * optional prefix cap) in one codegen'd pass — see [[CharGrams]].
    */
  def graftCharGrams(text: Column, n: Int, maxChars: Int): Column = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    B.column(CharGrams(B.expression(text), Literal(n), Literal(maxChars)))
  }

  /** Per-document word-n-gram CHARACTER statistics for the Gopher
    * n-gram repetition rules — ten longs in one codegen'd pass, see
    * [[GopherNgramStats]].
    */
  def graftNgramRepStats(text: Column): Column =
    B.column(GopherNgramStats(B.expression(text)))

  /** Packed multi-block banding keys of a SimHash fingerprint — one
    * array<long>, (comboId << 48) | chunk bits. See [[SimHashBandKeys]].
    */
  def graftSimHashBands(simhash: Column, pieces: Int, maxHamming: Int): Column =
    B.column(SimHashBandKeys(B.expression(simhash),
      org.apache.spark.sql.catalyst.expressions.Literal(pieces),
      org.apache.spark.sql.catalyst.expressions.Literal(maxHamming)))

  /** MinHash signature aggregate over per-row shingle hashes: a k-long
    * array of elementwise minima of k affine permutations of the hash.
    */
  def graftMinHash(hash: Column, k: Int): Column =
    B.column(
      MinHashSig(B.expression(hash),
        org.apache.spark.sql.catalyst.expressions.Literal(k))
        .toAggregateExpression())

  /** Misra–Gries heavy-hitter summary aggregate: at most k counters plus
    * the exact total decremented weight (`spilled`), so every item whose
    * true count exceeds `spilled` is guaranteed present and estimates
    * satisfy est <= true <= est + spilled.
    */
  def graftHeavyHitters(item: Column, k: Int): Column =
    B.column(
      HeavyHitters(B.expression(item),
        org.apache.spark.sql.catalyst.expressions.Literal(k))
        .toAggregateExpression())

  /** Bloom-filter build aggregate over a key column: the fixed-size
    * bitmap (binary) of Spark's own runtime-filter sketch
    * (`org.apache.spark.util.sketch.BloomFilter`, built by Catalyst's
    * `BloomFilterAggregate` — map-side combinable, per-task bitmaps merge
    * with OR). Keys are hashed with xxhash64 (seed 42); probe with
    * [[graftMightContain]], which hashes identically.
    */
  def graftBloomAgg(key: Column, expectedItems: Long, numBits: Long): Column =
    B.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        new org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(B.expression(key))),
        org.apache.spark.sql.catalyst.expressions.Literal(expectedItems),
        org.apache.spark.sql.catalyst.expressions.Literal(numBits))
        .toAggregateExpression())

  /** Membership probe against a [[graftBloomAgg]] bitmap. The bitmap must
    * be foldable (a literal) or a scalar subquery — Catalyst
    * constant-folds the deserialization once and codegens the per-row
    * probe. No false negatives; ~fpp false positives.
    */
  def graftMightContain(bloom: Column, key: Column): Column =
    B.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        B.expression(bloom),
        new org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(B.expression(key)))))
}
