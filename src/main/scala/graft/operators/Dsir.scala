package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): pick raw-corpus documents whose hashed-n-gram
  * profile looks like a small high-quality TARGET corpus. The published
  * recipe, re-expressed as Spark aggregates:
  *
  *  1. FEATURES — every unigram and space-joined bigram of the
  *     whitespace token stream, hashed into a fixed bucket domain
  *     (md5 hex prefix mod B, the repo's oracle-replayable hash).
  *  2. BAG-OF-BUCKETS MODELS — two multinomials over the bucket
  *     domain, one fit on the target slice, one on the raw slice,
  *     each with add-one smoothing (denominators total+B).
  *  3. IMPORTANCE WEIGHT — per raw document, the log-likelihood
  *     ratio sum over its feature occurrences:
  *     log w(x) = sum_b c_b(x) * (ln p_tgt(b) - ln p_raw(b)).
  *  4. RESAMPLE — keep the top-K raw documents by weight (Xie et
  *     al.'s Gumbel top-k degenerates to plain top-k at temperature
  *     0; the deterministic form is what an oracle can replay).
  *
  * Numeric discipline is [[TermIndex.bigramLmScore]]'s: the per-bucket
  * log-ratio rounds to 9 decimals and becomes DECIMAL(28,9), per-doc
  * sums weight those decimals by DECIMAL(9,0) counts, and the total
  * rounds to 4 decimals before the double cast — bit-identical in any
  * engine that implements decimal arithmetic.
  *
  * 100 TB shape: the feature explode is a linear corpus scan feeding a
  * map-side-combinable (doc, bucket) count; both model tables are at
  * most B rows (B = 4096 here) and BROADCAST back onto the per-doc
  * aggregate; the totals are scalar cross joins. Nothing pairs the
  * corpus with itself and no global sort exists anywhere — top-K
  * selection finds the boundary score by iterative equal-width
  * histogram refinement (each level collects at most `fanout` bucket
  * counts, the interval shrinks geometrically), then flags strict
  * winners/losers with scan filters and runs an id-ordered window over
  * ONLY the boundary score's rows. Unlike
  * [[BudgetSample.fillTokenBudget]] (whose priority domain is bounded
  * by construction), DSIR scores are per-doc LLR sums whose distinct
  * count grows with the corpus — so the driver never collects
  * one-row-per-distinct-score; it collects fixed-size histograms.
  */
object Dsir {

  /** Hashed n-gram occurrences: one (id, flag, bucket) row per unigram
    * and per bigram of the document's LOWERCASED whitespace token
    * stream (the [[TermIndex]]/[[QualityClassifier]]/[[WordPiece]]
    * tokenization discipline — batch and streaming callers get the
    * same case-folding without ad hoc pre-lowering), where
    * `flag` carries the caller's target predicate alongside the
    * explode (so no re-join on id is ever needed). The bucket is the
    * first 6 md5 hex chars as an integer, mod `buckets` — non-negative
    * by construction (24 bits), replayable in DuckDB as
    * CAST(concat('0x', substr(md5(g),1,6)) AS BIGINT) % B.
    *
    * Unigrams and bigrams are two scans of the token arrays (the
    * [[TermIndex.bigramLmScore]] minimum); the bigram leg filters to
    * size >= 2 BEFORE the position sequence so `element_at` never sees
    * an out-of-range index under ANSI mode.
    */
  def featureOccurrences(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      isTarget: Column,
      buckets: Int): DataFrame = {
    require(buckets > 0, "bucket domain must be non-empty")
    val base = docs.select(col(idCol).as("id"), isTarget.as("_tgt"),
      TextAnalysis.words(lower(col(textCol))).as("_ws"))
    val uni = base.select(col("id"), col("_tgt"),
      explode(col("_ws")).as("g"))
    val bi = base.filter(size(col("_ws")) >= 2)
      .select(col("id"), col("_tgt"),
        explode(transform(sequence(lit(2), size(col("_ws"))),
          i => concat_ws(" ", element_at(col("_ws"), i - 1),
            element_at(col("_ws"), i)))).as("g"))
    uni.unionAll(bi).select(col("id"), col("_tgt"),
      pmod(conv(substring(md5(col("g")), 1, 6), 16, 10).cast(LongType),
        lit(buckets.toLong)).as("bucket"))
  }

  /** The frozen model: per-bucket 9-decimal log-likelihood-ratio terms
    * fit on `docs` (target slice vs raw slice). Emitted only for
    * OBSERVED buckets — an unobserved bucket can never be multiplied by
    * a nonzero count downstream, so the full 0..B-1 domain never needs
    * materializing. At most `buckets` rows: a broadcastable standing
    * artifact ([[graft.streaming.DsirStream]] scores an unbounded
    * document stream against exactly this table).
    */
  def modelTerms(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      isTarget: Column,
      buckets: Int = 4096): DataFrame = {
    // ONE corpus explode: both classes' per-bucket counts come from a
    // single conditional aggregate, and the totals are sums over that
    // <= B-row table — the four-filtered-branches formulation planned
    // the tokenize+explode subtree four times (Spark shares no common
    // subtrees across aggregation branches), quadrupling the dominant
    // corpus-scan cost of a model fit.
    termsFromOccurrences(
      featureOccurrences(docs, textCol, idCol, isTarget, buckets), buckets)
  }

  /** [[modelTerms]]'s aggregate half over an already-built feature
    * stream — split out so [[importanceScores]] can fit the model and
    * score from ONE tokenize+hash pass.
    */
  private def termsFromOccurrences(occ: DataFrame, buckets: Int): DataFrame = {
    val counts = occ.groupBy(col("bucket")).agg(
      sum(when(col("_tgt"), 1L).otherwise(0L)).as("_ct"),
      sum(when(!col("_tgt"), 1L).otherwise(0L)).as("_cr"))
    val totals = counts.agg(
      sum(col("_ct")).as("_t"), sum(col("_cr")).as("_r"))
    counts
      .crossJoin(broadcast(totals))
      .select(col("bucket"),
        round(
          log((col("_ct").cast(DoubleType) + 1.0) /
            (col("_t").cast(DoubleType) + buckets)) -
          log((col("_cr").cast(DoubleType) + 1.0) /
            (col("_r").cast(DoubleType) + buckets)), 9)
          .cast(DecimalType(28, 9)).as("_term"))
  }

  /** Score arbitrary documents against a frozen `terms` model table
    * ((bucket, _term) as produced by [[modelTerms]] — possibly read
    * back from a persisted artifact): one feature explode, one
    * map-side-combinable (doc, bucket) count, one broadcast join.
    * Returns (idCol, n_feats, score) for every input document with at
    * least one feature.
    *
    * `defaultTerm`, when given, is the LLR of a bucket the fit never
    * observed ([[unseenTerm]]) and applies to features outside the
    * model's bucket set — the streaming case, where new documents
    * contain n-grams the frozen fit never saw. When None, every scored
    * feature must hit the model (true for [[importanceScores]], where
    * raw-side buckets are observed by construction) — an inner join,
    * so violating that assumption silently drops features; pass a
    * default whenever the scored corpus is not the fit corpus.
    */
  def scoreAgainst(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      terms: DataFrame,
      buckets: Int = 4096,
      defaultTerm: Option[java.math.BigDecimal] = None): DataFrame = {
    val perDoc = featureOccurrences(docs, textCol, idCol, lit(false), buckets)
      .groupBy(col("id"), col("bucket")).agg(count(lit(1)).as("_c"))
    val joined = defaultTerm match {
      case None => perDoc.join(broadcast(terms), "bucket")
      case Some(d) => perDoc.join(broadcast(terms), Seq("bucket"), "left")
        .withColumn("_term",
          coalesce(col("_term"), lit(d).cast(DecimalType(28, 9))))
    }
    joined.groupBy(col("id"))
      .agg(sum(col("_c")).as("n_feats"),
        round(sum(col("_c").cast(DecimalType(9, 0)) * col("_term")), 4)
          .cast(DoubleType).as("score"))
      .withColumnRenamed("id", idCol)
  }

  /** The LLR term of a bucket with zero observations on both sides of
    * the fit: ln((0+1)/(T+B)) - ln((0+1)/(R+B)), rounded exactly like
    * [[modelTerms]] rounds observed terms. T and R are the fit's total
    * feature counts ([[featureTotals]]).
    */
  def unseenTerm(tgtTotal: Long, rawTotal: Long, buckets: Int): java.math.BigDecimal =
    java.math.BigDecimal.valueOf(
        math.log(1.0 / (tgtTotal.toDouble + buckets)) -
        math.log(1.0 / (rawTotal.toDouble + buckets)))
      .setScale(9, java.math.RoundingMode.HALF_UP)

  /** Total feature occurrences of the fit corpus's (target, raw)
    * halves — the T and R that [[unseenTerm]] needs when a frozen
    * model will score documents outside the fit corpus.
    */
  def featureTotals(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      isTarget: Column,
      buckets: Int = 4096): (Long, Long) = {
    val r = featureOccurrences(docs, textCol, idCol, isTarget, buckets)
      .agg(sum(when(col("_tgt"), 1L).otherwise(0L)).as("_t"),
        sum(when(!col("_tgt"), 1L).otherwise(0L)).as("_r"))
      .head()
    (if (r.isNullAt(0)) 0L else r.getLong(0),
      if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** Per-raw-document importance scores against the target slice:
    * [[modelTerms]] fit on the whole corpus, then [[scoreAgainst]] over
    * its raw half. Returns (idCol, n_feats, score) for documents where
    * `isTarget` is false and at least one feature exists; `isTarget`
    * must be a deterministic predicate over `docs`' columns.
    *
    * A raw-side feature always has a model term: every raw bucket is
    * observed by construction, so the inner broadcast join in
    * [[scoreAgainst]] drops nothing here.
    */
  def importanceScores(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      isTarget: Column,
      buckets: Int = 4096): DataFrame = {
    // ONE tokenize+hash pass for BOTH halves of the job: the model fit
    // (per-bucket class counts) and the scoring aggregate (per-(doc,
    // bucket) counts over the raw slice) each consume the same feature
    // stream, and the md5 per n-gram explode is the operator's dominant
    // cost — an unpinned composition re-tokenized and re-hashed the
    // corpus for the scoring pass (measured ~0.4 s of q_dsir_sample's
    // 1.5 s at sf0.1). The pinned stream is three narrow columns
    // (id, bool, bucket), far cheaper to materialize than to recompute.
    // occ.filter(!_tgt) == featureOccurrences(docs.filter(!isTarget))
    // row-for-row: _tgt carries the same predicate, and NULL predicate
    // rows drop under both forms.
    val occ = featureOccurrences(docs, textCol, idCol, isTarget, buckets)
      .localCheckpoint()
    val terms = termsFromOccurrences(occ, buckets)
    val perDoc = occ.filter(!col("_tgt"))
      .groupBy(col("id"), col("bucket")).agg(count(lit(1)).as("_c"))
    perDoc.join(broadcast(terms), "bucket")
      .groupBy(col("id"))
      .agg(sum(col("_c")).as("n_feats"),
        round(sum(col("_c").cast(DecimalType(9, 0)) * col("_term")), 4)
          .cast(DoubleType).as("score"))
      .withColumnRenamed("id", idCol)
  }

  /** Flag the top-`k` rows by (`scoreCol` desc, `idCol` asc) with a
    * boolean `selected` — equivalent to row_number() <= k over that
    * global order, built WITHOUT the global sort AND without unbounded
    * driver state:
    *
    *  1. LOCATE the boundary score (the k-th largest value) by
    *     iterative equal-width histogram refinement: split the current
    *     [lo, hi] score interval into `fanout` buckets and collect ONE
    *     grouped scan per level (<= fanout + 2 driver rows — the
    *     buckets plus above/below cells, each carrying row count and
    *     distinct-score count), walk the buckets descending against the
    *     exact above-interval count, and narrow to the bucket that must
    *     contain the boundary (widened one bucket each side against
    *     float binning edge error — containment stays exact because
    *     `above` comes from a real comparison cell, not bucket math).
    *  2. Once the interval holds <= `maxDistinct` distinct scores,
    *     collect those per-score counts and finish the prefix-sum walk
    *     exactly.
    *  3. Strictly-better rows are flagged by a scan filter, strictly
    *     worse by another, and only the single boundary score's rows
    *     run an id-ordered window.
    *
    * Driver memory per step is <= max(fanout, maxDistinct) rows no
    * matter how many distinct scores the corpus produces (DSIR scores
    * are per-doc LLR sums — their distinct count grows with corpus
    * size, so the [[BudgetSample]] collect-every-distinct-priority
    * construction would be O(docs) here). Levels are logarithmic: each
    * narrows the interval to 3/fanout of its width, and massive ties
    * collapse `countDistinct` instead of width.
    *
    * Caller contract: `scores` is scanned several times per refinement
    * level (count-distinct, histogram, above-interval count) plus the
    * final three flagging slices — materialize it first
    * (localCheckpoint/persist, as q_dsir_sample does) unless its plan
    * is a trivial scan.
    */
  def selectTopK(
      scores: DataFrame,
      scoreCol: String,
      idCol: String,
      k: Long,
      fanout: Int = 1024,
      maxDistinct: Int = 4096): DataFrame = {
    require(k >= 0, "k must be non-negative")
    require(fanout >= 4 && maxDistinct >= 1, "degenerate refinement knobs")
    val s = col(scoreCol)
    val stats = scores.agg(
      count(lit(1)).as("_n"),
      // ±Infinity is as fatal as NaN here: an infinite hi makes the
      // bucket width infinite, one narrowing collapses the interval to
      // [Inf, Inf] with w = NaN (neither degenerate-width guard fires
      // on NaN), and the final walk ends in the spurious
      // "refinement lost the boundary" require
      count(when(s.isNull || isnan(s) ||
        s === Double.PositiveInfinity || s === Double.NegativeInfinity,
        lit(1))).as("_bad"),
      min(s).as("_lo"), max(s).as("_hi")).head()
    val n = stats.getLong(0)
    require(stats.getLong(1) == 0L,
      s"null/NaN/Inf $scoreCol: scores must be finite and orderable")
    if (k >= n) return scores.withColumn("selected", lit(true))
    if (k == 0L) return scores.withColumn("selected", lit(false))
    var lo = stats.getDouble(2)
    var hi = stats.getDouble(3)

    // Narrow [lo, hi] around the k-th largest score until the interval
    // holds few enough distinct values to collect exactly. ONE grouped
    // scan per level: every row lands in exactly one cell (-1 above the
    // interval, -2 below, else its histogram bucket — a deterministic
    // function of the score, so per-cell countDistinct sums to the
    // interval's exact distinct count), carrying the histogram, the
    // above-count, and the distinct readout together.
    var done = false
    while (!done) {
      val w = (hi - lo) / fanout
      if (w <= 0.0 || lo + w <= lo) done = true // degenerate width
      else {
        val cells = scores.groupBy(
            when(s > hi, lit(-1L))
              .when(s < lo, lit(-2L))
              .otherwise(least(floor((s - lit(lo)) / lit(w)), lit(fanout - 1))
                .cast(LongType)).as("_b"))
          .agg(count(lit(1)).as("_n"), countDistinct(s).as("_d"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        val distinct = cells.collect { case (b, _, d) if b >= 0 => d }.sum
        if (distinct <= maxDistinct) done = true
        else {
          val above = cells.collectFirst { case (-1L, n, _) => n }.getOrElse(0L)
          val hist = cells.collect { case (b, n, _) if b >= 0 => (b, n) }
            .sortBy(-_._1)
          var acc = above
          var bucket = -1L
          val it = hist.iterator
          while (it.hasNext && bucket < 0) {
            val (b, cnt) = it.next()
            if (acc + cnt < k) acc += cnt else bucket = b
          }
          // One-bucket guard band each side: floor() on doubles can bin
          // an edge value one bucket off, never further.
          val newLo = math.max(lo, lo + (bucket - 1) * w)
          val newHi = math.min(hi, lo + (bucket + 2) * w)
          if (newLo <= lo && newHi >= hi) done = true // no progress: finish
          else { lo = newLo; hi = newHi }
        }
      }
    }

    val above = scores.filter(s > hi).count()
    val cand = scores.filter(s.between(lo, hi))
      .groupBy(s).agg(count(lit(1)).as("_n"))
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
      .sortBy(-_._1)
    var acc = above
    var boundary = Option.empty[Double]
    var remaining = 0L
    val it = cand.iterator
    while (it.hasNext && boundary.isEmpty) {
      val (p, c) = it.next()
      if (acc + c <= k) acc += c
      else { boundary = Some(p); remaining = k - acc }
    }
    require(boundary.isDefined || acc >= k,
      "refinement lost the boundary score — interval containment broken")
    boundary match {
      case None =>
        // k falls exactly on a score-count prefix: everything >= the
        // last candidate taken is selected, everything below is not.
        val cut = cand.last._1
        scores.withColumn("selected", s >= cut)
      case Some(b) =>
        // Three scan-speed slices, windowed ONLY on the boundary score
        // (an unpartitioned window, but over one score's tied rows).
        // Strict winners and losers never shuffle.
        val winners = scores.filter(s > b)
          .withColumn("selected", lit(true))
        val losers = scores.filter(s < b)
          .withColumn("selected", lit(false))
        val edge = scores.filter(s === b)
          .withColumn("_rk", row_number().over(Window.orderBy(col(idCol))))
          .withColumn("selected", col("_rk") <= remaining)
          .drop("_rk")
        winners.unionByName(losers).unionByName(edge)
    }
  }
}
