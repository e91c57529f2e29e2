package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Term-level corpus structures: TF-IDF scoring and an inverted index.
  * Both follow the canonical two-aggregate shape — explode words once,
  * aggregate per (doc, term) and per term, equi-join on the term — so
  * every shuffle is keyed on the high-cardinality term column and the
  * plans scale with corpus size, never with vocabulary held in one place.
  */
object TermIndex {

  private def words(textCol: Column): Column =
    filter(split(trim(lower(textCol)), "\\s+"), w => length(w) > 0)

  /** (id, word) occurrence rows — one per word INSTANCE (duplicates kept;
    * term frequency needs the multiset, unlike the shingle set ops).
    */
  private def occurrences(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
      explode(words(col(textCol))).as("word"))

  /** Top-k terms per document by TF-IDF.
    *
    * tf = in-document occurrence count; idf = ln((N+1)/(df+1)) with N =
    * total documents (the +1 smoothing keeps corpus-universal terms
    * finite); score = tf * idf rounded to 4 decimals so the ranking is
    * engine-reproducible (ties then break on the word). Output:
    * (id, word, tfidf, term_rank) with term_rank in 1..k.
    *
    * Plan: one explode scan feeds BOTH aggregates (per-(doc,word) tf and
    * per-word df — Spark computes them as two shuffles over the same
    * child), df re-joins tf on the term key, and the top-k is a
    * row_number window partitioned by document. The df side is
    * vocabulary-sized — orders of magnitude smaller than the occurrence
    * stream — and the join is an equi-join on the term, so nothing in the
    * plan ever holds the vocabulary in a single partition. N arrives via
    * a 1-row cross join (broadcast by construction).
    */
  def tfidfTopTerms(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      k: Int = 3): DataFrame = {
    val occ = occurrences(docs, textCol, idCol)
    val tf = occ.groupBy(col("id"), col("word")).agg(count(lit(1)).as("tf"))
    val df = occ.groupBy(col("word")).agg(countDistinct(col("id")).as("df"))
    val n = docs.agg(count(lit(1)).as("_n"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("tfidf").desc, col("word"))
    tf.join(df, "word")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf") * log((col("_n") + 1).cast("double") /
          (col("df") + 1).cast("double")), 4))
      .withColumn("term_rank", row_number().over(w))
      .filter(col("term_rank") <= k)
      .select(col("id"), col("word"), col("tfidf"), col("term_rank"))
  }

  /** Vocabulary coverage curve — the Zipf head of the corpus: the top-k
    * tokens by occurrence count with rank and the CUMULATIVE share of
    * all token occurrences they cover (the "how big must the vocabulary
    * be to cover 95% of the stream" question tokenizer training asks).
    * Ties break on the token so the ranking is engine-reproducible.
    *
    * Plan: one explode scan, one token-keyed aggregate (map-side
    * partial combine does the heavy lifting — a Zipfian stream collapses
    * hard inside each task), then a distributed top-k
    * (TakeOrderedAndProject, never a full sort), and only THEN a
    * single-partition running-sum window — over exactly k rows, not the
    * vocabulary. The total arrives via a 1-row broadcast cross join.
    */
  def vocabCoverage(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      k: Int = 50): DataFrame = {
    val occ = occurrences(docs, textCol, idCol)
    val counts = occ.groupBy(col("word")).agg(count(lit(1)).as("n_occ"))
    // The stream total is the sum of the per-word counts — derived from
    // the vocabulary-sized aggregate, NOT a second corpus explode.
    val total = counts.agg(sum(col("n_occ")).as("_total"))
    val top = counts.orderBy(col("n_occ").desc, col("word")).limit(k)
    val w = Window.orderBy(col("n_occ").desc, col("word"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    top.crossJoin(broadcast(total))
      .withColumn("token_rank", row_number().over(
        Window.orderBy(col("n_occ").desc, col("word"))))
      .withColumn("cum_share",
        round(sum(col("n_occ")).over(w).cast("double") / col("_total"), 6))
      .select(col("word"), col("n_occ"), col("token_rank"), col("cum_share"))
  }

  /** Unigram language-model quality scoring — the CCNet-style filter
    * signal: train a unigram LM on the corpus itself (top-`vocabSize`
    * tokens by occurrence count, ties on the token; everything else
    * pools into one OOV bucket whose mass is the leftover count), then
    * score every document by its average negative log-likelihood under
    * that model. Natural-sounding text full of common tokens scores
    * low; gibberish, boilerplate codes, and rare-token soup score high
    * — sort descending and the junk floats to the top, which is exactly
    * how perplexity filtering curates a crawl.
    *
    * Probabilities are unsmoothed corpus MLE (p = n/T, OOV = mass/T
    * with a floor of one count so the expression is total) — every
    * token's probability is positive by construction since the model is
    * trained on the very stream it scores.
    *
    * Plan: one explode scan; one word-keyed count aggregate (map-side
    * combine collapses the Zipf head in-task); the vocabulary is
    * top-V by construction — BOUNDED, so it broadcasts and the
    * corpus-sized occurrence stream is scored with a broadcast
    * left-join + coalesce, never shuffled on the word; the final
    * per-document average shuffles once on the document id. Totals and
    * OOV mass arrive via a 1-row broadcast cross join.
    */
  def unigramLogProbScore(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      vocabSize: Int = 4096): DataFrame = {
    val occ = occurrences(docs, textCol, idCol)
    val counts = occ.groupBy(col("word")).agg(count(lit(1)).as("_n"))
    val vocab = counts.orderBy(col("_n").desc, col("word")).limit(vocabSize)
    // The stream total is the sum of the per-word counts — derived from
    // the vocabulary-sized aggregate instead of a second corpus explode,
    // so training the model costs ONE corpus scan, scoring the other.
    val totals = counts.agg(sum(col("_n")).as("_t"))
      .crossJoin(broadcast(vocab.agg(sum(col("_n")).as("_inv"))))
      .select(col("_t"),
        greatest(col("_t") - coalesce(col("_inv"), lit(0L)), lit(1L))
          .as("_oov_mass"))
    occ
      .join(broadcast(vocab), Seq("word"), "left")
      .crossJoin(broadcast(totals))
      .select(col("id"),
        coalesce(
          log(col("_n").cast("double") / col("_t").cast("double")),
          log(col("_oov_mass").cast("double") / col("_t").cast("double")))
          .as("_lp"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(-avg(col("_lp")), 6).as("avg_nll"))
      .withColumnRenamed("id", idCol)
  }

  /** Inverted index restricted to a document-frequency band: for each
    * term with minDf <= df <= maxDf, its df and the posting list of
    * document ids (sorted, comma-joined — a string so the artifact is
    * engine- and layout-portable).
    *
    * Two-pass on purpose: df is computed FIRST and the band filter
    * applied BEFORE any posting list materializes, so a stop word with
    * df = half the corpus never builds its (huge) posting list at all —
    * the same guard as [[Dedup.jaccardPairs]]'s stop-shingle cap. The
    * band join is a semi-join on the term; at web scale the surviving
    * term set is small enough to broadcast.
    */
  def invertedIndex(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      minDf: Int,
      maxDf: Int): DataFrame = {
    val docWords = occurrences(docs, textCol, idCol)
      .select(col("id"), col("word")).distinct()
    val banded = docWords.groupBy(col("word"))
      .agg(countDistinct(col("id")).as("df"))
      .filter(col("df") >= minDf && col("df") <= maxDf)
    docWords.join(broadcast(banded), "word")
      .groupBy(col("word"), col("df"))
      .agg(concat_ws(",",
        transform(sort_array(collect_list(col("id"))),
          i => i.cast("string"))).as("postings"))
      .select(col("word"), col("df"), col("postings"))
  }
}
