package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The composed training-data curation pipeline: what a corpus actually
  * goes through before pre-training, built entirely from the operator
  * library so every stage is individually oracle-verified and the
  * composition is one declarative plan (single pass + one window — no
  * materialization between stages):
  *
  *  1. near-exact dedup on the content fingerprint (whitespace/case
  *     normalized md5) keeping the smallest id per group;
  *  2. quality gate: composite score >= minQuality;
  *  3. language gate: keep only `keepLang` documents (stopword-heuristic
  *     language id);
  *  4. enrich with token counts + the fingerprint for downstream sharding.
  *
  * Scale: the only shuffle is the dedup window keyed by fingerprint
  * (high cardinality); every gate is a scan-speed expression filter that
  * Catalyst pushes below the window where legal.
  */
object CuratePipeline {

  def curate(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      minQuality: Double = 0.7,
      keepLang: String = "en"): DataFrame = {
    val fp = TextAnalysis.fingerprint(col(textCol))
    val w = Window.partitionBy(col("_fp")).orderBy(col(idCol))
    docs
      .withColumn("_fp", fp)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
      .withColumn("lang_pred", TextAnalysis.langId(col(textCol)))
      .filter(col("lang_pred") === keepLang)
      .transform(TextAnalysis.withQuality(_, textCol))
      .filter(col("quality_score") >= minQuality)
      .select(col(idCol), col("_fp").as("fingerprint"), col("lang_pred"),
        col("quality_score"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("ws_tokens"),
        TextAnalysis.bpeishTokenCount(col(textCol)).cast("long").as("bpeish_tokens"))
  }
}
