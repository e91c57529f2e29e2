package graft.streaming

import graft.operators.Dsir
import org.apache.spark.sql.{DataFrame, Dataset, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import java.nio.file.{Files, Paths}

/** Streaming DSIR scoring — the unbounded twin of the q_dsir_sample
  * batch scorer: the two hashed-n-gram bucket multinomials are fit ONCE
  * on a bounded reference corpus and FROZEN ([[Dsir.modelTerms]], a
  * <= B-row table — a standing artifact like the posting index), then
  * every arriving micro-batch of documents is scored against that
  * frozen model — the deployment shape where selection happens at
  * ingest time, before a document is ever admitted to the corpus.
  *
  * Per-batch cost is the batch's own feature explode plus a broadcast
  * join against the frozen terms; NO state grows with the stream (the
  * model is immutable, scoring is stateless per document), so stream
  * length never appears in any per-batch plan. Features outside the
  * model's observed bucket set take the smoothed unseen-bucket term
  * ([[Dsir.unseenTerm]]) — new vocabulary cannot silently vanish from
  * a score.
  *
  * Store layout (parquet, one DETERMINISTIC subdirectory per
  * micro-batch keyed by the streaming batchId — the [[IndexStream]]
  * idempotent-sink contract): storeDir/scores/batch=<id>/ holds that
  * batch's (id, n_feats, score). foreachBatch is at-least-once; a
  * replayed batch overwrites its own directory with identical rows
  * (scoring is a pure function of the frozen model and the batch), so
  * the store converges regardless of redelivery.
  */
object DsirStream {

  def start(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      terms: DataFrame,
      defaultTerm: java.math.BigDecimal,
      buckets: Int,
      storeDir: String,
      checkpointDir: String): StreamingQuery = {
    Files.createDirectories(Paths.get(storeDir))
    // Enforce the frozen-model contract HERE, not by caller discipline:
    // a lazy `terms` plan over a changing source would silently refit
    // per micro-batch. The freeze must also be DURABLE for a stream
    // designed to run forever: localCheckpoint blocks live only on the
    // executors that wrote them, so losing one (spot churn, OOM kill)
    // would fail every later micro-batch with a missing-block error.
    // The model is <= B rows by construction — collect it and rebuild a
    // driver-owned local relation instead.
    val spark = terms.sparkSession
    val frozen = spark.createDataFrame(
      java.util.Arrays.asList(terms.collect(): _*), terms.schema)
    docs.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        scoreBatch(batch.toDF(), textCol, idCol, frozen, defaultTerm,
          buckets, storeDir, batchId)
      }
      .start()
  }

  def scoreBatch(batch: DataFrame, textCol: String,
      idCol: String, terms: DataFrame, defaultTerm: java.math.BigDecimal,
      buckets: Int, storeDir: String, batchId: Long): Unit = {
    if (!batch.isEmpty) {
      Dsir.scoreAgainst(batch, textCol, idCol, terms, buckets,
          defaultTerm = Some(defaultTerm))
        .write.mode(SaveMode.Overwrite)
        .parquet(s"$storeDir/scores/batch=$batchId")
    }
  }

  /** All scores accumulated so far. An empty store (every micro-batch
    * empty, so no batch directory was ever written) is a VALID state —
    * an empty score table, not an AnalysisException (the [[IndexStream]]
    * readStore lesson).
    */
  def scores(spark: SparkSession, storeDir: String, idCol: String): DataFrame =
    if (!Files.exists(Paths.get(storeDir, "scores"))) {
      import spark.implicits._
      Seq.empty[(Long, Long, Double)].toDF(idCol, "n_feats", "score")
    } else
      spark.read.parquet(s"$storeDir/scores")
        .select(col(idCol), col("n_feats"), col("score"))
}
