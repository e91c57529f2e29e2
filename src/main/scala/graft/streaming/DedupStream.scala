package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, Dataset, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import java.nio.file.{Files, Paths}

/** Streaming near-duplicate classification — the unbounded twin of the
  * q_dedup_index_incr batch merge (reference behavior: the ingest
  * pipeline's per-batch matching of incoming rows against standing
  * state, `/root/reference/mply_ingester/backend/mply_ingester/
  * ingestion/service.py:15-40` — SKU-set extraction then apply against
  * the database — generalized from SKU equality to content
  * near-duplication): documents
  * arrive on a stream, each micro-batch is classified exact / near /
  * unique against the STANDING corpus — everything seen in strictly
  * earlier batches — through the persisted dedup index
  * ([[graft.operators.Dedup.dedupIndex]]: content fingerprint + MinHash
  * signature per doc), then contributes its own index slice. The corpus
  * is never re-paired against itself: per-batch cost is the batch's
  * signature aggregate plus a banded probe join into the standing index
  * — the 100 TB shape (the alternative, re-running corpus-wide LSH per
  * arrival, grows quadratically in stream length).
  *
  * Store layout (parquet; one DETERMINISTIC subdirectory per
  * micro-batch, keyed by the streaming batchId — the [[IndexStream]]
  * idempotent-sink contract):
  *   storeDir/status/batch=<id>/ — that batch's (doc, status, match_id)
  *   storeDir/index/batch=<id>/  — that batch's (id, signature, fp)
  *   storeDir/docs/batch=<id>/   — that batch's (id, text), for the
  *                                 exact-Jaccard verify of LATER batches
  *
  * Exactly-once by idempotence with one twist the index stream does not
  * need: foreachBatch is at-least-once, and a crash AFTER this batch's
  * index slice lands but BEFORE the checkpoint commit re-delivers the
  * batch — at which point the standing store already contains the
  * batch's own documents, and classifying against them would report
  * every replayed doc as an exact duplicate of itself. [[readStore]]
  * therefore filters the batchId partition column to batches STRICTLY
  * BEFORE the one being classified, so a replay recomputes the
  * identical status slice from the identical standing view.
  */
object DedupStream {

  def start(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      storeDir: String,
      checkpointDir: String): StreamingQuery = {
    Files.createDirectories(Paths.get(storeDir))
    docs.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        classifyBatch(batch.sparkSession, batch.toDF(), textCol, idCol,
          storeDir, batchId)
      }
      .start()
  }

  /** One micro-batch: classify against the standing (strictly earlier)
    * store, then append this batch's index + docs slices — all three
    * writes OVERWRITE the batch's own batchId-keyed subdirectory, so a
    * replayed batch rewrites identical slices (see the class doc).
    * Within-batch duplicates classify as `unique` — the batch is
    * classified against the standing corpus only, exactly like the
    * batch sibling's incoming/existing split; arrival order between
    * batches is what the stream adds.
    */
  def classifyBatch(spark: SparkSession, batch: DataFrame, textCol: String,
      idCol: String, storeDir: String, batchId: Long): Unit = {
    if (!batch.isEmpty) {
      // The batch feeds three sinks plus the classification; pin it so
      // the streaming source is not replayed per consumer, and compute
      // the MinHash signature aggregate (the expensive half) ONCE —
      // it serves both the classification and this batch's index slice.
      val pinned = batch.persist()
      try {
        val sigs = Dedup.minHashSignatures(pinned, textCol, idCol)
          .localCheckpoint()
        // fingerprint side first + LEFT join (the Dedup.dedupIndex
        // shape): a doc too short to shingle has no signature row, and
        // an inner join would drop its fingerprint from the persisted
        // index — its later exact duplicates would classify 'unique'
        val batchIndex = pinned
          .select(col(idCol).as("id"),
            Dedup.contentFingerprint(col(textCol)).as("fp"))
          .join(sigs, Seq("id"), "left")
          .select(col("id"), col("signature"), col("fp"))
        val (index, corpus) =
          readStore(spark, storeDir, textCol, idCol, beforeBatch = batchId)
        Dedup.incrementalStatusGivenSigs(index, corpus, pinned, sigs,
            textCol, idCol)
          .write.mode(SaveMode.Overwrite)
          .parquet(s"$storeDir/status/batch=$batchId")
        batchIndex
          .write.mode(SaveMode.Overwrite)
          .parquet(s"$storeDir/index/batch=$batchId")
        pinned.select(col(idCol), col(textCol))
          .write.mode(SaveMode.Overwrite)
          .parquet(s"$storeDir/docs/batch=$batchId")
      } finally pinned.unpersist()
    }
  }

  /** The maintained store as (index, corpus) — the two standing inputs
    * [[graft.operators.Dedup.incrementalStatusWithIndex]] needs.
    * `beforeBatch` bounds the view to batches strictly earlier (the
    * replay guard); external readers use the default unbounded view.
    * A store with no slices yet is a VALID empty corpus (the
    * [[IndexStream.readStore]] contract), not an AnalysisException.
    */
  def readStore(spark: SparkSession, storeDir: String, textCol: String,
      idCol: String, beforeBatch: Long = Long.MaxValue): (DataFrame, DataFrame) = {
    import spark.implicits._
    // Each side is existence-guarded INDEPENDENTLY: a crash between the
    // index and docs writes of a batch may leave one dir present and
    // the other missing, and the restart replays that batch — whose
    // slices the strictly-before filter excludes anyway. Guarding only
    // one dir would wedge the stream on an AnalysisException forever.
    val index =
      if (!Files.exists(Paths.get(storeDir, "index")))
        Seq.empty[(Long, Array[Long], String)].toDF("id", "signature", "fp")
      else spark.read.parquet(s"$storeDir/index")
        .filter(col("batch") < beforeBatch)
        .select(col("id"), col("signature"), col("fp"))
    val corpus =
      if (!Files.exists(Paths.get(storeDir, "docs")))
        Seq.empty[(Long, String)].toDF(idCol, textCol)
      else spark.read.parquet(s"$storeDir/docs")
        .filter(col("batch") < beforeBatch)
        .select(col(idCol), col(textCol))
    (index, corpus)
  }

  /** Every classified document so far: (idCol, status, match_id, batch)
    * — the batchId kept as provenance (WHEN the doc arrived determines
    * what it was classified against, so it is part of the answer here,
    * unlike the index stream's sink bookkeeping).
    */
  def statuses(spark: SparkSession, storeDir: String, idCol: String = "doc_id"): DataFrame = {
    import spark.implicits._
    if (!Files.exists(Paths.get(storeDir, "status")))
      Seq.empty[(Long, String, Long, Long)]
        .toDF(idCol, "status", "match_id", "batch")
    else
      spark.read.parquet(s"$storeDir/status")
        .select(col(idCol), col("status"), col("match_id"),
          col("batch").cast("long").as("batch"))
  }
}
