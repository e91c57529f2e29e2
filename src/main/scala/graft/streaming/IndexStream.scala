package graft.streaming

import graft.operators.TermIndex
import org.apache.spark.sql.{DataFrame, Dataset, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import java.nio.file.{Files, Paths}

/** Streaming maintenance of the RAW inverted index — the unbounded twin
  * of the q_sparse_knn_incr batch merge: documents arrive on a stream,
  * each micro-batch contributes its own batch-sized posting aggregate
  * ([[TermIndex.rawIndex]] — (id, word, tf) rows) plus its row count,
  * and the standing side is NEVER recomputed. Because df/idf derive
  * from the merged postings at weight time ([[TermIndex
  * .weightsFromRaw]]), appending postings + adding doc counts IS the
  * complete index update; retrieval through the maintained store is
  * provably identical to a from-scratch rebuild over everything seen
  * (IndexStreamSpec's stream==batch differential).
  *
  * Store layout (parquet; one DETERMINISTIC subdirectory per
  * micro-batch, keyed by the streaming batchId):
  *   storeDir/postings/batch=<id>/  — that batch's (id, word, tf)
  *   storeDir/meta/batch=<id>/      — that batch's (_n); N = sum
  *
  * Scale shape: per micro-batch cost is one explode + one keyed
  * aggregate over the BATCH (map-side combinable); the standing
  * posting table is written once and only ever appended to. At 100 TB
  * the postings dir is term-bucketed so the retrieval join stays
  * co-located; compaction of small per-batch slices is the
  * [[graft.operators.Compaction]] job run on the index like any table.
  * Exactly-once by IDEMPOTENCE, not by append: foreachBatch is
  * at-least-once (a crash between the sink write and the checkpoint
  * commit re-delivers the batch), so each batch OVERWRITES its own
  * batchId-keyed subdirectory — a replay rewrites the identical slice
  * instead of duplicating postings and inflating df/N. This is the
  * standard idempotent-sink contract foreachBatch's batchId exists
  * for.
  */
object IndexStream {

  /** Start maintaining the index store from a document stream with
    * columns (idCol, textCol). AvailableNow/trigger choices are the
    * caller's via the returned query's options — tests use the default
    * micro-batch trigger over a MemoryStream.
    */
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
        appendBatch(batch, textCol, idCol, storeDir, batchId)
      }
      .start()
  }

  /** One micro-batch's contribution: batch-sized postings + its doc
    * count, OVERWRITING the batch's own batchId-keyed slice so a
    * replayed batch is idempotent (see the class doc). Also the unit
    * the batch path (q_sparse_knn_incr) and the stream share — both
    * call this semantics, so the differential spec proves the
    * streaming plumbing, not a fork of the merge logic.
    */
  def appendBatch(batch: DataFrame, textCol: String, idCol: String,
      storeDir: String, batchId: Long): Unit = {
    if (!batch.isEmpty) {
      TermIndex.rawIndex(batch, textCol, idCol)
        .write.mode(SaveMode.Overwrite)
        .parquet(s"$storeDir/postings/batch=$batchId")
      TermIndex.docCount(batch)
        .write.mode(SaveMode.Overwrite)
        .parquet(s"$storeDir/meta/batch=$batchId")
    }
  }

  /** Read the maintained store back as (postings, nDocs) — the inputs
    * [[TermIndex.weightsFromRaw]] needs. Per-batch posting slices are
    * disjoint by id (each doc arrives once), so no merge pass is
    * needed; N is the sum of the per-batch counts. The batchId
    * partition column from the slice layout is dropped — it is sink
    * bookkeeping, not index content.
    */
  def readStore(spark: SparkSession, storeDir: String): (DataFrame, DataFrame) = {
    import spark.implicits._
    // r12 ADVICE: if every micro-batch was empty, appendBatch never
    // created postings/ or meta/ — an empty index is a VALID store
    // state (zero postings, N = 0), not an AnalysisException. The two
    // sides are guarded INDEPENDENTLY (the DedupStream.readStore
    // discipline): appendBatch writes postings THEN meta, so a crash
    // between the two leaves an orphaned postings slice — meta absent
    // or behind — until the batch replays; reading must not throw in
    // that window.
    val postings =
      if (!Files.exists(Paths.get(storeDir, "postings")))
        Seq.empty[(Long, String, Long)].toDF("id", "word", "tf")
      else spark.read.parquet(s"$storeDir/postings")
        .select(col("id"), col("word"), col("tf"))
    val n =
      if (!Files.exists(Paths.get(storeDir, "meta")))
        Seq(0L).toDF("_n")
      else spark.read.parquet(s"$storeDir/meta")
        .agg(coalesce(sum(col("_n")), lit(0L)).cast("long").as("_n"))
    (postings, n)
  }

  /** Retrieval over the maintained store: weight, then the standard
    * query half ([[TermIndex.sparseKnnFromIndex]]). The derived
    * weights are checkpointed — sparseKnnFromIndex reads them three
    * times (norms, query postings, dots), and without materialization
    * the df join and weight formula would re-execute per consumer
    * (the batch siblings' localCheckpoint discipline).
    */
  def sparseKnn(spark: SparkSession, storeDir: String, queries: DataFrame,
      k: Int = 5): DataFrame = {
    val (postings, n) = readStore(spark, storeDir)
    TermIndex.sparseKnnFromIndex(
      TermIndex.weightsFromRaw(postings, n).localCheckpoint(), queries, k)
  }
}
