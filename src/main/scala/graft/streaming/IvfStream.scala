package graft.streaming

import graft.operators.IvfIndex
import org.apache.spark.sql.{DataFrame, Dataset, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import java.nio.file.{Files, Paths}

/** Streaming IVF store maintenance — the unbounded twin of the
  * q_ivf_incr batch append: vectors arrive on a stream, each
  * micro-batch is assigned to cells under FROZEN centroids
  * ([[graft.operators.IvfIndex.assign]] — one row-local scan) and
  * written as its own batchId-keyed slice, itself laid out
  * `partitionBy(cell)` so query-time probes prune to nprobe/nlist of
  * the store across every slice. Because assignment is a pure per-row
  * function of (vector, centroids), the maintained store is EXACTLY
  * the from-scratch assignment of everything that arrived — the
  * merged==fresh property, proven stream-side by IvfStreamSpec.
  *
  * Replay needs only the [[IndexStream]] idempotent-overwrite
  * contract: unlike [[DedupStream]] (whose classification reads the
  * standing store and must exclude the batch's own slice), assignment
  * reads nothing standing, so a re-delivered batch rewrites an
  * identical slice and nothing else can observe the difference.
  *
  * Centroids are deliberately a PARAMETER, not stream state: the
  * coarse quantizer is a build artifact trained once on a standing
  * corpus (q_ivf_incr's contract). Re-training belongs to an offline
  * rebuild that writes a NEW store — never to the append path, where
  * it would silently re-partition history.
  */
object IvfStream {

  def start(
      vecs: DataFrame,
      vecCol: String,
      idCol: String,
      centroids: Array[Array[Double]],
      storeDir: String,
      checkpointDir: String): StreamingQuery = {
    Files.createDirectories(Paths.get(storeDir))
    vecs.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        appendBatch(batch.toDF(), vecCol, idCol, centroids, storeDir, batchId)
      }
      .start()
  }

  def appendBatch(batch: DataFrame, vecCol: String, idCol: String,
      centroids: Array[Array[Double]], storeDir: String, batchId: Long): Unit = {
    if (!batch.isEmpty) {
      IvfIndex.assign(batch, vecCol, idCol, centroids)
        .write.mode(SaveMode.Overwrite).partitionBy("cell")
        .parquet(s"$storeDir/store/batch=$batchId")
    }
  }

  /** The maintained store as the (id, cell, vec) frame
    * [[graft.operators.IvfIndex.ivfTopKFromStore]] takes; the batchId
    * partition column is sink bookkeeping and is dropped. An empty
    * store is a valid state, not an AnalysisException.
    */
  def readStore(spark: SparkSession, storeDir: String): DataFrame = {
    import spark.implicits._
    if (!Files.exists(Paths.get(storeDir, "store")))
      Seq.empty[(Long, Int, Array[Double])].toDF("id", "cell", "vec")
    else
      spark.read.parquet(s"$storeDir/store")
        .select(col("id"), col("cell").cast("int").as("cell"), col("vec"))
  }

  /** Query the maintained store — the standard probe-pruned top-k. */
  def topK(spark: SparkSession, storeDir: String, queryVec: Seq[Double],
      centroids: Array[Array[Double]], k: Int = 10, nprobe: Int = 4): DataFrame =
    IvfIndex.ivfTopKFromStore(readStore(spark, storeDir), queryVec,
      centroids, k, nprobe)
}
