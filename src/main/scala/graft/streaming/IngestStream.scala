package graft.streaming

import graft.operators.{IngestionReport, IngestionService, ParserConfig}
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import java.sql.Timestamp

/** The reference's upload endpoint (web/api/products.py upload route →
  * DataIngestionService) lifted onto a DROP DIRECTORY, per SURVEY
  * §1.4/§3.1: instead of one POST per batch, producers land files in a
  * watched directory and a Structured Streaming file source turns each
  * arrival into one full [[operators.IngestionService]] batch via
  * `foreachBatch` — identical all-or-nothing validation, merge, and
  * report semantics, because the SAME service runs inside the sink.
  *
  * Scale shape: the stream carries only file-arrival METADATA (one row
  * per file line, but only `_metadata.file_path` is projected and the
  * per-batch collect is over DISTINCT paths — bounded by
  * `maxFilesPerTrigger`, never by file size). The heavy lifting —
  * parse, validate, merge — happens in the service's own distributed
  * batch plan against the file path, exactly as in the POST model. The
  * checkpoint makes arrival processing exactly-once across restarts.
  */
object IngestStream {

  /** Per-file convention for the reference's `full_update` request
    * parameter: a file named `*.full.csv` (any extension) runs its
    * batch in full-update mode — the drop-directory equivalent of the
    * endpoint flag.
    */
  private[streaming] def isFullUpdate(path: String): Boolean =
    path.contains(".full.")

  /** Arrival stream over `dir`: one row per newly-listed file path. */
  def fromDropDirectory(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream.format("text")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(dir)
      .select(col("_metadata.file_path").as("file_path"))

  /** Start the endpoint: every arriving file runs one ingest batch, in
    * lexicographic path order within a micro-batch (producers that need
    * strict ordering encode it in the name, the standard drop-dir
    * contract). `batchTsFor` pins the batch stamp deterministically;
    * `onReport` receives each file's [[operators.IngestionReport]] —
    * a failed file reports failure and writes nothing, and the stream
    * keeps consuming (the per-batch atomicity of the POST model).
    */
  def start(
      spark: SparkSession,
      service: IngestionService,
      cfg: ParserConfig,
      dir: String,
      checkpointDir: String,
      batchTsFor: String => Timestamp = _ => new Timestamp(System.currentTimeMillis()),
      onReport: (String, IngestionReport) => Unit = (_, _) => ()): StreamingQuery =
    fromDropDirectory(spark, dir).writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val files = batch.select(col("file_path")).distinct()
          .collect().map(_.getString(0)).sorted
        files.foreach { path =>
          onReport(path, service.ingest(cfg, path,
            fullUpdate = isFullUpdate(path), batchTs = batchTsFor(path)))
        }
      }
      .start()
}
