package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ingest source formats.
  *
  * Mirrors the reference's parser registry (reference:
  * ingestion/parsers.py:10-48, config.py:139-145): a format id resolves to
  * a reader that produces an *all-string* DataFrame — source data carries
  * no types; meaning and types come only from the column mapping +
  * transformers, exactly like the reference's csv.DictReader rows.
  *
  * Every source appends `_row_idx` (read-order index) so that
  * duplicate-SKU-within-batch semantics ("later row wins", reference
  * ingestion/service.py:83-106 processes rows sequentially) survive the
  * shuffle. At 100 TB the index is per input split and only needs to be
  * monotone within a key's occurrences in one file, which
  * monotonically_increasing_id guarantees per partition.
  */
trait IngestSource {
  def id: String
  def read(spark: SparkSession, path: String): DataFrame
}

object IngestSource {
  val ROW_IDX = "_row_idx"

  /** CSV with header row, all columns read as strings (no inference —
    * reference semantics: types come only from transformers). Header names
    * are trimmed; columns with empty header are dropped; fully-empty rows
    * are dropped; DUPLICATE header names keep the LAST column's values
    * (reference ingestion/parsers.py:34-48 — csv.DictReader builds a dict
    * per row, so a later column with the same name silently overwrites).
    */
  object CsvSource extends IngestSource {
    val id = "csv"
    def read(spark: SparkSession, path: String): DataFrame = {
      val raw = spark.read
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("inferSchema", "false")
        .csv(path)
      // Spark's header handling loses information the reference's
      // DictReader keeps: a BLANK header at position i becomes the
      // placeholder `_ci` (indistinguishable from a client column
      // genuinely named `_c0`), and DUPLICATE header names are renamed
      // to name+position (sku, sku -> sku0, sku2) — the column mapping's
      // source then matches NOTHING, so every row silently becomes a
      // typed-NULL (e.g. sku-less INSERT) where the reference upserts by
      // the last duplicate's value. Both are resolved POSITIONALLY from
      // the raw header line (read driver-side with the same univocity
      // CSV parser Spark uses, so quoting semantics match); a probe
      // failure falls back to a one-row Spark read (exotic filesystems).
      rawHeaderLine(spark, path) match {
        case Some(headers) if headers.length == raw.columns.length =>
          normalizeByHeaders(raw, headers)
        case _ =>
          // headers unavailable or ragged: keep every non-placeholder
          // column under its Spark name (pre-duplicate-fix behavior)
          normalize(raw)
      }
    }

    private def rawHeaderLine(spark: SparkSession, path: String): Option[Array[String]] =
      try {
        val p = new org.apache.hadoop.fs.Path(path)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val target =
          if (fs.getFileStatus(p).isDirectory)
            // mirror Spark's own listing filter: BOTH '_' and '.'
            // prefixed names are invisible to the scan ('.'-files —
            // e.g. Hadoop's .part.crc checksums — sort before data
            // files and would otherwise be probed as the header)
            fs.listStatus(p).filter(_.isFile).map(_.getPath)
              .filterNot(n => n.getName.startsWith("_") ||
                n.getName.startsWith("."))
              .sortBy(_.getName).head
          else p
        val in = fs.open(target)
        val line =
          try new java.io.BufferedReader(
            new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))
            .readLine()
          finally in.close()
        if (line == null) Some(Array.empty)
        else {
          val settings = new com.univocity.parsers.csv.CsvParserSettings
          settings.setMaxColumns(4096)
          Option(new com.univocity.parsers.csv.CsvParser(settings).parseLine(line))
        }
      } catch {
        case _: Exception =>
          // bounded fallback: one-row Spark probe of the raw header line
          try Some(spark.read.option("header", "false").option("inferSchema", "false")
            .csv(path).head().toSeq.map(v => if (v == null) null else v.toString).toArray)
          catch { case _: Exception => None }
      }
  }

  /** JSON lines, primitives kept as strings (README backlog task 2 —
    * reference /root/reference/README.md:33, never implemented there).
    */
  object JsonSource extends IngestSource {
    val id = "json"
    def read(spark: SparkSession, path: String): DataFrame = {
      val raw = spark.read
        .option("primitivesAsString", "true")
        .json(path)
      normalize(raw.drop("_corrupt_record"))
    }
  }

  /** POSITIONAL normalization from the raw header line: per DISTINCT
    * trimmed header name keep the column at the name's LAST position
    * (the DictReader dict-overwrite rule), blank headers drop naturally
    * (their trimmed name is empty), and a client column genuinely named
    * `_c0` survives because its own header says so. Positions index
    * `raw.columns`, so Spark's placeholder/duplicate renaming scheme
    * never needs to be reverse-engineered.
    */
  private[graft] def normalizeByHeaders(
      raw: DataFrame, rawHeaders: Array[String]): DataFrame = {
    require(rawHeaders.length == raw.columns.length,
      s"header probe saw ${rawHeaders.length} columns, Spark ${raw.columns.length}")
    val stripped = rawHeaders.map(h => Option(h).fold("")(_.trim))
    // toMap keeps the LAST index per name — exactly the overwrite rule
    val lastPos = stripped.zipWithIndex.filter(_._1.nonEmpty).toMap
    val keep = lastPos.values.toSeq.sorted
    finish(raw.select(keep.map(i =>
      col(s"`${raw.columns(i)}`").as(stripped(i))): _*))
  }

  /** Name-based normalization (JSON, and the CSV fallback when no raw
    * header line is available): trim names, drop empty-named columns.
    */
  private[graft] def normalize(raw: DataFrame): DataFrame = {
    val kept = raw.columns.filter(c => c.trim.nonEmpty)
    finish(raw.select(kept.map(c => col(s"`$c`").as(c.trim)): _*))
  }

  /** Shared tail: drop all-null rows, append the read-order index. */
  private def finish(renamed: DataFrame): DataFrame = {
    val anyPresent = renamed.columns
      .map(c => col(s"`$c`").isNotNull)
      .reduceOption(_ || _)
      .getOrElse(lit(false))
    renamed.filter(anyPresent).withColumn(ROW_IDX, monotonically_increasing_id())
  }

  val registry: Map[String, IngestSource] =
    Seq(CsvSource, JsonSource).map(s => s.id -> s).toMap

  def apply(id: String): IngestSource =
    registry.getOrElse(id,
      throw new IllegalArgumentException(s"Unknown parser id: $id"))
}
