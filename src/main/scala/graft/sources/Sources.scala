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
    * are dropped (reference ingestion/parsers.py:34-48).
    */
  object CsvSource extends IngestSource {
    val id = "csv"
    def read(spark: SparkSession, path: String): DataFrame = {
      val raw = spark.read
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("inferSchema", "false")
        .csv(path)
      // Spark renames a BLANK header at position i to the placeholder
      // `_ci`, indistinguishable by name from a client column genuinely
      // called `_c0`. Disambiguate by reading just the header LINE
      // driver-side (Hadoop FS + the same univocity CSV parser Spark
      // uses, so quoting semantics match) and dropping `_ci` only where
      // position i's original header really is blank — a real `_cN`
      // header survives. Falls back to a one-row Spark probe if the
      // direct read fails (exotic filesystems).
      val placeholders = blankHeaderPlaceholders(spark, path)
      normalize(raw, placeholders)
    }

    private def blankHeaderPlaceholders(spark: SparkSession, path: String): Set[String] = {
      val fields: Array[String] =
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
          if (line == null) Array.empty
          else {
            val settings = new com.univocity.parsers.csv.CsvParserSettings
            settings.setMaxColumns(4096)
            Option(new com.univocity.parsers.csv.CsvParser(settings).parseLine(line))
              .getOrElse(Array.empty[String])
          }
        } catch {
          case _: Exception =>
            // bounded fallback: one-row Spark probe of the raw header line
            spark.read.option("header", "false").option("inferSchema", "false")
              .csv(path).head().toSeq.map(v => if (v == null) null else v.toString).toArray
        }
      fields.zipWithIndex.collect {
        case (v, i) if v == null || v.trim.isEmpty => s"_c$i"
      }.toSet
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

  /** Trim headers, drop empty-named columns, drop all-null rows, append
    * read-order index. `placeholders` carries the `_cN` names Spark
    * assigned to genuinely BLANK headers (computed by the source from the
    * raw header line) — only those are dropped (reference drops
    * empty-header columns, ingestion/parsers.py:41-43), so a client
    * column actually named `_c0` is kept.
    */
  private[graft] def normalize(
      raw: DataFrame,
      placeholders: Set[String] = Set.empty): DataFrame = {
    val kept = raw.columns.filter(c => c.trim.nonEmpty && !placeholders.contains(c))
    val renamed = raw.select(kept.map(c => col(s"`$c`").as(c.trim)): _*)
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
