package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training — "concat-and-chunk": documents are
  * concatenated in a deterministic order and the token stream is cut
  * into fixed-capacity training sequences; the output is the index of
  * which document contributes which token span to which chunk (the
  * metadata a packed-shard writer materializes next to the tokens).
  *
  * All arithmetic is integer (cumulative sums, integer division), so any
  * engine reproduces the packing exactly — no floats anywhere.
  *
  * Scale: the running total is windowed PER PARTITION COLUMN, never one
  * global cumsum (a single unpartitioned window serializes the corpus
  * through one reducer — the same trap as exact percentiles on a
  * continuous domain). Chunk ids are therefore shard-local, which is
  * exactly how packed pretraining shards are written in practice; the
  * (shard, chunk_id) pair is the global key.
  */
object SequencePacking {

  /** Pack `docs` (one row per document with a positive `tokenCol`) into
    * `capacity`-token chunks within each `partCol` shard, ordering by
    * `idCol`. Documents with zero tokens are dropped (nothing to pack).
    *
    * Output: (partCol, chunk_id, idCol, off_in_chunk, n_toks) — one row
    * per (document, chunk) overlap; a document longer than `capacity`
    * spans several chunks, a short one shares its chunk with neighbors.
    */
  def pack(
      docs: DataFrame,
      partCol: String,
      idCol: String,
      tokenCol: String,
      capacity: Int): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    // explicit ROWS frame: orderBy alone defaults to a RANGE frame, under
    // which duplicate ids in one shard share a cumulative _end and get
    // IDENTICAL overlapping spans (offsets assigned twice, others never)
    // — with ROWS, duplicate ids degrade to an arbitrary-but-valid
    // packing order instead of corrupt spans
    val w = Window.partitionBy(col(partCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val chunkLo: Column = col("chunk_id") * capacity
    docs
      .filter(col(tokenCol) > 0)
      .withColumn("_end", sum(col(tokenCol)).over(w))
      .withColumn("_start", col("_end") - col(tokenCol))
      .withColumn("chunk_id", explode(sequence(
        expr(s"_start div $capacity"), expr(s"(_end - 1) div $capacity"))))
      .select(col(partCol), col("chunk_id"), col(idCol),
        (greatest(col("_start"), chunkLo) - chunkLo).as("off_in_chunk"),
        (least(col("_end"), (col("chunk_id") + 1) * capacity) -
          greatest(col("_start"), chunkLo)).as("n_toks"))
  }
}
