package graft

import graft.operators.SequencePacking
import org.apache.spark.sql.functions._

/** Concat-and-chunk invariants: every chunk except a shard's last holds
  * exactly `capacity` tokens, documents span chunk boundaries with
  * correct offsets, per-document totals are conserved, shards pack
  * independently.
  */
class SequencePackingSpec extends SparkSpec {

  test("fills to capacity, spans boundaries, conserves per-doc tokens") {
    import spark.implicits._
    val docs = Seq(("a", 1L, 100L), ("a", 2L, 500L), ("a", 3L, 30L))
      .toDF("shard", "id", "toks")
    val out = SequencePacking.pack(docs, "shard", "id", "toks", capacity = 256)
      .orderBy("chunk_id", "id").collect()
    // stream: doc1 [0,100) doc2 [100,600) doc3 [600,630)
    assert(out.map(r => (r.getAs[Long]("chunk_id"), r.getAs[Long]("id"),
      r.getAs[Long]("off_in_chunk"), r.getAs[Long]("n_toks"))).toSeq === Seq(
      (0L, 1L, 0L, 100L), (0L, 2L, 100L, 156L),
      (1L, 2L, 0L, 256L),
      (2L, 2L, 0L, 88L), (2L, 3L, 88L, 30L)))
    // every chunk but the last is exactly full
    val perChunk = out.groupBy(_.getAs[Long]("chunk_id")).view
      .mapValues(_.map(_.getAs[Long]("n_toks")).sum).toMap
    assert(perChunk === Map(0L -> 256L, 1L -> 256L, 2L -> 118L))
    // per-document conservation
    val perDoc = out.groupBy(_.getAs[Long]("id")).view
      .mapValues(_.map(_.getAs[Long]("n_toks")).sum).toMap
    assert(perDoc === Map(1L -> 100L, 2L -> 500L, 3L -> 30L))
  }

  test("shards pack independently; zero-token docs dropped") {
    import spark.implicits._
    val docs = Seq(("x", 1L, 10L), ("x", 2L, 0L), ("y", 1L, 10L))
      .toDF("shard", "id", "toks")
    val out = SequencePacking.pack(docs, "shard", "id", "toks", capacity = 8)
      .orderBy("shard", "chunk_id", "id").collect()
    // both shards restart at chunk 0; the zero-token doc vanishes
    assert(out.map(r => (r.getAs[String]("shard"), r.getAs[Long]("chunk_id"),
      r.getAs[Long]("id"), r.getAs[Long]("n_toks"))).toSeq === Seq(
      ("x", 0L, 1L, 8L), ("x", 1L, 1L, 2L),
      ("y", 0L, 1L, 8L), ("y", 1L, 1L, 2L)))
  }
  test("packs on TRAINED-BPE token counts, finer than whitespace counts") {
    import spark.implicits._
    import graft.operators.{TermIndex, TextAnalysis}
    // End-to-end wiring: train merges -> real per-doc token counts ->
    // pack on those counts. BPE counts sit strictly between the
    // whitespace word count (every word >= 1 token) and the character
    // count (merges only ever shrink the symbol sequence).
    val docs = Seq(
      (1L, "low low lower"),
      (2L, "newest widest newest"),
      (3L, "low newest")).toDF("doc_id", "text")
    val merges = TermIndex.trainBpe(docs, "text", "doc_id", numMerges = 3)
    val counted = TermIndex.bpeTokenCounts(docs, "text", "doc_id", merges)
      .withColumn("shard", lit("s0"))
    val ws = docs.select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("n_ws"))
    val joined = counted.join(ws, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (nTok, nWords, nWs) = (r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_words"), r.getAs[Int]("n_ws").toLong)
      assert(nWords === nWs) // same word splitter feeds both counters
      assert(nTok >= nWs)    // every word is at least one token
    }
    // the DIFFERENTIAL: trained counts are finer than the heuristic —
    // 'lower' after (e,s),(es,t),(l,o) is [lo,w,e,r] = 4 tokens, not 1.
    assert(joined.map(_.getAs[Long]("n_tokens")).sum >
      joined.map(_.getAs[Int]("n_ws").toLong).sum)
    val packed = SequencePacking.pack(counted, "shard", "doc_id",
      "n_tokens", capacity = 8).collect()
    // conservation: packed spans sum to the BPE counts per doc
    val perDoc = packed.groupBy(_.getAs[Long]("doc_id")).view
      .mapValues(_.map(_.getAs[Long]("n_toks")).sum).toMap
    val expect = joined.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("n_tokens")).toMap
    assert(perDoc === expect)
    // and the same counts drive token-budget curation: budget of the
    // two smallest docs' tokens keeps exactly those two (priority =
    // fewest tokens first to make the expectation order-free).
    import graft.operators.BudgetSample
    val sizes = joined.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("n_tokens"))
      .sortBy(_._2)
    val budget = sizes.take(2).map(_._2).sum
    val prioritized = counted.withColumn("prio",
      -col("n_tokens").cast("double"))
    val kept = BudgetSample.fillTokenBudget(prioritized, "n_tokens",
      "prio", "doc_id", budget).collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept === sizes.take(2).map(_._1).toSet)
  }

  test("duplicate ids in one shard still pack into disjoint exhaustive spans") {
    import spark.implicits._
    import graft.operators.SequencePacking
    // the default RANGE frame gave duplicate ids IDENTICAL cumulative
    // sums -> overlapping spans; the explicit ROWS frame degrades them
    // to an arbitrary-but-valid packing
    val docs = Seq((0, 5L, 10L), (0, 5L, 10L), (0, 7L, 4L))
      .toDF("shard", "doc_id", "n_toks")
    val packed = SequencePacking.pack(docs, "shard", "doc_id", "n_toks",
      capacity = 16).collect()
    val total = packed.map(_.getAs[Long]("n_toks")).sum
    assert(total === 24L, "every token assigned exactly once")
    // offsets within each chunk are disjoint and exhaustive
    val byChunk = packed.groupBy(_.getAs[Long]("chunk_id"))
    byChunk.foreach { case (chunk, rows) =>
      val covered = rows.flatMap { r =>
        val off = r.getAs[Long]("off_in_chunk")
        (off until off + r.getAs[Long]("n_toks"))
      }.sorted
      assert(covered.distinct.length === covered.length,
        s"chunk $chunk has overlapping spans")
    }
  }
}
