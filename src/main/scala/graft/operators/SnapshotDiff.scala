package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — "what changed between crawl generation A and
  * generation B": added / removed / changed per document id, decided by
  * content fingerprint, never by full-text compare.
  *
  * Scale shape: both snapshots reduce to (id, fingerprint) at scan
  * speed (the fingerprint is the whitespace/case-normalized md5 already
  * used for exact dedup), then ONE full-outer equi-join on the id —
  * shuffle-partitionable, and zero-exchange when both snapshots are
  * bucketed by id (the natural layout for versioned corpora). Document
  * text never shuffles; the diff moves two 16-byte hashes per id.
  */
object SnapshotDiff {

  /** One row per id present in either snapshot:
    * (idCol, status ∈ added|removed|changed|unchanged).
    */
  def diff(
      a: DataFrame,
      b: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    // presence is carried EXPLICITLY: a null text fingerprints to null
    // (md5(null) = null), so "fingerprint is null" does NOT mean "id
    // absent from this snapshot" — an id present on both sides with one
    // null text must classify changed/unchanged, never added/removed
    // (a mislabel would make the incremental consumer re-ingest a doc
    // that was never added, or treat a live doc as deleted).
    val fpA = a.select(col(idCol),
      TextAnalysis.fingerprint(col(textCol)).as("_fp_a"),
      lit(true).as("_in_a"))
    val fpB = b.select(col(idCol),
      TextAnalysis.fingerprint(col(textCol)).as("_fp_b"),
      lit(true).as("_in_b"))
    fpA.join(fpB, Seq(idCol), "full_outer")
      .withColumn("status",
        when(col("_in_a").isNull, "added")
          .when(col("_in_b").isNull, "removed")
          // <=> treats two null texts as unchanged, null-vs-text as
          // changed — the recompute semantics of comparing the rows
          .when(!(col("_fp_a") <=> col("_fp_b")), "changed")
          .otherwise("unchanged"))
      .select(col(idCol), col("status"))
  }

  /** The delta only — what an incremental reprocessing run consumes. */
  def delta(a: DataFrame, b: DataFrame, idCol: String,
      textCol: String): DataFrame =
    diff(a, b, idCol, textCol).filter(col("status") =!= "unchanged")
}
