package graft

/** The standing-artifact lifecycle contract (r12 verdict item 7):
  * every `SparkEntry.standing` artifact is a deterministic pure
  * function of an immutable dataset dir, so a FRESH first-touch
  * rebuild (what a new JVM does) must produce a gate result identical
  * to serving from the already-persisted artifact. Clearing the memo
  * simulates JVM death; the rebuilt artifact OVERWRITES the persisted
  * parquet, so any divergence — nondeterministic build, partial
  * overwrite, key that fails to capture an input — shows up as a row
  * diff here. (Dataset-dir immutability itself is the harness contract
  * documented in SCALE.md; a mutated-in-place dir is out of scope by
  * design, and the per-run DuckDB oracles re-derive every artifact
  * from source, so staleness reds the CORRECTNESS gate even if this
  * spec never ran.)
  */
class StandingArtifactSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  // one query per standing-artifact family: posting index (+norms),
  // trained BPE merges, trained unigram vocabulary, SimHash
  // group/signature/count tables, set-sim token/prefix tables, the
  // dedup-recall signature+target pair, the round-13 additions —
  // recall-triple signature/band tables and the standing IVF store
  // (centroids + cell-partitioned assignments) — and the round-14
  // memoized trainings: the shared outlier/semantic coarse quantizer,
  // the IVFADC coarse+codebook pair, the WordPiece model, and the
  // k-center picks
  private val artifactGates = Seq(
    "q_sparse_index_build", "q_bpe_train", "q_unigram_tokenizer",
    "q_dedup_simhash_full", "q_setsim_join", "q_setsim_capped",
    "q_dedup_recall", "q_simhash_recall", "q_containment_recall",
    "q_ivf_incr", "q_pq_recall",
    "q_dedup_semantic", "q_embed_ivfpq", "q_wordpiece_train",
    "q_kcenter_select")

  test("fresh first-touch rebuild equals the persisted artifact, every family") {
    artifactGates.foreach { q =>
      val warm = SparkEntry.queries(q)(spark, d)
        .collect().map(_.toString).sorted.toSeq
      SparkEntry.clearStandingArtifacts()
      val fresh = SparkEntry.queries(q)(spark, d)
        .collect().map(_.toString).sorted.toSeq
      assert(fresh === warm,
        s"$q: fresh first-touch rebuild diverged from the persisted artifact")
    }
  }
}
