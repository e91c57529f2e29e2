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

  test("fixed oracle dumps follow the CURRENT dataset across dirs") {
    // Oracle SQL is dataset-agnostic, so dump paths are fixed — a
    // multi-dir JVM must rewrite the fixed path whenever a different
    // dataset takes it over (ensureDump), or the engine would serve
    // dir A's memo while the oracle reads dir B's dump.
    SparkEntry.clearStandingArtifacts()
    def dump(): Seq[String] =
      spark.read.parquet(SparkEntry.semanticDumpPath)
        .orderBy("cell").collect().map(_.toString).toSeq
    SparkEntry.queries("q_dedup_semantic")(spark, d).collect()
    val dumpA = dump()
    SparkEntry.queries("q_dedup_semantic")(spark, "/root/testdata/sf0.1").collect()
    val dumpB = dump()
    assert(dumpB !== dumpA, "distinct datasets must produce distinct centroids")
    SparkEntry.queries("q_dedup_semantic")(spark, d).collect()
    assert(dump() === dumpA,
      "returning to the first dataset must restore ITS dump under the fixed path")
  }

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
