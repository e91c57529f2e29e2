package graft

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame

/** Connected-components clustering and benchmark decontamination. */
class ClusterDecontamSpec extends SparkSpec {

  test("connectedComponents: chain closes transitively, islands stay apart") {
    import spark.implicits._
    // Two components: {1,2,3,9} via chain 1-2, 2-3, 3-9; {20,21}.
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 9L), (20L, 21L))
      .toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("component")).toMap
    assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L,
      20L -> 20L, 21L -> 20L))
  }

  test("connectedComponents: long path needs diameter rounds, still closes") {
    import spark.implicits._
    val pairs = (1L until 10L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(pairs).collect()
    assert(labels.length === 10)
    assert(labels.forall(_.getAs[Long]("component") == 1L))
  }

  test("clusterMembers attaches component sizes") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("id_a", "id_b")
    val out = Dedup.clusterMembers(pairs).collect()
      .map(r => (r.getAs[Long]("id"),
        r.getAs[Long]("component"), r.getAs[Long]("cluster_size")))
    assert(out.toSet === Set((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (7L, 7L, 2L), (8L, 7L, 2L)))
  }

  private def corpus: DataFrame = {
    import spark.implicits._
    Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),        // benchmark
      (1L, "alpha beta gamma delta other words here"),    // shares 2 shingles
      (2L, "completely unrelated training text content"), // clean
      (3L, "more alpha beta gamma overlap text")          // shares 1 shingle
    ).toDF("doc_id", "text")
  }

  test("contaminationReport flags only overlapping training docs") {
    val rep = Dedup.contaminationReport(
        train = corpus.filter("doc_id > 0"),
        benchmark = corpus.filter("doc_id = 0"),
        "text", "doc_id", n = 3)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_shared_shingles"), r.getAs[Long]("n_benchmark_docs")))
      .toMap
    // doc 1 shares "alpha beta gamma" and "beta gamma delta"; doc 3 shares
    // "alpha beta gamma"; doc 2 shares nothing and must be absent.
    assert(rep === Map(1L -> ((2L, 1L)), 3L -> ((1L, 1L))))
  }

  test("connectedComponents: driver union-find arm matches the " +
      "distributed propagation arm row-for-row") {
    import spark.implicits._
    // bridged cliques + an isolated island + a self-pair
    val pairs = (Seq((7L, 3L), (3L, 9L), (9L, 7L), (9L, 12L), (12L, 15L),
      (20L, 21L), (30L, 30L)) ++ (40L to 52L).map(i => (i, i + 1)))
      .toDF("id_a", "id_b")
    val local = Dedup.connectedComponents(pairs)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val dist = Dedup.connectedComponents(pairs, driverMaxEdges = 0L)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(local.toSeq === dist.toSeq)
  }
}
