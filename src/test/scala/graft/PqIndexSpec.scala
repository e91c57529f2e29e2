package graft

import graft.operators.PqIndex
import org.apache.spark.sql.functions._

/** Product quantization: deterministic codebooks, exact ADC on
  * reconstruction-exact data, and cluster ranking sanity.
  */
class PqIndexSpec extends SparkSpec {

  // 16-dim vectors, m=2 subspaces of 8: ids 0-9 sit exactly at 0s
  // (cluster A), ids 10-19 exactly at 10s (cluster B) — Lloyd's
  // converges to the exact cluster points, so quantization is lossless
  // and ADC distances are hand-computable.
  private def clustered = {
    import spark.implicits._
    (0L to 19L).map { id =>
      val v = if (id < 10) Seq.fill(16)(0.0f) else Seq.fill(16)(10.0f)
      (id, v)
    }.toDF("vec_id", "embedding")
  }

  test("codebook training is deterministic and recovers exact clusters") {
    val a = PqIndex.trainCodebooks(clustered, "embedding", "vec_id",
      m = 2, ksub = 2, iters = 5)
    val b = PqIndex.trainCodebooks(clustered, "embedding", "vec_id",
      m = 2, ksub = 2, iters = 5)
    assert(a.length === 2 && a.forall(_.length === 2))
    a.zip(b).foreach { case (x, y) =>
      x.zip(y).foreach { case (cx, cy) => assert(cx.toSeq === cy.toSeq) }
    }
    // each subspace codebook holds exactly the two cluster points
    a.foreach { cb =>
      val pts = cb.map(_.toSeq).toSet
      assert(pts === Set(Seq.fill(8)(0.0), Seq.fill(8)(10.0)))
    }
  }

  test("ADC equals the exact squared distance when reconstruction is lossless") {
    val cbs = PqIndex.trainCodebooks(clustered, "embedding", "vec_id",
      m = 2, ksub = 2, iters = 5)
    // query all-1s: per subspace d2 to the 0s codeword = 8, to the 10s
    // codeword = 8 * 81 = 648 -> ADC 16 for cluster A, 1296 for B.
    val q = Seq.fill(16)(1.0)
    val got = PqIndex.adcTopK(clustered, "embedding", "vec_id", q, cbs, k = 20)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    (0L to 9L).foreach(id => assert(got(id) === 16.0))
    (10L to 19L).foreach(id => assert(got(id) === 1296.0))
  }

  test("ADC top-k ranks the query's own cluster first, ids break ties") {
    val cbs = PqIndex.trainCodebooks(clustered, "embedding", "vec_id",
      m = 2, ksub = 2, iters = 5)
    val q = Seq.fill(16)(9.5)
    val top = PqIndex.adcTopK(clustered, "embedding", "vec_id", q, cbs, k = 10)
      .collect().map(_.getLong(0)).toSeq
    assert(top === (10L to 19L).toSeq)
  }

  test("codes stay in range on the real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cbs = PqIndex.trainCodebooks(emb, "embedding", "vec_id",
      m = 8, ksub = 16, iters = 3)
    val codes = emb.select(
      PqIndex.codeColumns(
        graft.operators.Similarity.toDouble(col("embedding")), cbs)
        .zipWithIndex.map { case (c, i) => c.as(s"c$i") }: _*)
      .collect()
    assert(codes.nonEmpty)
    codes.foreach { r =>
      (0 until 8).foreach { i =>
        val c = r.getInt(i)
        assert(c >= 0 && c < 16, s"code $c out of range")
      }
    }
  }

  test("null embeddings rank LAST in ADC, never fill the top-k") {
    import spark.implicits._
    val cbs = PqIndex.trainCodebooks(clustered, "embedding", "vec_id",
      m = 2, ksub = 2, iters = 5)
    val withNulls = clustered.unionByName(
      Seq((100L, Option.empty[Seq[Float]]),
        (101L, Option.empty[Seq[Float]]))
        .toDF("vec_id", "embedding"))
    val top = PqIndex.adcTopK(withNulls, "embedding", "vec_id",
      Seq.fill(16)(0.0), cbs, k = 12).collect()
    // the 10 cluster-A rows (distance 0) come first; null rows never
    // appear while a real row is available (NULLS FIRST default would
    // have put 100/101 at ranks 1-2)
    assert(top.take(10).forall(_.getLong(0) < 10L))
    assert(!top.take(10).exists(r => r.getLong(0) >= 100L))
  }

  test("wrong-dimension query vector is rejected, not silently truncated") {
    val cbs = PqIndex.trainCodebooks(clustered, "embedding", "vec_id",
      m = 2, ksub = 2, iters = 5)
    intercept[IllegalArgumentException] {
      PqIndex.adcTopK(clustered, "embedding", "vec_id",
        Seq.fill(12)(0.0), cbs, k = 3)
    }
    intercept[IllegalArgumentException] {
      graft.operators.IvfIndex.ivfTopK(clustered, "embedding", "vec_id",
        Seq.fill(12)(0.0),
        Array(Array.fill(16)(0.0), Array.fill(16)(10.0)), k = 3)
    }
  }
}
