package graft

import graft.operators.{IvfIndex, Similarity}
import org.apache.spark.sql.functions._

/** IVF coarse-quantizer ANN: deterministic build, assignment consistency,
  * and recall against exact brute force on the real sf0.1 embeddings.
  */
class IvfIndexSpec extends SparkSpec {

  private lazy val full = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")

  test("centroid training is deterministic") {
    val a = IvfIndex.trainCentroids(full, "embedding", "vec_id", nlist = 8, iters = 5)
    val b = IvfIndex.trainCentroids(full, "embedding", "vec_id", nlist = 8, iters = 5)
    assert(a.length === 8)
    a.zip(b).foreach { case (x, y) => assert(x.toSeq === y.toSeq) }
  }

  test("cellId expression matches the driver-side nearest-centroid rule") {
    val cs = IvfIndex.trainCentroids(full, "embedding", "vec_id", nlist = 8, iters = 5)
    val viaExpr = full.limit(200)
      .select(col("vec_id"), IvfIndex.cellId(col("embedding"), cs).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val local = full.orderBy("vec_id").limit(200)
      .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
      .collect().map { r =>
        val v = r.getSeq[Double](1).toArray
        val cell = cs.zipWithIndex.map { case (c, i) =>
          (c.zip(v).map { case (x, y) => (x - y) * (x - y) }.sum, i)
        }.minBy(_._1)._2
        r.getLong(0) -> cell
      }.toMap
    local.foreach { case (id, cell) => assert(viaExpr(id) === cell, s"vec $id") }
  }

  test("IVF recall@10 on sf0.1 with a wide probe") {
    // iid-noise corpus (the ANN worst case): cells are near-uniform, so
    // recall tracks nprobe/nlist; probing half the cells must recover
    // most of the exact top-10 while scanning ~half the corpus.
    val cs = IvfIndex.trainCentroids(full, "embedding", "vec_id", nlist = 8, iters = 5)
    val qv = full.filter("vec_id = 0")
      .select(Similarity.toDouble(col("embedding"))).head().getSeq[Double](0)
    val exact = Similarity.bruteForceTopK(full, "embedding", "vec_id", qv, k = 10)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val approx = IvfIndex.ivfTopK(full, "embedding", "vec_id", qv, cs,
        k = 10, nprobe = 5)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert((exact & approx).size >= 6,
      s"IVF recall too low: ${(exact & approx).size}/10")
    // sanity: probing ALL cells must equal brute force exactly
    val allProbe = IvfIndex.ivfTopK(full, "embedding", "vec_id", qv, cs,
        k = 10, nprobe = 8)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(allProbe === exact)
  }

  test("incremental store: merged == fresh, retrieval == on-the-fly path") {
    import org.apache.spark.sql.functions.pmod
    val cs = IvfIndex.trainCentroids(
      full.filter(pmod(col("vec_id"), lit(5)) =!= 0),
      "embedding", "vec_id", nlist = 8, iters = 5)
    // standing 80% persisted partitionBy(cell); 20% appended under the
    // same frozen centroids
    val storeDir = tmpDir("ivfstore")
    IvfIndex.assign(full.filter(pmod(col("vec_id"), lit(5)) =!= 0),
        "embedding", "vec_id", cs)
      .write.mode("overwrite").partitionBy("cell").parquet(storeDir)
    val merged = spark.read.parquet(storeDir)
      .select(col("id"), col("cell"), col("vec"))
      .unionByName(IvfIndex.assign(
        full.filter(pmod(col("vec_id"), lit(5)) === 0),
        "embedding", "vec_id", cs))
    val fresh = IvfIndex.assign(full, "embedding", "vec_id", cs)
    assert(merged.select("id", "cell").exceptAll(fresh.select("id", "cell")).isEmpty &&
      fresh.select("id", "cell").exceptAll(merged.select("id", "cell")).isEmpty,
      "incrementally maintained store diverged from a from-scratch assignment")
    // retrieval through the store == the recompute-on-the-fly path
    val qv = full.filter("vec_id = 0")
      .select(Similarity.toDouble(col("embedding"))).head().getSeq[Double](0)
    val viaStore = IvfIndex.ivfTopKFromStore(merged, qv, cs, k = 10, nprobe = 4)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("cosine"))).toSeq
    val direct = IvfIndex.ivfTopK(full, "embedding", "vec_id", qv, cs,
        k = 10, nprobe = 4)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cosine"))).toSeq
    assert(viaStore === direct)
    // the cell filter reaches the store's partition layout as pruning —
    // the query-time scan reads nprobe/nlist of the index, not all of it
    val plan = IvfIndex.ivfTopKFromStore(
        spark.read.parquet(storeDir).select(col("id"), col("cell"), col("vec")),
        qv, cs, k = 10, nprobe = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"cell filter did not reach the partitioned scan:\n$plan")
  }
}
