package graft

import graft.operators.{IvfIndex, Similarity}
import graft.streaming.IvfStream
import org.apache.spark.sql.functions._

/** Streaming IVF store maintenance: the store assembled from a vector
  * stream must equal a from-scratch assignment of everything that
  * arrived, through retrieval — and replayed batches must be
  * idempotent.
  */
class IvfStreamSpec extends SparkSpec {

  private lazy val full = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
  private lazy val cs = IvfIndex.trainCentroids(full, "embedding", "vec_id",
    nlist = 8, iters = 5)

  test("stream-vs-batch differential: maintained store == fresh assignment") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val sample = full.filter(col("vec_id") < 300)
      .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    val store = tmpDir("ivfsstore")
    val input = MemoryStream[(Long, Seq[Double])]
    val q = IvfStream.start(input.toDF().toDF("vec_id", "embedding"),
      "embedding", "vec_id", cs, store, tmpDir("ivfsckpt"))
    try {
      sample.grouped(100).foreach { b =>
        input.addData(b.toSeq: _*); q.processAllAvailable()
      }
    } finally q.stop()
    val viaStream = IvfStream.readStore(spark, store)
    val fresh = IvfIndex.assign(full.filter(col("vec_id") < 300),
      "embedding", "vec_id", cs)
    assert(viaStream.select("id", "cell").exceptAll(fresh.select("id", "cell")).isEmpty &&
      fresh.select("id", "cell").exceptAll(viaStream.select("id", "cell")).isEmpty,
      "stream-maintained store diverged from the from-scratch assignment")
    // retrieval through the maintained store == the direct batch path
    val qv = sample.head._2
    val got = IvfStream.topK(spark, store, qv, cs, k = 5, nprobe = 8)
      .collect().map(r => (r.getAs[Long]("id"),
        math.rint(r.getAs[Double]("cosine") * 1e9))).toSeq
    val want = IvfIndex.ivfTopK(full.filter(col("vec_id") < 300),
        "embedding", "vec_id", qv, cs, k = 5, nprobe = 8)
      .collect().map(r => (r.getAs[Long]("vec_id"),
        math.rint(r.getAs[Double]("cosine") * 1e9))).toSeq
    assert(got === want)
  }

  test("replayed micro-batch overwrites its slice; empty store is valid") {
    import spark.implicits._
    val store = tmpDir("ivfsstore2")
    assert(IvfStream.readStore(spark, store).isEmpty)
    val batch = full.filter(col("vec_id") < 50)
    IvfStream.appendBatch(batch, "embedding", "vec_id", cs, store, batchId = 3L)
    IvfStream.appendBatch(batch, "embedding", "vec_id", cs, store, batchId = 3L)
    assert(IvfStream.readStore(spark, store).count() === 50L,
      "store doubled on replay")
    val empty = Seq.empty[(Long, Seq[Double])].toDF("vec_id", "embedding")
    IvfStream.appendBatch(empty, "embedding", "vec_id", cs, store, batchId = 4L)
    assert(IvfStream.readStore(spark, store).count() === 50L,
      "an empty batch must not write a slice")
  }
}
