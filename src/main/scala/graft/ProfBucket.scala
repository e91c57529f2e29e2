package graft

import graft.functions.GraftFunctions.{graftDot, graftLshBuckets}
import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch A/B for the sign-LSH bucket formulations (native call vs
  * literal-plane dot tests) on the embedding near-dup join shape.
  */
object ProfBucket {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", Scratch.localDir("scratch-local"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def time(name: String)(f: => Any): Unit =
      ProfHarness.time(s"PB $name", reps = 4)(f)
    val hp = Similarity.hyperplanes(8, 64)
    def bucketLiteral(vec: org.apache.spark.sql.Column) =
      hp.indices.map { i =>
        when(graftDot(vec, lit(hp(i))) >= 0, lit(1L << i)).otherwise(lit(0L))
      }.reduce(_.bitwiseOR(_))
    def pairsWith(bucket: org.apache.spark.sql.Column => org.apache.spark.sql.Column) = {
      val unit = Similarity.withUnitVector(emb, "embedding").select(
        col("vec_id").as("id"), col("_unit"), bucket(col("_unit")).as("bucket"))
      unit.as("x").join(unit.as("y"),
          col("x.bucket") === col("y.bucket") && col("x.id") < col("y.id"))
        .withColumn("cosine", Similarity.dot(col("x._unit"), col("y._unit")))
        .filter(col("cosine") >= 0.3)
        .count()
    }
    time("warm") { emb.agg(count(lit(1))).head() }
    time("native") { pairsWith(v => element_at(graftLshBuckets(v, 8, 1, 64), 1)) }
    time("literal") { pairsWith(bucketLiteral) }
    time("native2") { pairsWith(v => element_at(graftLshBuckets(v, 8, 1, 64), 1)) }
    spark.stop()
  }
}
