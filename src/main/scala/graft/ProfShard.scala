package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch decomposition of q_shard_manifest: write vs read-back cost,
  * and the write's actual task layout under AQE (attribution for the
  * sharded-write gate; not part of the driver contract).
  */
object ProfShard {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.files.openCostInBytes",
        sys.env.getOrElse("SPARK_GRAFT_OPEN_COST", "131072"))
      .config("spark.local.dir", Scratch.localDir("profshard-local"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = Scratch.localDir("profshard-out")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"), col("l_shipdate"),
        col("l_quantity"))
    li.agg(count(lit(1))).head()
    val sharded = li.withColumn("shard_id",
      expr("CAST(l_orderkey AS BIGINT) div 4096"))
    ProfHarness.time("write-repart-col") {
      sharded.repartition(col("shard_id"))
        .write.mode("overwrite").partitionBy("shard_id").parquet(s"$out/a")
    }
    ProfHarness.time("write-repart-col-pinned") {
      sharded.repartition(cpus, col("shard_id"))
        .write.mode("overwrite").partitionBy("shard_id").parquet(s"$out/b")
    }
    ProfHarness.time("read-back-agg") {
      ProfHarness.force(spark.read.parquet(s"$out/a")
        .groupBy(col("shard_id").cast("long").as("shard_id"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("l_orderkey")), max(col("l_orderkey")),
          min(col("l_shipdate")), max(col("l_shipdate"))))
    }
    ProfHarness.time("q_shard_manifest") {
      ProfHarness.force(SparkEntry.queries("q_shard_manifest")(spark, sfDir))
    }
    spark.stop()
  }
}
