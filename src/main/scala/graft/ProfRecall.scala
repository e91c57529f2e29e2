package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Scratch stage decomposition of the SimHash recall gate (attribution
  * for the recall-triple family; not part of the driver contract).
  */
object ProfRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4096")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.files.openCostInBytes", "131072")
      .config("spark.local.dir", Scratch.localDir("profrecall-local"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // warm + build the standing artifacts once
    ProfHarness.force(SparkEntry.queries("q_simhash_recall")(spark, sfDir))

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val planted = SparkEntry.dedupRecallPlanted(docs)
    val universe = docs.unionByName(planted)
    val base = SparkEntry.simhashRecallSigPath(spark, sfDir)

    ProfHarness.time("probe-sigs") {
      ProfHarness.force(Dedup.simHash(planted, "text", "doc_id"))
    }
    ProfHarness.time("probe-join") {
      ProfHarness.force(Dedup.simHashProbe(
        spark.read.parquet(s"$base/simsigs.parquet"),
        Dedup.simHash(planted, "text", "doc_id"), maxHamming = 6, pieces = 8))
    }
    ProfHarness.time("exact-verify") {
      val cands = Dedup.simHashProbe(
        spark.read.parquet(s"$base/simsigs.parquet"),
        Dedup.simHash(planted, "text", "doc_id"), maxHamming = 6, pieces = 8)
      ProfHarness.force(Dedup.exactBagJaccard(
        cands.select(col("id_a"), col("id_b")),
        universe, "text", "doc_id", minJaccard = 0.8))
    }
    ProfHarness.time("q_simhash_recall") {
      ProfHarness.force(SparkEntry.queries("q_simhash_recall")(spark, sfDir))
    }
    spark.stop()
  }
}
