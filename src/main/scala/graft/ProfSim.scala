package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-level profiler for the SimHash dedup path (not part of
  * the driver contract): times each stage of q_dedup_simhash warm to
  * attribute the per-query bench cost.
  */
object ProfSim {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", Scratch.localDir("scratch-local"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Any): Unit =
      ProfHarness.time(s"PROFSIM $name")(f)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 300)
    time("bagGroups") { Dedup.bagGroups(docs, "text", "doc_id").count() }
    val groups = Dedup.bagGroups(docs, "text", "doc_id")
    time("groupPairs") {
      Dedup.simHashGroupPairs(docs, groups, "text", "doc_id", 6, 8).count()
    }
    val gpairs = Dedup.simHashGroupPairs(docs, groups, "text", "doc_id", 6, 8)
    time("verify") {
      Dedup.exactBagJaccard(
        gpairs.select(col("rep_a").as("id_a"), col("rep_b").as("id_b")),
        docs, "text", "doc_id", 0.8).count()
    }
    time("full_nearDup") {
      val cands = Dedup.simHashNearDup(docs, "text", "doc_id", 6, 8)
      Dedup.exactBagJaccard(cands, docs, "text", "doc_id", 0.8).count()
    }
    spark.stop()
  }
}
