package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Ad-hoc stage attribution for q_dedup_simhash_full (scratch tool). */
object ProfShf {
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
      ProfHarness.timeShown(s"PROFSHF $name")(f)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(pmod(col("doc_id"), lit(2)) === 0)
    val base = Scratch.localDir("profshf")
    val groups0 = Dedup.bagGroups(docs, "text", "doc_id")
    groups0.write.mode("overwrite").parquet(s"$base/groups.parquet")
    val repDocs = docs.join(groups0.select(col("rep").as("doc_id")), Seq("doc_id"), "left_semi")
    Dedup.simHash(repDocs, "text", "doc_id").write.mode("overwrite").parquet(s"$base/sigs.parquet")
    for (i <- 1 to 3) {
      val groups = spark.read.parquet(s"$base/groups.parquet")
      val sigs = spark.read.parquet(s"$base/sigs.parquet")
      time(s"gpairs_$i") {
        Dedup.simHashPairsFromSigs(sigs, 6, 8).count()
      }
      val gpairs = Dedup.simHashPairsFromSigs(sigs, 6, 8)
      time(s"verify_$i") {
        Dedup.exactBagJaccard(
          gpairs.select(col("rep_a").as("id_a"), col("rep_b").as("id_b")),
          docs, "text", "doc_id", minJaccard = 0.8).count()
      }
      val verified = Dedup.exactBagJaccard(
        gpairs.select(col("rep_a").as("id_a"), col("rep_b").as("id_b")),
        docs, "text", "doc_id", minJaccard = 0.8)
      time(s"expand_$i") {
        Dedup.expandGroupPairs(
          verified.select(col("id_a").as("rep_a"), col("id_b").as("rep_b"), col("bag_jaccard")),
          groups)
          .unionByName(Dedup.intraGroupPairs(groups).withColumn("bag_jaccard", lit(1.0)))
          .count()
      }
    }
    spark.stop()
  }
}
