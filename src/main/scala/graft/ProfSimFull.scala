package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the FULL-corpus SimHash dedup path at sf1 (not
  * part of the driver contract): attributes the q_dedup_simhash_full
  * sf1 tail between artifact build, banding join, and verify, and
  * measures the Hamming piece-count knob (banding is COMPLETE for any
  * maxHamming < pieces with shared*width <= 48, so the pair set — and
  * the gate hash — is piece-count independent; only candidate volume
  * moves).
  */
object ProfSimFull {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/dev/shm/graft-sf1")
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", Scratch.localDir("profsimfull"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Any): Unit =
      ProfHarness.timeShown(s"PROFSIMFULL $name", reps = 2)(f)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(pmod(col("doc_id"), lit(2)) === 0)
    time("bagGroups") { Dedup.bagGroups(docs, "text", "doc_id").count() }
    val groups = Dedup.bagGroups(docs, "text", "doc_id").localCheckpoint()
    val repDocs = docs.join(groups.select(col("rep").as("doc_id")),
      Seq("doc_id"), "left_semi").localCheckpoint()
    time("simhash_sigs") { Dedup.simHash(repDocs, "text", "doc_id").count() }
    val sigs = Dedup.simHash(repDocs, "text", "doc_id").localCheckpoint()
    // The admissible piece counts at maxHamming=6 (pieces > maxHamming,
    // C(p, p-6) <= 256, key bits <= 48 — divisibility no longer required
    // since the round-15 relaxation): 7 (7 combos x 9-bit keys),
    // 8 (28 x 16), 9 (84 x 21), 10 (210 x 24). All emit the SAME
    // complete candidate set; only the collision/replication balance
    // moves.
    Seq(7, 8, 9, 10).foreach { pieces =>
      time(s"pairs_pieces$pieces") {
        Dedup.simHashPairsFromSigs(sigs, maxHamming = 6, pieces = pieces).count()
      }
    }
    val gpairs = Dedup.simHashPairsFromSigs(sigs, 6, 8).localCheckpoint()
    val counts = repDocs.select(col("doc_id").as("_id"),
        explode(split(trim(col("text")), "\\s+")).as("_w"))
      .filter(length(col("_w")) > 0)
      .groupBy("_id", "_w").agg(count(lit(1)).as("_c")).localCheckpoint()
    time("verify_bagjaccard") {
      Dedup.exactBagJaccardFromCounts(
        gpairs.select(col("rep_a").as("id_a"), col("rep_b").as("id_b")),
        counts, minJaccard = 0.8).count()
    }
    val verified = Dedup.exactBagJaccardFromCounts(
      gpairs.select(col("rep_a").as("id_a"), col("rep_b").as("id_b")),
      counts, minJaccard = 0.8).localCheckpoint()
    val expanded = Dedup.expandGroupPairs(
        verified.select(col("id_a").as("rep_a"), col("id_b").as("rep_b"),
          col("bag_jaccard")), groups)
      .unionByName(Dedup.intraGroupPairs(groups)
        .withColumn("bag_jaccard", lit(1.0)))
    time("expand_to_ids")(expanded.count())
    val out = s"${Scratch.localDir("profsimfull-out")}/pairs.parquet"
    time("coalesce1_write") {
      expanded.coalesce(1).write.mode("overwrite").parquet(out)
      "written"
    }
    time("write_partitioned") {
      expanded.write.mode("overwrite").parquet(out + "2")
      "written"
    }
    spark.stop()
  }
}
