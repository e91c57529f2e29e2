package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import java.util.concurrent.atomic.AtomicBoolean

/** Scratch profiler (not part of the driver contract) attributing the
  * q_dedup_simhash_full intra-round bench swing (r16: 0.60 s -> 1.82 s
  * between same-HEAD runs while the rest of the suite moved ~1.3x).
  *
  * Hypothesis under test: the gate's tail is the `coalesce(1)` oracle
  * dump — a SINGLE-THREADED funnel (one writer task) at the end of an
  * otherwise 32-way pipeline. Under box load, parallel stages degrade
  * by the load factor spread across cores, but a 1-thread tail degrades
  * by the full per-core contention — so the gate would inflate ~3x when
  * the suite inflates ~1.3x. The A/B: same JVM, 6 reps each of
  * (a) banding+verify+expand forced WITHOUT the single-file write,
  * (b) the full gate body INCLUDING the coalesce(1) write,
  * each measured idle and then under a deliberate 32-thread CPU burn.
  */
object ProfSwing {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", Scratch.localDir("profswing"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val outDir = Scratch.localDir("profswing_out")
    // the gate's standing artifact, built once outside the measured body
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(pmod(col("doc_id"), lit(2)) === 0)
    val groups = Dedup.bagGroups(docs, "text", "doc_id").localCheckpoint()
    val repDocs = docs.join(groups.select(col("rep").as("doc_id")),
      Seq("doc_id"), "left_semi")
    val sigs = Dedup.simHash(repDocs, "text", "doc_id").localCheckpoint()
    val counts = repDocs.select(col("doc_id").as("_id"),
        explode(split(trim(col("text")), "\\s+")).as("_w"))
      .filter(length(col("_w")) > 0)
      .groupBy("_id", "_w").agg(count(lit(1)).as("_c")).localCheckpoint()

    def pipeline() = {
      val gpairs = Dedup.simHashPairsFromSigs(sigs, maxHamming = 6, pieces = 8)
      val verified = Dedup.exactBagJaccardFromCounts(
        gpairs.select(col("rep_a").as("id_a"), col("rep_b").as("id_b")),
        counts, minJaccard = 0.8)
      Dedup.expandGroupPairs(
          verified.select(col("id_a").as("rep_a"), col("id_b").as("rep_b"),
            col("bag_jaccard")), groups)
        .unionByName(Dedup.intraGroupPairs(groups)
          .withColumn("bag_jaccard", lit(1.0)))
    }

    def noWrite(): Unit = ProfHarness.force(pipeline())
    def withWrite(): Unit = {
      pipeline().coalesce(1).write.mode("overwrite").parquet(s"$outDir/pairs.parquet")
      ProfHarness.force(
        spark.read.parquet(s"$outDir/pairs.parquet").orderBy(col("id_a"), col("id_b")))
    }

    def burn(threads: Int)(body: => Unit): Unit = {
      val stop = new AtomicBoolean(false)
      val ts = (1 to threads).map { _ =>
        val t = new Thread(() => {
          var x = 0L
          while (!stop.get()) { x += java.lang.Long.rotateLeft(x ^ 0x9e3779b9L, 13) }
        })
        t.setDaemon(true); t.start(); t
      }
      try body finally { stop.set(true); ts.foreach(_.join(200)) }
    }

    ProfHarness.time("PROFSWING nowrite idle", reps = 6)(noWrite())
    ProfHarness.time("PROFSWING write   idle", reps = 6)(withWrite())
    burn(32) {
      ProfHarness.time("PROFSWING nowrite load32", reps = 6)(noWrite())
      ProfHarness.time("PROFSWING write   load32", reps = 6)(withWrite())
    }
    spark.stop()
  }
}
