package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Ad-hoc stage attribution for q_dedup_recall (scratch tool). */
object ProfDdr {
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
      ProfHarness.timeShown(s"PROFDDR $name")(f)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select(col("doc_id"), col("text"))
    val muts = Seq(4, 6, 10, 20, 30, 50, 80, 120, 200, 1000)
    val m = element_at(typedLit(muts), (pmod(expr("doc_id div 10"), lit(10)) + 1).cast("int"))
    val ws = split(trim(col("text")), "\\s+")
    val mutated = array_join(transform(ws, (w, i) => when(pmod(i + 1, m) === 0, lit("xmutx")).otherwise(w)), " ")
    val planted = docs.filter(col("doc_id") < 500 && pmod(col("doc_id"), lit(10)) === 0)
      .select((col("doc_id") + 980000L).as("doc_id"), mutated.as("text"))
    val base = Scratch.localDir("profddr")
    Dedup.minHashSignatures(docs, "text", "doc_id", numHashes = 64)
      .write.mode("overwrite").parquet(s"$base/sigs.parquet")
    val universe = docs.unionByName(planted)
    for (i <- 1 to 3) {
      time(s"psigs_$i") { Dedup.minHashSignatures(planted, "text", "doc_id", 64).count() }
      val cands = Dedup.minHashLshProbe(
        spark.read.parquet(s"$base/sigs.parquet"),
        Dedup.minHashSignatures(planted, "text", "doc_id", 64), 64, 32, 0.35)
      time(s"cands_$i") { cands.count() }
      time(s"found_$i") {
        Dedup.exactShingleJaccard(cands, universe, "text", "doc_id", 3, 0.8)
          .filter(col("id_a") < 980000L && col("id_b") >= 980000L).count()
      }
      time(s"target_$i") {
        Dedup.probeJaccard(docs, planted, "text", "doc_id", 3, 0.8).count()
      }
    }
    spark.stop()
  }
}
