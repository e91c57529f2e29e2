package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, SetSimJoin}

/** Ad-hoc: capped vs uncapped set-sim on the FULL corpus (scratch). */
object ProfCap {
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
      ProfHarness.timeShown(s"PROFCAP $name")(f)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val tokens = Dedup.shingles(docs, "text", "doc_id", 3)
      .select(col("id"), col("shingle").as("w"))
    for (i <- 1 to 2)
      time(s"capped_full_$i") {
        SetSimJoin.selfJoinTokensCapped(tokens, 0.5, maxDf = 8).count()
      }
    spark.stop()
  }
}
