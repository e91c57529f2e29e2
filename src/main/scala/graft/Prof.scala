package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch micro-profiler for expression variants (not part of the
  * driver contract; used to attribute per-query bench cost).
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()
    val txt = col("text")
    val stopList = Seq("the", "a", "an", "of", "and", "to", "in", "is",
      "it", "that", "for", "on", "with", "as", "was", "at", "by")
    def time(name: String)(f: => Any): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    time("split_only") {
      docs.select(size(split(trim(txt), "\\s+"))).agg(sum(col("size(split(trim(text), \\s+, -1))"))).head()
    }
    time("nonspace_regex") {
      docs.select(length(regexp_replace(trim(txt), "\\s+", "")).as("x")).agg(sum(col("x"))).head()
    }
    time("punct_regex") {
      docs.select(regexp_count(txt, lit("[^A-Za-z0-9\\s]")).as("x")).agg(sum(col("x"))).head()
    }
    time("stop_hof") {
      docs.select(size(filter(split(lower(trim(txt)), "\\s+"),
        w => w.isin(stopList.map(lit): _*))).as("x")).agg(sum(col("x"))).head()
    }
    def force(name: String): Unit = {
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.agg(bit_xor(xxhash64(struct(df.columns.map(col): _*)))).head()
    }
    time("stop_regex_padded") {
      val pat = " (" + stopList.mkString("|") + ") "
      docs.select(regexp_count(
          concat(lit(" "), regexp_replace(lower(trim(txt)), "\\s+", "  "), lit(" ")),
          lit(pat)).as("x"))
        .agg(sum(col("x"))).head()
    }
    time("full_text_stats") { force("q_text_stats") }
    time("full_langid") { force("q_text_langid") }
    time("ingest_e2e") { force("q_ingest_e2e") }
    spark.stop()
  }
}
