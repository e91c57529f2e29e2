package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TermIndex

/** Ad-hoc stage attribution for q_sparse_knn (scratch tool). */
object ProfKnn {
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
      ProfHarness.timeShown(s"PROFKNN $name")(f)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val base = Scratch.localDir("profknn")
    TermIndex.tfidfIndex(docs, "text", "doc_id")
      .write.mode("overwrite").parquet(s"$base/index.parquet")
    val idx0 = spark.read.parquet(s"$base/index.parquet")
    idx0.groupBy(col("id")).agg(sum(col("w") * col("w")).as("n2"))
      .write.mode("overwrite").parquet(s"$base/norms.parquet")
    val idx = spark.read.parquet(s"$base/index.parquet")
    val norms = spark.read.parquet(s"$base/norms.parquet")
    val queries = docs.filter(pmod(col("doc_id"), lit(100)) === 0).select(col("doc_id"))
    for (i <- 1 to 3) {
      time(s"idx_count_$i") { idx.count() }
      time(s"qw_$i") {
        idx.join(broadcast(queries.select(col("doc_id").as("id"))), "id").count()
      }
      val qw = idx.join(broadcast(queries.select(col("doc_id").as("id"))), "id")
      time(s"dots_$i") {
        idx.join(broadcast(qw.select(col("id").as("qid"), col("word"), col("w").as("qw"))), "word")
          .filter(col("id") =!= col("qid"))
          .groupBy(col("qid"), col("id")).agg(sum(col("qw") * col("w")).as("dot")).count()
      }
      time(s"full_$i") {
        TermIndex.sparseKnnFromIndex(idx, queries, 5, Some(norms)).collect().length
      }
    }
    spark.stop()
  }
}
