package graft
import org.apache.spark.sql.SparkSession
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up session: touch every table once
    Seq("part","lineitem","documents","embeddings").foreach(n =>
      spark.read.parquet(s"$sfDir/$n.parquet").count())
    val names = Seq("q_search_ilike_or","q_text_stats","q_embed_ann_lsh",
      "q_embed_topk","q_dedup_minhash","q_dedup_simhash","q_window_topk","q_events_session")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        println(f"$n run$i: ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
