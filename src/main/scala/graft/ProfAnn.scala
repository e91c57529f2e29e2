package graft

import org.apache.spark.sql.functions._

/** Measurement harness for the LSH multi-probe recall/scan tradeoff:
  * for each (planes, tables, maxHamming) config, TRUE-NEIGHBOR
  * recall@10 of [[operators.Similarity.lshTopK]] against the exact
  * brute-force top-10 (query vector excluded from both rankings since
  * r16 — the guaranteed self-hit previously inflated every config by a
  * free 0.1), plus the scanned-fraction the probe admits — the two
  * numbers that pick the production config (VERDICT r11 item 3: the
  * gated 4x8/H<=1 config measured recall 0.3; a shippable index needs
  * >= 0.8). Results recorded in SCALE.md.
  *
  * Usage: runMain graft.ProfAnn [sfDir] [queryIds...]
  */
object ProfAnn {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val queryIds: Seq[Long] =
      if (args.length > 1) args.drop(1).map(_.toLong).toSeq else Seq(0L)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.local.dir", Scratch.localDir("profann-local"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val nVec = emb.count()
    val configs = Seq((8, 4, 1), (8, 8, 1), (8, 4, 2), (8, 8, 2),
      (10, 8, 2), (12, 8, 2), (12, 12, 2))
    for ((planes, tables, hamming) <- configs) {
      var hits = 0L
      var scanned = 0.0
      for (qid <- queryIds) {
        val qv = emb.filter(col("vec_id") === qid)
          .select(operators.Similarity.toDouble(col("embedding")))
          .head().getSeq[Double](0)
        // TRUE-NEIGHBOR recall: the query vector is excluded from both
        // rankings — the guaranteed self-hit (cosine 1.0, bucket XOR 0)
        // inflated every config's recall@10 by a free 0.1, so a config
        // with 7/9 true recall read as exactly the 0.8 shipping bar.
        // (Self-inclusion is a constant +1 hit, so config RANKINGS from
        // older readouts still hold; absolute numbers shift down.)
        val corpus = emb.filter(col("vec_id") =!= qid)
        val approx = operators.Similarity.lshTopK(corpus, "embedding", "vec_id",
          qv, k = 10, planes = planes, tables = tables, roundTo = 4,
          maxHamming = hamming).select(col("vec_id"))
        val exact = operators.Similarity.bruteForceTopK(corpus, "embedding",
          "vec_id", qv, k = 10, roundTo = 4).select(col("vec_id"))
        hits += exact.join(approx, Seq("vec_id"), "left_semi").count()
      }
      // scan fraction: expected per-table probe admission, reported from
      // the binomial formula (data-independent for sign bits near
      // balanced); the measured recall is the empirical number.
      val perTable = (0 to hamming)
        .map(i => choose(planes, i)).sum.toDouble / (1L << planes)
      scanned = 1.0 - math.pow(1.0 - perTable, tables.toDouble)
      val recall = hits.toDouble / (10.0 * queryIds.size)
      println(f"PROFANN planes=$planes%2d tables=$tables%2d H<=$hamming " +
        f"recall@10=$recall%.3f over ${queryIds.size} queries " +
        f"(expected scan fraction ~$scanned%.3f of $nVec vectors)")
    }
    spark.stop()
  }

  private def choose(n: Int, k: Int): Long =
    (1 to k).foldLeft(1L)((acc, i) => acc * (n - i + 1) / i)
}
