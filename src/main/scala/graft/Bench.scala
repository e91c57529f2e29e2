package graft
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-round benchmark main. Prints one JSON line with per-query seconds.
  *
  * Evaluation is forced with bit_xor(xxhash64(struct(*))) over the full
  * result — unlike count(), this makes every projected column actually
  * compute (Catalyst cannot prune the projection under the hash), and
  * unlike sum() it cannot overflow under ANSI arithmetic. A warmup query
  * runs first so JVM/codegen/parquet-footer startup is not billed to the
  * first map entry.
  */
object Bench {
  private def force(df: DataFrame): Unit = {
    val cols = df.columns.map(col).toSeq
    df.agg(bit_xor(xxhash64(struct(cols: _*)))).head()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup: exercise codegen, shuffle machinery, and every parquet footer
    // once, so per-query times below measure the plans, not JVM startup.
    try {
      SparkEntry.queries.get("q_group_agg").foreach(fn => force(fn(spark, sfDir)))
      SparkEntry.queries.get("q_text_stats").foreach(fn => force(fn(spark, sfDir)))
    } catch { case _: Throwable => () }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try force(fn(spark, sfDir)) catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
