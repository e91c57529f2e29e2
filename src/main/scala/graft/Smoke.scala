package graft

import org.apache.spark.sql.SparkSession

/** Dev tool mirroring the driver's t1 smoke: SparkEntry.entry must
  * return >0 rows on sf0.001. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"SMOKE rows=$n ${if (n > 0) "PASS" else "FAIL"}")
    spark.stop()
    // a failing smoke must fail VISIBLY to exit-code consumers too (the
    // Bench discipline) — printing FAIL while exiting 0 lets a CI step
    // wired to the status report success on a broken entry
    if (n == 0) sys.exit(1)
  }
}
