package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch micro-profiler (not part of the driver contract; used to
  * attribute per-query bench cost). Pass query names as args: each is
  * forced 3x so run1 shows cold (planning + codegen) cost and run2/3
  * show the warm data cost — the gap is compile overhead, the warm
  * floor is the actual plan.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpusRaw = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val cpus = try cpusRaw.trim.toInt catch {
      case _: NumberFormatException =>
        sys.error(s"SPARK_GRAFT_CPUS must be an integer, got '$cpusRaw'")
    }
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("SPARK_GRAFT_OBJ_FALLBACK", "4096"))
      // Match Bench: the Janino class cache default (100) thrashes on
      // multi-query profiling sessions — static conf.
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "10000"))
      .config("spark.local.dir", Scratch.localDir("prof-local"))
      // A/B hook: AQE partition coalescing to the advisory target size
      // instead of keeping input parallelism (see Bench for rationale).
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_PARALLELISM_FIRST", "true"))
      // A/B hook: AQE on/off — at sf0.1 every shuffle's stage
      // materialization is pure latency; at 100 TB AQE is load-bearing
      // (skew splits, runtime coalesce), so production keeps it on.
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Any): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"PROF $name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    def force(name: String): Unit = {
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.agg(bit_xor(xxhash64(struct(df.columns.map(col): _*)))).head()
    }
    val names = if (args.nonEmpty) args.toSeq else Seq("q_group_agg")
    // one warmup query to absorb JVM/parquet-footer startup
    try force("q_group_agg") catch { case _: Throwable => () }
    names.foreach(n => time(n)(force(n)))
    spark.stop()
  }
}
