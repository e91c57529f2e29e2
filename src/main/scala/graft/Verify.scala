package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val only = args.drop(2).toSet // optional query filter for local iteration
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      // TypedImperativeAggregate states here are small fixed-size buffers
      // (int[64] SimHash, long[k] MinHash, bounded top-k heaps), so let
      // ObjectHashAggregate keep thousands of groups in memory per task
      // instead of falling back to sort-based aggregation at the default
      // 128 keys — the fallback re-sorts the whole exploded input
      // (measured ~20% on the signature aggregates). The default guards
      // multi-MB collect_list states, which no plan here builds.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4096")
      // 120+ queries x several codegen fragments each overflow the
      // 100-entry Janino class cache (see Bench) — static conf.
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      // Shuffle/spill scratch on tmpfs — the sandbox's /tmp is on a
      // throttled shared disk whose stall windows dominate measured
      // times (see Scratch).
      .config("spark.local.dir", Scratch.localDir("verify-local"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
