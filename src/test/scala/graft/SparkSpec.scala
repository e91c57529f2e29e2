package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites. */
object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .withExtensions(new GraftExtensions)
    .config("spark.sql.shuffle.partitions", "4")
    // Shuffle scratch on tmpfs — /tmp sits on the throttled sandbox
    // disk (see graft.Scratch).
    .config("spark.local.dir", Scratch.localDir("test-local"))
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  def writeText(dir: String, name: String, content: String): String = {
    val p = java.nio.file.Paths.get(dir, name)
    java.nio.file.Files.writeString(p, content)
    p.toString
  }
}
