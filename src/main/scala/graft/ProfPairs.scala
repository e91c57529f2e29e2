package graft

import graft.operators.MarketBasket
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-decomposition profiler for the MarketBasket pair
  * pipeline (q_copurchase / q_item_cf attribution; not part of the
  * driver contract). Times each stage of pairCounts in isolation so the
  * expensive stage is measured, not guessed.
  */
object ProfPairs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.local.dir", Scratch.localDir("profpairs-local"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def input = li.filter(pmod(col("l_orderkey"), lit(2)) === 0)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))

    // warm
    li.agg(count(lit(1))).head()

    ProfHarness.time("distinct-only") {
      ProfHarness.force(input.distinct())
    }
    ProfHarness.time("distinct+ckpt") {
      input.distinct().localCheckpoint().count()
    }
    val items = input.distinct().localCheckpoint()
    ProfHarness.time("sizes+kept-ckpt") {
      val sizes = items.groupBy(col("o")).agg(count(lit(1)).as("_n"))
        .filter(col("_n") <= 64).select(col("o"))
      items.join(sizes, "o").localCheckpoint().count()
    }
    val sizes = items.groupBy(col("o")).agg(count(lit(1)).as("_n"))
      .filter(col("_n") <= 64).select(col("o"))
    val kept = items.join(sizes, "o").localCheckpoint()
    ProfHarness.time("support-ckpt") {
      kept.groupBy(col("p")).agg(count(lit(1)).as("n")).localCheckpoint().count()
    }
    ProfHarness.time("pairjoin+agg") {
      ProfHarness.force(
        kept.as("a").join(kept.as("b"),
            col("a.o") === col("b.o") && col("a.p") < col("b.p"))
          .groupBy(col("a.p").as("item_a"), col("b.p").as("item_b"))
          .agg(count(lit(1)).as("n_ab"))
          .filter(col("n_ab") >= 2))
    }
    ProfHarness.time("pairCounts-full") {
      ProfHarness.force(MarketBasket.pairCounts(
        li.filter(pmod(col("l_orderkey"), lit(2)) === 0)
          .select(col("l_orderkey"), col("l_partkey")),
        "l_orderkey", "l_partkey", minSupport = 2L, maxBasket = 64))
    }
    ProfHarness.time("q_item_cf") {
      ProfHarness.force(SparkEntry.queries("q_item_cf")(spark, sfDir))
    }
    spark.stop()
  }
}
