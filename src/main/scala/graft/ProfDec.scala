package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scratch A/B: decimal-buffer aggregation vs scaled-long aggregation
  * for the q_group_agg shape (attribution for the exact-sum family; not
  * part of the driver contract).
  */
object ProfDec {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.local.dir", Scratch.localDir("profdec-local"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    li.agg(count(lit(1))).head()
    val dec = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(18, 2))

    ProfHarness.time("scan-only") {
      ProfHarness.force(li.select(col("l_returnflag"), col("l_linestatus"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount")))
    }
    ProfHarness.time("group-agg-decimal") {
      ProfHarness.force(li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(dec(col("l_quantity"))).cast(DoubleType).as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast(DoubleType).as("sum_base"),
          sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast(DoubleType).as("sum_disc_price"),
          count(lit(1)).as("count_order")))
    }
    ProfHarness.time("group-agg-scaledlong") {
      val q = (dec(col("l_quantity")) * 100).cast(LongType)
      val p = (dec(col("l_extendedprice")) * 100).cast(LongType)
      val dsc = (dec(col("l_discount")) * 100).cast(LongType)
      ProfHarness.force(li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg((sum(q).cast(DecimalType(28, 0)) / 100).cast(DoubleType).as("sum_qty"),
          (sum(p).cast(DecimalType(28, 0)) / 100).cast(DoubleType).as("sum_base"),
          (sum(p * (lit(100L) - dsc)).cast(DecimalType(28, 0)) / 10000)
            .cast(DoubleType).as("sum_disc_price"),
          count(lit(1)).as("count_order")))
    }
    ProfHarness.time("group-agg-double") {
      ProfHarness.force(li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"),
          sum(col("l_extendedprice")).as("sum_base"),
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("sum_disc_price"),
          count(lit(1)).as("count_order")))
    }
    // value parity check
    val a = li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(dec(col("l_quantity"))).cast(DoubleType).as("v1"),
        sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast(DoubleType).as("v2"))
      .orderBy(col("l_returnflag"), col("l_linestatus")).collect()
    val q = (dec(col("l_quantity")) * 100).cast(LongType)
    val p = (dec(col("l_extendedprice")) * 100).cast(LongType)
    val dsc = (dec(col("l_discount")) * 100).cast(LongType)
    val b = li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg((sum(q).cast(DecimalType(28, 0)) / 100).cast(DoubleType).as("v1"),
        (sum(p * (lit(100L) - dsc)).cast(DecimalType(28, 0)) / 10000)
          .cast(DoubleType).as("v2"))
      .orderBy(col("l_returnflag"), col("l_linestatus")).collect()
    println("PARITY " + (a.toSeq == b.toSeq) + " a=" + a.head + " b=" + b.head)
    spark.stop()
  }
}
