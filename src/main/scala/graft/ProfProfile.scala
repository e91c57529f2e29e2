package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the one-scan profile aggregate. */
object ProfProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", Scratch.localDir("scratch-local"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    def time(name: String)(f: => Any): Unit =
      ProfHarness.time(s"PP $name")(f)
    time("warm") { orders.agg(count(lit(1))).head() }
    time("plain_aggs") {
      orders.agg(count(lit(1)), count(when(col("o_custkey").isNull, 1)),
        min(col("o_custkey")).cast("string"), max(col("o_custkey")).cast("string"),
        min(col("o_totalprice")).cast("string"), max(col("o_totalprice")).cast("string")).head()
    }
    time("one_distinct") { orders.agg(countDistinct(col("o_custkey"))).head() }
    time("two_distinct") {
      orders.agg(countDistinct(col("o_custkey")),
        countDistinct(col("o_orderstatus"))).head()
    }
    time("four_distinct") {
      orders.agg(countDistinct(col("o_custkey")),
        countDistinct(col("o_orderstatus")),
        countDistinct(col("o_totalprice")),
        countDistinct(col("o_orderdate"))).head()
    }
    time("combined_no_reshape") {
      val cols = Seq("o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
      val aggs = cols.flatMap { c =>
        Seq(count(lit(1)), count(when(col(c).isNull, 1)),
          countDistinct(col(c)),
          min(col(c)).cast("string"), max(col(c)).cast("string"))
      }
      orders.agg(aggs.head, aggs.tail: _*).head()
    }
    time("distinct4_plus_sharedplain") {
      val cols = Seq("o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
      val aggs = Seq(count(lit(1))) ++ cols.map(c => countDistinct(col(c))) ++
        cols.flatMap(c => Seq(min(col(c)).cast("string"), max(col(c)).cast("string"),
          count(when(col(c).isNull, 1))))
      orders.agg(aggs.head, aggs.tail: _*).head()
    }
    time("full_profile") {
      graft.operators.Profiling.profile(orders,
        Seq("o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")).collect()
    }
    spark.stop()
  }
}
