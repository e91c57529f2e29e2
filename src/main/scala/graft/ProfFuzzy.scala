package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-by-stage profile of the fuzzy-match plan (not part of
  * the shipped surface; used to attribute bench seconds).
  */
object ProfFuzzy {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.local.dir", Scratch.localDir("proffuzzy"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Any): Unit =
      ProfHarness.timeShown(s"PROF $name", reps = 2)(f)
    // full q_fuzzy_match dictionary: half parts + planted typos + half customers
    val pn = spark.read.parquet(s"$sfDir/part.parquet")
      .filter(pmod(col("p_partkey"), lit(2)) === 0)
      .select(col("p_name").as("name")).distinct()
    val typos = pn.filter(length(col("name")) >= 8)
      .select(expr("""concat(substr(name, 1, length(name) div 2),
                     |  substr(name, length(name) div 2 + 2,
                     |         length(name)))""".stripMargin).as("name"))
    val cnRaw = spark.read.parquet(s"$sfDir/customer.parquet")
      .filter(pmod(col("c_custkey"), lit(2)) === 0)
      .select(col("c_name").as("name")).distinct()
    val cn = pn.unionAll(typos).unionAll(cnRaw)
    val delete1Hashes =
      expr("""array_distinct(transform(concat(array(name),
             |  transform(sequence(1, length(name)),
             |    i -> concat(substr(name, 1, i - 1),
             |                substr(name, i + 1, length(name))))),
             |  s -> xxhash64(s)))""".stripMargin)
    val v = cn.select(col("name"), explode(delete1Hashes).as("vh"))
    time("variants")(v.count())
    // variant-df distribution: how much candidate volume (sum df^2) do
    // the hottest buckets carry?
    val df_ = v.groupBy("vh").count()
    println("DF DISTRIBUTION (df -> n_variants, sum_pairs=C(df,2)*n):")
    df_.groupBy(col("count").as("df")).agg(count(lit(1)).as("n"))
      .withColumn("pairs", col("df") * (col("df") - 1) / 2 * col("n"))
      .orderBy(col("df").desc).limit(30).collect()
      .foreach(r => println(s"  df=${r.get(0)} n=${r.get(1)} pairs=${r.get(2)}"))
    Seq(16L, 32L, 64L, 128L).foreach { cap =>
      val hot = df_.filter(col("count") > cap).select("vh")
      val kept = v.join(broadcast(hot), Seq("vh"), "left_anti")
      val candC = kept.as("a").join(kept.as("b"),
        col("a.vh") === col("b.vh") && col("a.name") < col("b.name"))
        .select(col("a.name").as("name_a"), col("b.name").as("name_b"))
        .distinct()
      val verC = candC.withColumn("dist", graft.functions.GraftFunctions
        .graftEditWithin1(col("name_a"), col("name_b")))
        .filter(col("dist") >= 0)
      time(s"capped_df$cap")(verC.count())
    }
    val cand = v.as("a").join(v.as("b"),
      col("a.vh") === col("b.vh") && col("a.name") < col("b.name"))
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"))
    time("cand_raw")(cand.count())
    val dis = cand.distinct()
    time("cand_distinct")(dis.count())
    val fil = dis.withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= 1)
    time("verified")(fil.count())
    time("ordered_forced") {
      ProfHarness.force(fil.orderBy("name_a", "name_b"))
    }
    val fil2 = dis
      .withColumn("dist", levenshtein(col("name_a"), col("name_b"), 1))
      .filter(col("dist") >= 0)
    time("verified_bounded")(fil2.count())
    val fil3 = dis
      .withColumn("dist", graft.functions.GraftFunctions
        .graftEditWithin1(col("name_a"), col("name_b")))
      .filter(col("dist") >= 0)
    time("verified_native")(fil3.count())
    time("ordered_forced_native") {
      ProfHarness.force(fil3.orderBy("name_a", "name_b"))
    }
    // verify FIRST (cheap codegen'd within-1 scan), distinct AFTER: the
    // distinct shuffle carries 1.46M verified pairs instead of 6M
    // candidates
    val fil4 = cand
      .withColumn("dist", graft.functions.GraftFunctions
        .graftEditWithin1(col("name_a"), col("name_b")))
      .filter(col("dist") >= 0)
      .distinct()
    time("verify_then_distinct")(fil4.count())
    time("ordered_forced_v2") {
      ProfHarness.force(fil4.orderBy("name_a", "name_b"))
    }
    spark.stop()
  }
}
