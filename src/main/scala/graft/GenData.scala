package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic sf1 generator for the SCALE.md rehearsal (scratch tool,
  * not part of the driver contract). The driver generates
  * sf0.001/0.01/0.1 only; this produces a 10x-sf0.1 dataset with the
  * same schemas and the same observable distributions (TESTDATA.md +
  * measured sf0.1 statistics: 32-word document vocabulary, 10-100 word
  * docs, ~0.16% exact-dup rate, unit-norm 64-dim embeddings, 5 event
  * types over a 30-day window, TPC-H-ish key ranges with lineitem ~4
  * lines/order). Everything derives from xxhash64(id, salt) — fully
  * deterministic, no RNG state, reproducible on any executor count.
  *
  * Usage: runMain graft.GenData <outDir>   (default /dev/shm/graft-sf1)
  */
object GenData {

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/dev/shm/graft-sf1")
    // region/nation copy verbatim from the fixed source dir — validated
    // UP FRONT so a wrong path fails before gigabytes of tmpfs writes,
    // and overridable by the same env the other harness mains read
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    require(java.nio.file.Files.exists(
        java.nio.file.Paths.get(srcDir, "region.parquet")),
      s"source dir $srcDir has no region.parquet — set SPARK_GRAFT_SF_DIR")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", Scratch.localDir("gendata-local"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def h(c: org.apache.spark.sql.Column, salt: Int) =
      abs(xxhash64(c, lit(salt)))
    // uniform double in [0,1) from a hash
    def u(c: org.apache.spark.sql.Column, salt: Int) =
      (h(c, salt) % 1000000007L).cast("double") / 1000000007.0

    val vocab = Seq("a", "agg", "batch", "big", "column", "customer",
      "data", "dup", "fast", "filter", "group", "hash", "join", "key",
      "line", "merge", "order", "part", "query", "row", "scan", "slow",
      "small", "sort", "spark", "stream", "table", "the", "value",
      "vector", "window", "index")

    // ---- documents: 50,000 docs, 10-100 words from the vocab --------
    val nDocs = 50000L
    val docs0 = spark.range(nDocs).select(col("id").as("doc_id"))
      .withColumn("_n", (lit(10) + h(col("doc_id"), 1) % 91).cast("int"))
      .withColumn("text", array_join(transform(
        sequence(lit(1), col("_n")),
        i => element_at(typedLit(vocab),
          (abs(xxhash64(col("doc_id"), i, lit(2))) % vocab.size + 1).cast("int"))),
        " "))
    // ~0.16% exact duplicates (doc k*625+624 copies doc k*625+623)
    val dup = docs0.select(col("doc_id"), col("_n"), col("text"))
      .withColumn("_src", when(pmod(col("doc_id"), lit(625)) === 624,
        col("doc_id") - 1).otherwise(col("doc_id")))
    val docs = dup.as("d")
      .join(docs0.select(col("doc_id").as("_src"), col("text").as("_t2")), "_src")
      .select(col("doc_id"), col("_t2").as("text"))
      .withColumn("lang",
        when(u(col("doc_id"), 3) < 0.55, "en")
          .when(u(col("doc_id"), 3) < 0.665, "de")
          .when(u(col("doc_id"), 3) < 0.78, "es")
          .when(u(col("doc_id"), 3) < 0.89, "fr")
          .otherwise("zh"))
      .withColumn("source", concat(lit("src"), (h(col("doc_id"), 4) % 20).cast("string")))
      .withColumn("n_chars", length(col("text")).cast("long"))
    docs.repartition(8).write.mode(SaveMode.Overwrite).parquet(s"$out/documents.parquet")

    // ---- embeddings: 20,000 unit-norm 64-dim vectors ----------------
    val dim = 64
    val emb = spark.range(20000L).select(col("id").as("vec_id"))
      .withColumn("_raw", transform(sequence(lit(1), lit(dim)), i => {
        // Box-Muller from two salted uniforms
        val u1 = (abs(xxhash64(col("vec_id"), i, lit(5))) % 1000000007L + 1L)
          .cast("double") / 1000000008.0
        val u2 = (abs(xxhash64(col("vec_id"), i, lit(6))) % 1000000007L)
          .cast("double") / 1000000007.0
        sqrt(lit(-2.0) * log(u1)) * cos(lit(2.0 * math.Pi) * u2)
      }))
      .withColumn("_norm", sqrt(aggregate(col("_raw"), lit(0.0), (a, x) => a + x * x)))
      .withColumn("embedding", transform(col("_raw"),
        x => (x / col("_norm")).cast("float")))
      .withColumn("label", (h(col("vec_id"), 7) % 10).cast("int"))
      .select(col("vec_id"), col("embedding"), col("label"))
    emb.repartition(4).write.mode(SaveMode.Overwrite).parquet(s"$out/embeddings.parquet")

    // ---- events: 1,000,000 over 30 days, 15,000 users ---------------
    val t0 = lit("2024-01-01 00:00:00").cast("timestamp")
    val events = spark.range(1000000L).select(col("id").as("event_id"))
      .withColumn("ts", timestamp_micros(
        unix_micros(t0) + col("event_id") * 2592000L +
          (h(col("event_id"), 8) % 2000000L)))
      .withColumn("user_id", h(col("event_id"), 9) % 15000)
      .withColumn("event_type", element_at(
        typedLit(Seq("view", "click", "purchase", "signup", "error")),
        (h(col("event_id"), 10) % 5 + 1).cast("int")))
      .withColumn("value", round(u(col("event_id"), 11) * 560.0, 2))
      .withColumn("props", concat(lit("{\"k\": "),
        (h(col("event_id"), 12) % 100).cast("string"), lit("}")))
    events.repartition(8).write.mode(SaveMode.Overwrite).parquet(s"$out/events.parquet")

    // ---- TPC-H-ish star, 10x sf0.1 ----------------------------------
    val nOrders = 1500000L
    val nCust = 150000L
    val nPart = 200000L
    val nSupp = 10000L

    val orders = spark.range(nOrders).select(col("id").as("o_orderkey"))
      .withColumn("o_custkey", h(col("o_orderkey"), 13) % nCust)
      .withColumn("o_orderstatus", element_at(typedLit(Seq("O", "F", "P")),
        (h(col("o_orderkey"), 14) % 3 + 1).cast("int")))
      .withColumn("o_totalprice", round(u(col("o_orderkey"), 15) * 400000.0 + 1000.0, 2))
      .withColumn("o_orderdate", date_add(lit("1995-01-01").cast("date"),
        (h(col("o_orderkey"), 16) % 2404).cast("int")).cast("timestamp"))
      .withColumn("o_orderpriority", element_at(typedLit(Seq(
        "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")),
        (h(col("o_orderkey"), 17) % 5 + 1).cast("int")))
    orders.repartition(8).write.mode(SaveMode.Overwrite).parquet(s"$out/orders.parquet")

    val lineitem = spark.range(nOrders * 4).select(col("id"))
      .withColumn("l_orderkey", expr("id div 4"))
      .withColumn("l_linenumber", (pmod(col("id"), lit(4)) + 1).cast("int"))
      .withColumn("l_partkey", h(col("id"), 18) % nPart)
      .withColumn("l_suppkey", h(col("id"), 19) % nSupp)
      .withColumn("l_quantity", (h(col("id"), 20) % 50 + 1).cast("double"))
      .withColumn("l_extendedprice",
        round(col("l_quantity") * (u(col("id"), 21) * 1900.0 + 100.0), 2))
      .withColumn("l_discount", round(u(col("id"), 22) * 0.1, 2))
      .withColumn("l_tax", round(u(col("id"), 23) * 0.08, 2))
      .withColumn("l_returnflag", element_at(typedLit(Seq("A", "N", "R")),
        (h(col("id"), 24) % 3 + 1).cast("int")))
      .withColumn("l_linestatus", element_at(typedLit(Seq("O", "F")),
        (h(col("id"), 25) % 2 + 1).cast("int")))
      .withColumn("l_shipdate", date_add(lit("1995-01-02").cast("date"),
        (h(col("id"), 26) % 2498).cast("int")).cast("timestamp"))
      .drop("id")
    lineitem.repartition(16).write.mode(SaveMode.Overwrite).parquet(s"$out/lineitem.parquet")

    val customer = spark.range(nCust).select(col("id").as("c_custkey"))
      .withColumn("c_name", concat(lit("Customer#"),
        lpad(col("c_custkey").cast("string"), 9, "0")))
      .withColumn("c_nationkey", h(col("c_custkey"), 27) % 25)
      .withColumn("c_acctbal", round(u(col("c_custkey"), 28) * 11000.0 - 1000.0, 2))
      .withColumn("c_mktsegment", element_at(typedLit(Seq(
        "AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")),
        (h(col("c_custkey"), 29) % 5 + 1).cast("int")))
    customer.repartition(4).write.mode(SaveMode.Overwrite).parquet(s"$out/customer.parquet")

    val adjs = Seq("large", "small", "hot", "cold", "blue", "red",
      "green", "dark", "light", "plain")
    val nouns = Seq("ring", "bolt", "cap", "gear", "disk", "plate",
      "rod", "pin", "tube", "wire")
    val part = spark.range(nPart).select(col("id").as("p_partkey"))
      .withColumn("p_name", concat(
        element_at(typedLit(adjs), (h(col("p_partkey"), 30) % 10 + 1).cast("int")),
        lit(" "),
        element_at(typedLit(nouns), (h(col("p_partkey"), 31) % 10 + 1).cast("int"))))
      .withColumn("p_brand", concat(lit("Brand#"),
        (h(col("p_partkey"), 32) % 25 + 1).cast("string")))
      .withColumn("p_type", element_at(typedLit(Seq(
        "ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD")),
        (h(col("p_partkey"), 33) % 6 + 1).cast("int")))
      .withColumn("p_size", (h(col("p_partkey"), 34) % 50 + 1).cast("int"))
      .withColumn("p_retailprice",
        round(lit(900.0) + pmod(col("p_partkey"), lit(1000)).cast("double") / 10.0, 2))
    part.repartition(4).write.mode(SaveMode.Overwrite).parquet(s"$out/part.parquet")

    val supplier = spark.range(nSupp).select(col("id").as("s_suppkey"))
      .withColumn("s_name", concat(lit("Supplier#"),
        lpad(col("s_suppkey").cast("string"), 9, "0")))
      .withColumn("s_nationkey", h(col("s_suppkey"), 35) % 25)
      .withColumn("s_acctbal", round(u(col("s_suppkey"), 36) * 11000.0 - 1000.0, 2))
    supplier.write.mode(SaveMode.Overwrite).parquet(s"$out/supplier.parquet")

    // region/nation do not scale — copy the fixed tables verbatim
    Seq("region", "nation").foreach { tname =>
      spark.read.parquet(s"$srcDir/$tname.parquet")
        .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$out/$tname.parquet")
    }

    println(s"GENDATA done: $out")
    spark.stop()
  }
}
