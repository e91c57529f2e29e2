package graft

import org.apache.spark.sql.functions._

/** The SQL surface of the native expressions: GraftExtensions registers
  * graft_dot / graft_topk / graft_minhash so `spark.sql` text queries can
  * use them (the Column API builds the same expressions directly).
  */
class GraftExtensionsSpec extends SparkSpec {

  test("graft_dot is callable from SQL") {
    import spark.implicits._
    Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
      .createOrReplaceTempView("vecs")
    val d = spark.sql("SELECT graft_dot(a, b) AS d FROM vecs").head().getDouble(0)
    assert(d === 32.0)
  }

  test("graft_topk is callable from SQL") {
    import spark.implicits._
    (1 to 10).map(i => (i % 2, i)).toDF("g", "v").createOrReplaceTempView("t")
    val rows = spark.sql(
      "SELECT g, graft_topk(-v, v, 2) AS top2 FROM t GROUP BY g ORDER BY g")
      .collect()
    assert(rows(0).getSeq[Int](1) === Seq(10, 8)) // g=0: largest two evens
    assert(rows(1).getSeq[Int](1) === Seq(9, 7))
  }

  test("graft_minhash from SQL equals the Column-API signature") {
    import spark.implicits._
    val sh = Seq((1L, "a b c"), (1L, "b c d"), (2L, "x y z"))
      .toDF("id", "shingle")
      .withColumn("h", pmod(xxhash64(col("shingle")),
        lit(graft.functions.MinHash.MersennePrime)))
    sh.createOrReplaceTempView("sh")
    val viaSql = spark.sql(
      "SELECT id, graft_minhash(h, 16) AS sig FROM sh GROUP BY id ORDER BY id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaCol = sh.groupBy("id")
      .agg(graft.functions.GraftFunctions.graftMinHash(col("h"), 16).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaSql === viaCol)
    assert(viaSql(1L).length === 16)
    assert(viaSql(1L) !== viaSql(2L))
  }
}
