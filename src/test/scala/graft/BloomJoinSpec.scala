package graft

import graft.operators.BloomJoin
import org.apache.spark.sql.functions._

/** The Bloom prefilter is pure acceleration: the final semi-join must
  * equal the plain semi-join exactly, and the prefilter alone must never
  * lose a true match (Bloom filters have no false negatives) while
  * actually pruning (otherwise it's a no-op in the plan).
  */
class BloomJoinSpec extends SparkSpec {

  test("bloomSemiJoin equals the plain left-semi join exactly") {
    import spark.implicits._
    val fact = (1L to 5000L).map(i => (i, i % 701)).toDF("row_id", "k")
    val dim = (0L to 700L by 7).map(i => Tuple1(i)).toDF("dk")
    val got = BloomJoin.bloomSemiJoin(fact, dim, "k", "dk", expectedItems = 1024)
      .orderBy("row_id").collect().map(_.getLong(0))
    val want = fact.join(dim, col("k") === col("dk"), "left_semi")
      .orderBy("row_id").collect().map(_.getLong(0))
    assert(got.sameElements(want))
    assert(want.nonEmpty)
  }

  test("prefilter keeps every true match and prunes most non-matches") {
    import spark.implicits._
    val fact = (1L to 20000L).map(i => (i, i % 9973)).toDF("row_id", "k")
    // 1% of the key space
    val dim = (0L until 9973L).filter(_ % 100 == 0).map(Tuple1(_)).toDF("dk")
    val pre = BloomJoin.bloomPrefilter(fact, dim, col("k"), col("dk"),
      expectedItems = 1024, fpp = 0.01)
    val preKeys = pre.select("row_id").collect().map(_.getLong(0)).toSet
    val trueKeys = fact.join(dim, col("k") === col("dk"), "left_semi")
      .select("row_id").collect().map(_.getLong(0)).toSet
    assert(trueKeys.subsetOf(preKeys), "Bloom prefilter dropped a true match")
    // selectivity: at 1% match rate and 1% fpp the prefilter should kill
    // the overwhelming majority of rows; 10x headroom on the bound
    assert(preKeys.size <= trueKeys.size + 20000 / 10,
      s"prefilter barely pruned: ${preKeys.size} of 20000 survived")
  }

  test("empty dim side yields an empty result, not an error") {
    import spark.implicits._
    val fact = (1L to 100L).map(i => (i, i)).toDF("row_id", "k")
    val dim = Seq.empty[Long].map(Tuple1(_)).toDF("dk")
    assert(BloomJoin.bloomSemiJoin(fact, dim, "k", "dk", expectedItems = 16).count() === 0)
  }

  test("SQL surface: graft_bloom_agg + graft_might_contain via scalar subquery") {
    import spark.implicits._
    (1L to 1000L).map(i => (i, i % 31)).toDF("row_id", "k")
      .createOrReplaceTempView("bloom_fact")
    (0L to 30L by 3).map(Tuple1(_)).toDF("dk").createOrReplaceTempView("bloom_dim")
    val n = spark.sql(
      """SELECT count(*) AS n FROM bloom_fact
        |WHERE graft_might_contain(
        |        (SELECT graft_bloom_agg(dk, 64, 4096) FROM bloom_dim), k)
        |  AND k IN (SELECT dk FROM bloom_dim)""".stripMargin)
      .head().getLong(0)
    val want = spark.sql(
      "SELECT count(*) AS n FROM bloom_fact WHERE k IN (SELECT dk FROM bloom_dim)")
      .head().getLong(0)
    assert(n === want)
  }
}
