package graft

import java.sql.Timestamp

import graft.operators.AsOfJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The native operator must agree with the composed window formulation
  * on every input — the composed form is oracle-verified (q_asof_join),
  * so equality transfers the DuckDB ASOF gate to the native plan. Also
  * pins the physical properties the operator exists for: no window
  * exchange beyond the two clustering exchanges, and a single-pass
  * merge.
  */
class AsOfJoinNativeSpec extends SparkSpec {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private def compare(left: DataFrame, right: DataFrame, keys: Seq[String],
      lts: String, rts: String, values: Seq[String]): Unit = {
    val composed = AsOfJoin.asOf(left, right, keys, lts, rts, values)
    val native = AsOfJoin.asOfNative(left, right, keys, lts, rts, values)
    assert(native.columns.toSeq === composed.columns.toSeq)
    val cols = composed.columns.map(col).toSeq
    val c = composed.select(cols: _*).collect().map(_.toString).sorted
    val n = native.select(cols: _*).collect().map(_.toString).sorted
    assert(n.length === c.length, s"row count: native ${n.length} vs composed ${c.length}")
    assert(n.sameElements(c))
  }

  test("differential vs composed: basic carry-forward, gaps, and misses") {
    import spark.implicits._
    val left = Seq(
      (1L, ts(10)), (1L, ts(20)), (1L, ts(30)),
      (2L, ts(5)), (2L, ts(50)),
      (3L, ts(100))).toDF("k", "lts")
    val right = Seq(
      (1L, ts(15), "a", 1.0), (1L, ts(25), "b", 2.0),
      (2L, ts(5), "c", 3.0),
      (4L, ts(1), "z", 9.0)).toDF("k", "rts", "tag", "v")
    compare(left, right, Seq("k"), "lts", "rts", Seq("tag", "v"))
  }

  test("differential: same-instant right row is visible (<= bound)") {
    import spark.implicits._
    val left = Seq((1L, ts(10))).toDF("k", "lts")
    val right = Seq((1L, ts(10), "exact")).toDF("k", "rts", "tag")
    val out = AsOfJoin.asOfNative(left, right, Seq("k"), "lts", "rts", Seq("tag"))
    assert(out.select("asof_tag").head().getString(0) === "exact")
    compare(left, right, Seq("k"), "lts", "rts", Seq("tag"))
  }

  test("differential: NULL field in the matched right row stays NULL") {
    import spark.implicits._
    val left = Seq((1L, ts(30))).toDF("k", "lts")
    val right = Seq(
      (1L, ts(10), Some("old"), Some(1.0)),
      (1L, ts(20), None: Option[String], Some(2.0))).toDF("k", "rts", "tag", "v")
    val row = AsOfJoin.asOfNative(left, right, Seq("k"), "lts", "rts", Seq("tag", "v"))
      .select("asof_tag", "asof_v").head()
    // the most recent right row has tag = NULL — it must NOT be
    // back-filled from the older row
    assert(row.isNullAt(0))
    assert(row.getDouble(1) === 2.0)
    compare(left, right, Seq("k"), "lts", "rts", Seq("tag", "v"))
  }

  test("differential: empty right side yields all-NULL carries") {
    import spark.implicits._
    val left = Seq((1L, ts(1)), (2L, ts(2))).toDF("k", "lts")
    val right = Seq.empty[(Long, Timestamp, String)].toDF("k", "rts", "tag")
    val out = AsOfJoin.asOfNative(left, right, Seq("k"), "lts", "rts", Seq("tag"))
    assert(out.count() === 2)
    assert(out.filter(col("asof_tag").isNotNull).count() === 0)
    compare(left, right, Seq("k"), "lts", "rts", Seq("tag"))
  }

  test("differential: composite keys") {
    import spark.implicits._
    val left = Seq((1L, "x", ts(10)), (1L, "y", ts(10)), (2L, "x", ts(10)))
      .toDF("k1", "k2", "lts")
    val right = Seq((1L, "x", ts(5), 100.0), (1L, "y", ts(20), 200.0),
      (2L, "x", ts(9), 300.0)).toDF("k1", "k2", "rts", "v")
    compare(left, right, Seq("k1", "k2"), "lts", "rts", Seq("v"))
  }

  test("differential: self-join from one source (duplicate exprIds)") {
    import spark.implicits._
    val events = Seq(
      (1L, ts(10), "click", 1.0), (1L, ts(12), "purchase", 5.0),
      (1L, ts(15), "click", 2.0), (2L, ts(8), "click", 3.0))
      .toDF("user_id", "ts", "event_type", "value")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("lts"), col("value"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("rts"), col("value").as("pv"))
    compare(clicks, purchases, Seq("user_id"), "lts", "rts", Seq("pv"))
  }

  test("randomized differential across partition layouts (seeded)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42L)
    (1 to 3).foreach { _ =>
      val left = Seq.fill(300)((rnd.nextInt(12).toLong, ts(rnd.nextInt(1000))))
        .toDF("k", "lts").repartition(7)
      val rightDf = Seq.fill(200)((rnd.nextInt(12).toLong, ts(rnd.nextInt(1000)), rnd.nextDouble()))
        .groupBy(t => (t._1, t._2)).map(_._2.head).toSeq // unique (k, rts)
        .toDF("k", "rts", "v").repartition(5)
      compare(left, rightDf, Seq("k"), "lts", "rts", Seq("v"))
    }
  }

  test("native plan has no window exchange — two clustering exchanges + sorts") {
    import spark.implicits._
    val left = Seq((1L, ts(10))).toDF("k", "lts")
    val right = Seq((1L, ts(5), 1.0)).toDF("k", "rts", "v")
    val native = AsOfJoin.asOfNative(left, right, Seq("k"), "lts", "rts", Seq("v"))
    val plan = native.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoinExec") || plan.contains("AsOfJoin"),
      s"native operator missing from plan:\n$plan")
    assert(!plan.contains("Window"), s"window machinery leaked into native plan:\n$plan")
  }

  test("node stats propagate left cardinality, not a |L|x|R| join product") {
    import spark.implicits._
    // the default binary-node estimate multiplies child sizes — a small
    // as-of result would be estimated at TB scale and never broadcast
    // by a downstream join
    val left = (1 to 200).map(i => (i.toLong % 4, ts(i))).toDF("k", "lts")
    val right = (1 to 200).map(i => (i.toLong % 4, ts(i), i * 1.0))
      .toDF("k", "rts", "v")
    val native = AsOfJoin.asOfNative(left, right, Seq("k"), "lts", "rts", Seq("v"))
    val node = native.queryExecution.optimizedPlan.collectFirst {
      case n: graft.plans.AsOfJoinNode => n
    }.getOrElse(fail("AsOfJoinNode missing from optimized plan"))
    val product = node.left.stats.sizeInBytes * node.right.stats.sizeInBytes
    assert(node.stats.sizeInBytes < node.left.stats.sizeInBytes * 3,
      s"as-of stats ${node.stats.sizeInBytes} not propagated from left " +
        s"${node.left.stats.sizeInBytes}")
    assert(node.stats.sizeInBytes < product,
      "as-of stats degenerated to the join-product default")
    // end-to-end consequence: the small as-of result broadcasts into a
    // downstream equi-join instead of forcing a shuffle join
    val big = (1 to 5000).map(i => (i.toLong % 4, s"row$i")).toDF("k", "pay")
    val joined = big.join(native.select(col("k"), col("asof_v")).distinct(), Seq("k"))
    val jp = joined.queryExecution.executedPlan.toString
    assert(jp.contains("BroadcastHashJoin"),
      s"small as-of result did not broadcast:\n$jp")
  }
}
