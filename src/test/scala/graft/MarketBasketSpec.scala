package graft

import graft.operators.MarketBasket
import org.apache.spark.sql.functions._

/** A-priori pair pass: hand-checked supports, duplicate-line and
  * basket-cap semantics, and the no-cartesian plan.
  */
class MarketBasketSpec extends SparkSpec {

  test("hand-checked joint and individual supports") {
    import spark.implicits._
    // baskets: {1,2,3}, {1,2}, {2,3}, {1,2}
    val df = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),
      (11L, 1L), (11L, 2L),
      (12L, 2L), (12L, 3L),
      (13L, 1L), (13L, 2L)).toDF("o", "p")
    val r = MarketBasket.pairCounts(df, "o", "p", minSupport = 2L)
      .orderBy("item_a", "item_b").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))
    // (1,2) appears 3x; (2,3) 2x; (1,3) only once -> filtered
    assert(r.toSeq === Seq((1L, 2L, 3L, 3L, 4L), (2L, 3L, 2L, 4L, 2L)))
  }

  test("duplicate lines collapse; oversized baskets drop entirely") {
    import spark.implicits._
    val df = Seq(
      (1L, 5L), (1L, 5L), (1L, 6L),   // dup line: pair (5,6) once
      (2L, 5L), (2L, 6L),
      // basket 3 exceeds cap 3 -> excluded from pairs AND supports
      (3L, 5L), (3L, 6L), (3L, 7L), (3L, 8L)).toDF("o", "p")
    val r = MarketBasket.pairCounts(df, "o", "p",
        minSupport = 2L, maxBasket = 3)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4)))
    assert(r.toSeq === Seq((5L, 6L, 2L, 2L, 2L)))
  }

  test("plan: keyed equi-joins and hash aggregates, no cartesian") {
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("o", "p")
    val plan = MarketBasket.pairCounts(df, "o", "p")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
