package graft

import graft.operators.Skyline
import org.apache.spark.sql.functions._

/** Sort-sweep skyline: brute-force dominance differential on an
  * anti-correlated fixture, tie semantics, and the no-all-pairs plan.
  */
class SkylineSpec extends SparkSpec {

  test("matches brute-force dominance on anti-correlated data") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    // a (min x, max y) frontier is rich when y RISES with x: paying
    // more x buys more y, so many tradeoff points are undominated
    val pts = (1 to 400).map { i =>
      val x = rnd.nextInt(100)
      (i.toLong, x.toLong, (x * 10 + rnd.nextInt(10)).toLong)
    }
    val df = pts.toDF("id", "x", "y")
    val got = Skyline.skyline2d(df, "x", "y")
      .select("id").collect().map(_.getLong(0)).toSet
    val expect = pts.filter { case (_, x, y) =>
      !pts.exists { case (_, qx, qy) =>
        qx <= x && qy >= y && (qx < x || qy > y)
      }
    }.map(_._1).toSet
    assert(got === expect)
    assert(expect.size > 5, s"frontier too thin (${expect.size}) to be a real test")
  }

  test("exact (x, y) twins all survive; dominated twins all die") {
    import spark.implicits._
    val df = Seq(
      (1L, 10L, 50L), (2L, 10L, 50L), // frontier twins
      (3L, 10L, 40L),                 // same x, lower y -> dominated
      (4L, 5L, 60L),                  // strictly better point
      (5L, 20L, 70L)).toDF("id", "x", "y")
    val got = Skyline.skyline2d(df, "x", "y")
      .select("id").collect().map(_.getLong(0)).toSet
    // 4 dominates 1,2,3 (cheaper AND higher); 5 survives on y
    assert(got === Set(4L, 5L))
    val noDom = Seq((1L, 10L, 50L), (2L, 10L, 50L)).toDF("id", "x", "y")
    assert(Skyline.skyline2d(noDom, "x", "y").count() === 2)
  }

  test("plan: domain-sized window + broadcast semi-join, no row-row dominance join") {
    import spark.implicits._
    val df = Seq((1L, 1L, 1L)).toDF("id", "x", "y")
    val plan = Skyline.skyline2d(df, "x", "y")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(plan.contains("BroadcastHashJoin"))
  }
}
