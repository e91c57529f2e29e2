package graft

import graft.functions.{GraftFunctions, MgBuffer}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Misra–Gries invariants, checked against exact counts:
  *   est <= true <= est + spilled for every emitted item, and every item
  * with true count > spilled must be emitted. These hold for ANY update
  * and merge order, so the distributed aggregate is checked over multiple
  * partition layouts.
  */
class HeavyHittersSpec extends SparkSpec {

  private def runAgg(items: Seq[String], k: Int, parts: Int): (Long, Map[String, Long]) = {
    import spark.implicits._
    val row = items.toDF("w").repartition(parts)
      .agg(GraftFunctions.graftHeavyHitters(col("w"), k).as("hh"))
      .select("hh.spilled", "hh.items").head()
    val spilled = row.getLong(0)
    val est = row.getSeq[Row](1).map(r => r.getString(0) -> r.getLong(1)).toMap
    (spilled, est)
  }

  private def checkInvariants(items: Seq[String], k: Int, parts: Int): Unit = {
    val (spilled, est) = runAgg(items, k, parts)
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(est.size <= k)
    est.foreach { case (item, e) =>
      val ex = exact(item)
      assert(e <= ex, s"overestimate for $item: est=$e exact=$ex")
      assert(ex <= e + spilled, s"envelope broken for $item: est=$e exact=$ex spilled=$spilled")
    }
    exact.foreach { case (item, ex) =>
      if (ex > spilled)
        assert(est.contains(item), s"guaranteed-heavy item $item (cnt=$ex > spilled=$spilled) missing")
    }
    // classic deterministic bound
    assert(spilled <= items.size / (k + 1) + 1)
  }

  test("zipf-ish stream: envelope + completeness across partition layouts") {
    val items = (1 to 5000).map(i => s"w${i % (i % 37 + 1)}")
    for (parts <- Seq(1, 3, 16)) checkInvariants(items, k = 8, parts)
  }

  test("uniform stream (no true heavy hitter) stays sound") {
    val items = (1 to 3000).map(i => s"u${i % 500}")
    checkInvariants(items, k = 8, parts = 8)
  }

  test("k larger than distinct items is exact with spilled = 0") {
    val items = Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(20)("c")
    val (spilled, est) = runAgg(items, k = 16, parts = 4)
    assert(spilled === 0L)
    assert(est === Map("a" -> 50L, "b" -> 30L, "c" -> 20L))
  }

  test("randomized streams never break the invariants (seeded)") {
    val rnd = new scala.util.Random(20260812L)
    (1 to 5).foreach { _ =>
      val items = Seq.fill(400) {
        rnd.nextInt(11) match {
          case n if n < 5 => "hot"
          case n if n < 8 => "warm"
          case n if n < 10 => Seq("c", "d", "e")(rnd.nextInt(3))
          case _ => "r" + rnd.nextInt(200)
        }
      }
      checkInvariants(items, k = 4, parts = 4)
    }
  }

  test("merge shrink keeps only strictly-above-cut survivors (driver-level)") {
    val a = new MgBuffer(2)
    Seq("x", "x", "x", "y", "y", "z").foreach(a.add(_, 1L)) // z misses, decrements
    val b = new MgBuffer(2)
    Seq("p", "p", "x").foreach(b.add(_, 1L))
    a.spilled += b.spilled
    b.counts.forEach((k0, v) => a.counts.merge(k0, v, (p, q) => p + q))
    a.shrinkTo(2)
    assert(a.counts.size <= 2)
  }

  test("SQL surface: graft_heavyhitters via extensions") {
    import spark.implicits._
    Seq.fill(30)("a").++(Seq.fill(5)("b")).toDF("w").createOrReplaceTempView("hh_in")
    val row = spark.sql(
      "SELECT graft_heavyhitters(w, 4) AS hh FROM hh_in").select("hh.items").head()
    val est = row.getSeq[Row](0).map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("a") === 30L)
    assert(est("b") === 5L)
  }
}
