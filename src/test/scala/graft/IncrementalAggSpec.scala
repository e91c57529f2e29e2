package graft

import graft.operators.IncrementalAgg
import org.apache.spark.sql.functions._

/** Delta-maintained additive aggregates: merge algebra vs from-scratch
  * recompute, disjoint/overlapping key handling, signed (retraction)
  * deltas.
  */
class IncrementalAggSpec extends SparkSpec {

  test("merge(base, delta) equals recompute over base union delta") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 2000).map { i =>
      (rnd.nextInt(50).toLong, BigDecimal(rnd.nextInt(100000)) / 100)
    }
    val (baseRows, deltaRows) = rows.splitAt(1700)
    def agg(r: Seq[(Long, BigDecimal)]) =
      r.toDF("k", "v").withColumn("v", col("v").cast("decimal(18,2)"))
        .groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
    val merged = IncrementalAgg.merge(
        agg(baseRows), agg(deltaRows), Seq("k"), Seq("n", "s"))
      .select(col("k"), col("n").cast("long"),
        col("s").cast("decimal(28,2)"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2)))
      .toSet
    val full = agg(rows)
      .select(col("k"), col("n").cast("long"),
        col("s").cast("decimal(28,2)"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2)))
      .toSet
    assert(merged === full)
  }

  test("keys present on only one side survive with the other side as zero") {
    import spark.implicits._
    val base = Seq((1L, 2L, 10L), (2L, 1L, 5L)).toDF("k", "n", "s")
    val delta = Seq((2L, 1L, 7L), (3L, 4L, 100L)).toDF("k", "n", "s")
    val got = IncrementalAgg.merge(base, delta, Seq("k"), Seq("n", "s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 2L, 10L), (2L, 2L, 12L), (3L, 4L, 100L)))
  }

  test("signed deltas retract: counts and sums can go to zero") {
    import spark.implicits._
    val base = Seq((1L, 3L, 30L)).toDF("k", "n", "s")
    val retract = Seq((1L, -3L, -30L)).toDF("k", "n", "s")
    val got = IncrementalAgg.merge(base, retract, Seq("k"), Seq("n", "s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 0L, 0L)))
  }
}
