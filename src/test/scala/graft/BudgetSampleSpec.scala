package graft

import graft.operators.BudgetSample
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget curation: the bucket-cutoff construction must be
  * bit-identical to the single-reducer running-total formulation.
  */
class BudgetSampleSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, 100L, 1.0), (2L, 200L, 1.0), (3L, 300L, 0.7),
      (4L, 150L, 0.7), (5L, 50L, 0.4), (6L, 500L, 0.1),
      (7L, 80L, 0.7)
    ).toDF("id", "tokens", "q")
  }

  private def reference(budget: Long): Set[Long] =
    docs.withColumn("_cum", sum(col("tokens")).over(
        Window.orderBy(col("q").desc, col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("_cum") <= budget)
      .collect().map(_.getAs[Long]("id")).toSet

  test("budget cutoff equals the global running-total formulation") {
    // boundaries chosen to land: inside the 0.7 bucket, exactly on a
    // bucket edge, below the first doc, and beyond the whole corpus
    Seq(0L, 99L, 100L, 300L, 550L, 600L, 700L, 1000L, 1379L, 1380L, 5000L)
      .foreach { b =>
        val got = BudgetSample.fillTokenBudget(docs, "tokens", "q", "id", b)
          .collect().map(_.getAs[Long]("id")).toSet
        assert(got === reference(b), s"budget=$b")
      }
  }

  test("boundary bucket takes ids in order, not the biggest fit") {
    // budget 300+600=... full 1.0 bucket = 300; remaining 400 within the
    // 0.7 bucket (ids 3,4,7 with 300,150,80): id 3 (cum 300) and id 4
    // (cum 450 > 400) -> only id 3 despite 150+80 fitting better.
    val got = BudgetSample.fillTokenBudget(docs, "tokens", "q", "id", 700L)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(got === Set(1L, 2L, 3L))
  }
}
