package graft

import graft.operators.Expectations
import graft.operators.Expectations._
import org.apache.spark.sql.functions._

/** Declarative data-quality suite: metric math, verdicts, and the
  * one-scan plan claim.
  */
class ExpectationsSpec extends SparkSpec {

  private def df = {
    import spark.implicits._
    Seq(
      (1L, Some("alpha"), 10L, "en"),
      (2L, Some("beta"), 20L, "en"),
      (3L, None, 200L, "xx"),
      (3L, Some("gamma"), 30L, "de")
    ).toDF("id", "name", "size", "lang")
  }

  private def run(checks: Seq[Check]): Map[String, (Double, Boolean)] =
    Expectations.validate(df, checks).collect()
      .map(r => r.getAs[String]("constraint_name") ->
        ((r.getAs[Double]("metric"), r.getAs[Boolean]("passed")))).toMap

  test("metrics and verdicts per constraint kind") {
    val out = run(Seq(
      RowCountAtLeast(3),
      Unique("id"),
      Complete("name", minRatio = 0.9),
      InRange("size", 1, 100),
      InSet("lang", Seq("en", "de"), minRatio = 0.7),
      MatchesPattern("name", "^[a-z]+$", minRatio = 0.7),
      Satisfies("consistent(size)", "size", col("size") < col("id") * 50)))
    assert(out("row_count") === ((4.0, true)))
    assert(out("unique(id)") === ((0.75, false))) // 3 distinct / 4 rows
    assert(out("complete(name)") === ((0.75, false))) // under 0.9
    assert(out("in_range(size,1,100)") === ((0.75, false))) // 200 out of range
    assert(out("in_set(lang)") === ((0.75, true))) // xx outside, >= 0.7
    // null name fails rlike -> 3/4 matched, >= 0.7 passes
    assert(out("matches(name)") === ((0.75, true)))
    assert(out("consistent(size)") === ((0.75, false))) // 200 >= 3*50
  }

  test("unique_approx tracks exact uniqueness at tiny cardinality") {
    val out = run(Seq(UniqueApprox("id", minRatio = 0.7)))
    assert(out("unique_approx(id)")._1 === 0.75)
    assert(out("unique_approx(id)")._2)
  }

  test("row-level-only suite folds into ONE scan; exact Unique adds the distinct plane") {
    def scans(checks: Seq[Check]) =
      Expectations.validate(df, checks).queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
      }.size
    val rowLevel = Seq(RowCountAtLeast(1), Complete("name"),
      InRange("size", 1, 100), InSet("lang", Seq("en")),
      MatchesPattern("name", "a"), UniqueApprox("id"))
    assert(scans(rowLevel) === 1)
    assert(scans(rowLevel :+ Unique("id")) === 1) // still one scan (Expand, not rescan)
  }

  test("ordering is by constraint name and stable") {
    val names = Expectations.validate(df,
      Seq(Unique("id"), RowCountAtLeast(1), Complete("name")))
      .collect().map(_.getAs[String]("constraint_name")).toSeq
    assert(names === names.sorted)
  }

  test("two InRange bands on one column report distinct, self-describing rows") {
    val out = Expectations.validate(df, Seq(
        InRange("size", 1, 100),              // sanity band, strict
        InRange("size", 1, 15, minRatio = 0.5), // distribution band, tolerant
        Labeled("lowercase(name)", MatchesPattern("name", "^[a-z]+$")),
        MatchesPattern("name", "^[a-z]+$", minRatio = 0.7)))
      .collect()
    val names = out.map(_.getAs[String]("constraint_name")).toSeq
    assert(names === Seq(
      "in_range(size,1,100)", "in_range(size,1,15)",
      "lowercase(name)", "matches(name)"), "parameterized/labeled names")
    assert(names.distinct === names, "no colliding constraint names")
    assert(names === names.sorted, "deterministic report order")
    val bands = out.filter(_.getAs[String]("constraint_name").startsWith("in_range"))
      .map(r => (r.getAs[String]("constraint_name"), r.getAs[Double]("metric"),
        r.getAs[Boolean]("passed"))).toSeq
    // 4 rows, sizes 10/20/30/200: [1,100] covers 3; [1,15] covers 1
    assert(bands === Seq(
      ("in_range(size,1,100)", 0.75, false),
      ("in_range(size,1,15)", 0.25, false)))
    // the #k fallback still catches residual exact duplicates
    val dup = Expectations.validate(df,
        Seq(InRange("size", 1, 100), InRange("size", 1, 100, minRatio = 0.5)))
      .collect().map(_.getAs[String]("constraint_name")).toSeq
    assert(dup === Seq("in_range(size,1,100)", "in_range(size,1,100)#2"))
  }
}
