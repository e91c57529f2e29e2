package graft

import graft.operators.Reshape
import org.apache.spark.sql.functions._

class ReshapeSpec extends SparkSpec {

  test("dynamic pivot discovers values, sorts columns, ignores NULL keys") {
    import spark.implicits._
    val df = Seq(
      ("a", Some("y"), 1), ("a", Some("x"), 2), ("b", Some("x"), 3),
      ("b", None, 99) // NULL pivot key excluded
    ).toDF("g", "p", "v")
    val out = Reshape.pivotDynamic(df, Seq("g"), "p", sum(col("v")), maxValues = 10)
      .orderBy("g")
    assert(out.columns.toSeq === Seq("g", "x", "y")) // deterministic order
    val rows = out.collect()
    assert(rows(0).getAs[Long]("x") === 2L && rows(0).getAs[Long]("y") === 1L)
    assert(rows(1).getAs[Long]("x") === 3L && rows(1).getAs[Any]("y") === null)
  }

  test("dynamic pivot aborts past the cap instead of widening the schema") {
    import spark.implicits._
    val df = (1 to 50).map(i => ("g", s"val$i", i)).toDF("g", "p", "v")
    val e = intercept[IllegalArgumentException] {
      Reshape.pivotDynamic(df, Seq("g"), "p", sum(col("v")), maxValues = 20)
    }
    assert(e.getMessage.contains("more than 20"))
    // at exactly the cap it proceeds
    val ok = Reshape.pivotDynamic(df, Seq("g"), "p", sum(col("v")), maxValues = 50)
    assert(ok.columns.length === 51)
  }
}
