package graft

import graft.operators.StatMoments
import org.apache.spark.sql.functions._

/** Exact-power-sum moments: agreement with Spark's built-in estimators
  * (within float tolerance — the built-ins are partition-order dependent,
  * which is WHY StatMoments exists), stability under repartitioning, and
  * hand-checked small cases.
  */
class StatMomentsSpec extends SparkSpec {

  private def df = {
    import spark.implicits._
    (1 to 200).map { i =>
      val g = if (i % 2 == 0) "a" else "b"
      (g, (i % 17).toDouble, i.toDouble * 0.5 + (i % 7))
    }.toDF("g", "x", "y")
  }

  test("matches built-in corr/covar/stddev within float tolerance") {
    val ours = StatMoments.moments(df, Seq(col("g")), col("x"), col("y"))
      .orderBy("g").collect()
    val builtin = df.groupBy("g")
      .agg(corr("x", "y").as("c"), covar_samp("x", "y").as("cv"),
        stddev_samp("x").as("sd"), var_samp("x").as("v"), avg("x").as("m"))
      .orderBy("g").collect()
    ours.zip(builtin).foreach { case (o, b) =>
      assert(math.abs(o.getAs[Double]("corr_xy") - b.getAs[Double]("c")) < 1e-9)
      assert(math.abs(o.getAs[Double]("covar_samp_xy") - b.getAs[Double]("cv")) < 1e-9)
      assert(math.abs(o.getAs[Double]("stddev_samp_x") - b.getAs[Double]("sd")) < 1e-9)
      assert(math.abs(o.getAs[Double]("var_samp_x") - b.getAs[Double]("v")) < 1e-9)
      assert(math.abs(o.getAs[Double]("mean_x") - b.getAs[Double]("m")) < 1e-12)
    }
  }

  test("bit-identical across repartitioning (the property built-ins lack)") {
    val a = StatMoments.moments(df.repartition(1), Seq(col("g")), col("x"), col("y"))
      .orderBy("g").collect()
    val b = StatMoments.moments(df.repartition(7, col("y")), Seq(col("g")), col("x"), col("y"))
      .orderBy("g").collect()
    a.zip(b).foreach { case (ra, rb) =>
      Seq("mean_x", "var_samp_x", "stddev_samp_x", "covar_samp_xy",
        "corr_xy", "regr_slope", "regr_intercept").foreach { c =>
        assert(ra.getAs[Double](c) == rb.getAs[Double](c),
          s"$c differs across partitionings")
      }
    }
  }

  test("hand-checked: perfectly correlated line has corr 1 and exact slope") {
    import spark.implicits._
    val line = Seq.tabulate(50)(i => ("g", i.toDouble, 3.0 * i + 2)).toDF("g", "x", "y")
    val r = StatMoments.moments(line, Seq(col("g")), col("x"), col("y")).head()
    assert(math.abs(r.getAs[Double]("corr_xy") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("regr_slope") - 3.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("regr_intercept") - 2.0) < 1e-9)
    assert(r.getAs[Long]("n_rows") === 50L)
  }
}
