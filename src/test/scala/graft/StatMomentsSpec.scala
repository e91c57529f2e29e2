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

  test("zscore: hand-computed per group, degenerate groups score 0.0") {
    import spark.implicits._
    // group a: values 10, 20, 30 -> mean 20, sample sd 10.
    // group b: singleton (n < 2); group c: constant (zero variance).
    val df = Seq(
      ("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 30L),
      ("b", 4L, 7L),
      ("c", 5L, 9L), ("c", 6L, 9L)
    ).toDF("g", "id", "v")
    val got = StatMoments.zscore(df, "g", "v")
      .orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Double]("zscore")))
    assert(got.toSeq === Seq(
      (1L, -1.0), (2L, 0.0), (3L, 1.0),
      (4L, 0.0), (5L, 0.0), (6L, 0.0)))
    // Partition-order stable: exact decimal sums, not streaming moments.
    val re = StatMoments.zscore(df.repartition(4), "g", "v")
      .orderBy("id").collect().map(_.getAs[Double]("zscore"))
    assert(re.toSeq === got.map(_._2).toSeq)
  }
}
