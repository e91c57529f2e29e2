package graft

import graft.operators.{Histogram, Profiling}
import org.apache.spark.sql.functions._

/** One-scan profiling and equi-width histogram semantics. */
class ProfilingSpec extends SparkSpec {

  private def df = {
    import spark.implicits._
    Seq(
      (1L, Some("x"), 10.0),
      (2L, None, 20.0),
      (3L, Some("y"), 20.0),
      (4L, Some("x"), 40.0)
    ).toDF("id", "tag", "v")
  }

  test("profile: per-column rows/nulls/distinct/min/max in one pass") {
    val p = Profiling.profile(df, Seq("id", "tag", "v")).collect()
      .map(r => r.getAs[String]("col_name") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_nulls"),
          r.getAs[Long]("n_distinct"), r.getAs[String]("min_val"),
          r.getAs[String]("max_val")))).toMap
    assert(p("id") === ((4L, 0L, 4L, "1", "4")))
    assert(p("tag") === ((4L, 1L, 2L, "x", "y")))
    assert(p("v") === ((4L, 0L, 3L, "10.0", "40.0")))
  }

  test("profile scan count: 2 for exact distinct, 1 for approx") {
    def scans(exact: Boolean) = Profiling
      .profile(df, Seq("id", "tag", "v"), exactDistinct = exact)
      .queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
      }
    assert(scans(exact = true).size === 2)
    assert(scans(exact = false).size === 1)
  }

  test("approx mode returns exact counts on tiny-cardinality columns") {
    val p = Profiling.profile(df, Seq("id", "tag"), exactDistinct = false)
      .collect().map(r => r.getAs[String]("col_name") ->
        r.getAs[Long]("n_distinct")).toMap
    // HLL++ is exact at these cardinalities (dense register regime).
    assert(p === Map("id" -> 4L, "tag" -> 2L))
  }

  test("histogram: equi-width buckets, top value closed into last bucket") {
    val h = Histogram.equiWidth(df, "v", buckets = 3).collect()
      .map(r => r.getAs[Long]("bucket_id") ->
        ((r.getAs[Double]("bucket_lo"), r.getAs[Double]("bucket_hi"),
          r.getAs[Long]("n")))).toMap
    // lo=10, hi=40, width=10: 10.0->b0, 20.0 x2 ->b1, 40.0 -> b2 (closed top)
    assert(h(0L) === ((10.0, 20.0, 1L)))
    assert(h(1L) === ((20.0, 30.0, 2L)))
    assert(h(2L) === ((30.0, 40.0, 1L)))
  }

  test("histogram: constant column collapses to one bucket, no div-by-zero") {
    import spark.implicits._
    val c = Seq(5.0, 5.0, 5.0).toDF("v")
    val h = Histogram.equiWidth(c, "v", buckets = 4).collect()
    assert(h.length === 1)
    assert(h.head.getAs[Long]("bucket_id") === 0L)
    assert(h.head.getAs[Long]("n") === 3L)
  }

  test("distributionDrift: hand-computed PSI terms, one-sided bucket clamps") {
    import spark.implicits._
    // base: bucket0 x3, bucket1 x1; current: bucket0 x2, bucket2 x2.
    val base = Seq(5L, 8L, 9L, 15L).toDF("v")
    val cur = Seq(3L, 7L, 25L, 27L).toDF("v")
    val got = Profiling.distributionDrift(base, cur, "v", bucketWidth = 10L)
      .orderBy("bucket").collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n_base"),
        r.getAs[Long]("n_cur"), r.getAs[Double]("psi_term")))
    def term(p: Double, q: Double): Double = {
      val (pp, qq) = (math.max(p, 1e-6), math.max(q, 1e-6))
      math.rint((pp - qq) * math.log(pp / qq) * 1e6) / 1e6
    }
    assert(got.toSeq === Seq(
      (0L, 3L, 2L, term(0.75, 0.5)),
      (1L, 1L, 0L, term(0.25, 0.0)), // current side missing -> epsilon
      (2L, 0L, 2L, term(0.0, 0.5)))) // base side missing -> epsilon
    // PSI is symmetric-positive: every term is >= 0 by construction.
    assert(got.forall(_._4 >= 0.0))
  }

  test("madOutliers: hand-computed median/MAD, planted spike flagged") {
    import spark.implicits._
    // Group g: values 10,12,14,16,18 -> med 14 (percentile_disc lower-
    // biased: first value at cume_dist >= 0.5), devs 4,2,0,2,4 -> mad 2.
    // 1000 deviates by 986 > 5*2 -> flagged; nothing else is.
    val df = (Seq(10L, 12L, 14L, 16L, 18L, 1000L).map(("g", _)) ++
      Seq(5L, 5L, 5L).map(("h", _))).toDF("grp", "v")
    val got = Profiling.madOutliers(df, "grp", "v", k = 5)
      .select("grp", "v", "med", "mad", "is_outlier")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getInt(4))).toSet
    // With the spike included the 6-value median is still 14 (3rd of 6
    // at cd 0.5) and mad is 2 (devs 0,2,2,4,4,986 -> 3rd at cd 0.5).
    assert(got.contains(("g", 1000L, 14L, 2L, 1)))
    assert(got.filter(_._1 == "g").count(_._5 == 1) === 1)
    // Constant group: mad 0 -> only non-median values would flag; none exist.
    assert(got.filter(_._1 == "h").forall(t => t._3 == 5L && t._4 == 0L && t._5 == 0))
  }

  test("madOutliers: null-group rows are scored, never deleted") {
    import spark.implicits._
    // The StatMoments.zscore rule: groupBy keeps the null-key group, so
    // a plain equi-join lookup would silently delete its rows. All four
    // rows must come back, and the null group flags its own spike.
    val df = Seq((Some("g"), 5L), (None, 10L), (None, 12L), (None, 500L))
      .toDF("grp", "v")
    val got = Profiling.madOutliers(df, "grp", "v", k = 5).collect()
    assert(got.length === 4, "no row may be dropped by the stats lookup")
    val nullRows = got.filter(_.isNullAt(0))
    assert(nullRows.length === 3)
    assert(nullRows.count(_.getAs[Int]("is_outlier") == 1) === 1)
  }

  test("distributionDrift: buckets stay exact above 2^53") {
    import spark.implicits._
    // Adjacent width-1000 buckets at a magnitude where long->double
    // conversion loses the low bits: double division would merge them.
    val a = (1L << 60) - ((1L << 60) % 1000L) // exact bucket boundary
    val base = Seq(a, a + 1000L).toDF("v")
    val cur = Seq(a, a + 1000L).toDF("v")
    val got = Profiling.distributionDrift(base, cur, "v", 1000L)
    assert(got.count() === 2, "adjacent huge-magnitude buckets must not merge")
    assert(got.agg(org.apache.spark.sql.functions.sum("psi_term"))
      .head().getDouble(0) === 0.0)
  }

  test("ksTest: hand-computed integer D argmax and final division") {
    import spark.implicits._
    // A = {1,2,3}, B = {2,4}. Cumulative (ca,cb) over v: (1,0) (2,1)
    // (3,1) (3,2); |cumA*nB - cumB*nA| = 2, 1, 3, 0 -> d_num 3,
    // D = 3/(3*2) = 0.5.
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 2L), ("b", 4L))
      .toDF("g", "v")
    val r = Profiling.ksTest(df, "v", $"g" === "a", $"g" === "b").head()
    assert((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
      r.getAs[Long]("d_num"), r.getAs[Double]("ks_d")) === ((3L, 2L, 3L, 0.5)))
  }

  test("ksTest: identical distributions give D = 0") {
    import spark.implicits._
    val df = Seq(("a", 5L), ("a", 9L), ("b", 5L), ("b", 9L)).toDF("g", "v")
    val r = Profiling.ksTest(df, "v", $"g" === "a", $"g" === "b").head()
    assert(r.getAs[Long]("d_num") === 0L)
    assert(r.getAs[Double]("ks_d") === 0.0)
  }

  test("benford: digit from decimal rendering, sub-1 rows excluded") {
    import spark.implicits._
    // digits: 1.0 -> 1, 1.5 -> 1, 19.0 -> 1, 2.3 -> 2; 0.5 and -3.0
    // are below 1 and must not reach the digit cast.
    val df = Seq(1.0, 1.5, 19.0, 2.3, 0.5, -3.0).toDF("amt")
    val rows = Profiling.benford(df, "amt").collect()
      .map(r => r.getAs[Int]("digit") ->
        ((r.getAs[Long]("n_obs"), r.getAs[Double]("obs_share"),
          r.getAs[Double]("exp_share"), r.getAs[Double]("chi2_term"))))
      .toMap
    assert(rows.keySet === Set(1, 2))
    def chi(n: Long, t: Long, e: Double): Double = {
      val d = n.toDouble - t * e
      math.rint(d * d / (t * e) * 1e6) / 1e6
    }
    assert(rows(1) === ((3L, 0.75, 0.301030, chi(3L, 4L, 0.301030))))
    assert(rows(2) === ((1L, 0.25, 0.176091, chi(1L, 4L, 0.176091))))
  }

  test("kAnonymity: class sizes and at-risk flags") {
    import spark.implicits._
    val df = Seq(("US", "A"), ("US", "A"), ("US", "A"), ("US", "B"),
      ("DE", "A")).toDF("nation", "seg")
    val got = Profiling.kAnonymity(df, Seq("nation", "seg"), k = 2)
      .collect().map(r => (r.getAs[String]("nation"), r.getAs[String]("seg"),
        r.getAs[Long]("class_size"), r.getAs[Int]("at_risk"))).toSet
    assert(got === Set(("US", "A", 3L, 0), ("US", "B", 1L, 1),
      ("DE", "A", 1L, 1)))
    intercept[IllegalArgumentException] {
      Profiling.kAnonymity(df, Seq("nation"), k = 1)
    }
  }

  test("madOutliers robustness: outliers cannot unflag themselves") {
    import spark.implicits._
    // Mean/stddev z-scores famously let a big-enough spike inflate the
    // stddev until it unflags itself; median/MAD must not. 40 inliers
    // around 100 + 8 huge spikes: all 8 flagged regardless of magnitude.
    val rnd = new scala.util.Random(5)
    val inliers = (1 to 40).map(_ => ("g", 95L + rnd.nextInt(11)))
    val spikes = (1 to 8).map(i => ("g", 1000000L * i))
    val df = (inliers ++ spikes).toDF("grp", "v")
    val flagged = Profiling.madOutliers(df, "grp", "v", k = 5)
      .filter($"is_outlier" === 1).select("v")
      .collect().map(_.getLong(0)).toSet
    assert(spikes.map(_._2).toSet.subsetOf(flagged))
    assert(flagged.forall(_ >= 1000000L))
  }

  test("histogram excludes null values instead of inflating the top bucket") {
    import spark.implicits._
    val df = Seq(Some(0.0), Some(5.0), Some(10.0), None, None).toDF("v")
    val h = Histogram.equiWidth(df, "v", buckets = 2).collect()
    assert(h.map(_.getLong(3)).sum === 3, "nulls must not be counted")
  }
}
