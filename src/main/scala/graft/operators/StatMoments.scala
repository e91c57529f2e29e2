package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed first/second-moment statistics — mean, sample variance /
  * stddev / covariance, Pearson correlation, least-squares slope and
  * intercept — computed from EXACT decimal power sums instead of
  * streaming co-moment updates.
  *
  * Why not `corr()` / `covar_samp()` directly: Spark's built-ins merge
  * per-partition co-moment states in partition order, so the final ulp
  * depends on partitioning and no external engine reproduces it
  * bit-for-bit. Summing x, y, x², y², xy as wide decimals is exact and
  * order-insensitive (each map-side partial is five decimals regardless
  * of row count — fully combinable, one shuffle of O(groups) rows), and
  * deriving the moments from those sums with one fixed IEEE-double
  * formula gives results any engine reproduces exactly from the same
  * rows. That determinism is what lets a correctness gate hold at
  * 100 TB, where partition counts and merge orders are never stable
  * run-to-run.
  *
  * Numerical note: the textbook n·Σxx − (Σx)² form is catastrophic for
  * FLOAT sums but benign here because the sums themselves are exact
  * decimals; cancellation error enters only in the final few double
  * operations, the same place every engine pays it identically.
  */
object StatMoments {

  // Declared input contract (the benford discipline): values EXACT at
  // two decimals — money, counts, lengths — with |x| < 10^16. The width
  // is NOT widened casually: (18,2) operands give (37,4) products that
  // still fit DECIMAL's 38-digit cap exactly, while wider operands
  // would overflow the product precision and Spark silently SHRINKS THE
  // SCALE (rounding every x², xy) to compensate. Inputs with more
  // fractional precision than 2 digits quantize at the cast — callers
  // with micro-scale data must pre-scale to an exact 2-decimal domain;
  // under default ANSI mode an out-of-range value fails loud at the
  // cast, never silently nulls out of the sums.
  private val D = DecimalType(18, 2)

  /** Per-group moment summary of `x` and the (x, y) relationship.
    * Output: groupCols ++ (n_rows, mean_x, var_samp_x, stddev_samp_x,
    * covar_samp_xy, corr_xy, regr_slope, regr_intercept).
    */
  def moments(
      df: DataFrame,
      groupCols: Seq[Column],
      x: Column,
      y: Column): DataFrame = {
    val xd = x.cast(D)
    val yd = y.cast(D)
    val sums = df.groupBy(groupCols: _*).agg(
      count(lit(1)).as("n_rows"),
      sum(xd).as("_sx"), sum(yd).as("_sy"),
      sum(xd * xd).as("_sxx"), sum(yd * yd).as("_syy"),
      sum(xd * yd).as("_sxy"))
    val n = col("n_rows").cast(DoubleType)
    val sx = col("_sx").cast(DoubleType)
    val sy = col("_sy").cast(DoubleType)
    val sxx = col("_sxx").cast(DoubleType)
    val syy = col("_syy").cast(DoubleType)
    val sxy = col("_sxy").cast(DoubleType)
    // Central co-moments scaled by n² — shared subtrees so the oracle SQL
    // can mirror the exact expression shape operation-for-operation.
    val cxx = n * sxx - sx * sx
    val cyy = n * syy - sy * sy
    val cxy = n * sxy - sx * sy
    val slope = cxy / cxx
    sums.select(groupCols ++ Seq(
      col("n_rows"),
      (sx / n).as("mean_x"),
      (cxx / (n * (n - lit(1.0)))).as("var_samp_x"),
      sqrt(cxx / (n * (n - lit(1.0)))).as("stddev_samp_x"),
      (cxy / (n * (n - lit(1.0)))).as("covar_samp_xy"),
      (cxy / sqrt(cxx * cyy)).as("corr_xy"),
      slope.as("regr_slope"),
      (sy / n - slope * (sx / n)).as("regr_intercept")): _*)
  }

  /** Per-group z-score normalization — the feature-scaling pass an ML
    * pipeline runs before training on heterogeneous strata (normalize
    * document length within each source, value within each event type,
    * ...). Group mean and sample stddev come from the same exact
    * decimal power sums as [[moments]] (order-insensitive => any engine
    * reproduces the doubles bit-for-bit), then the scores are rounded.
    * A group too small or too uniform for a stddev (n < 2 or zero
    * variance) scores 0.0 — documented, not NaN.
    *
    * Plan: one map-side-combinable aggregate produces the
    * group-cardinality stats table, which joins back BROADCAST — the
    * corpus is scanned twice and shuffled never.
    */
  def zscore(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      roundTo: Int = 6): DataFrame = {
    val xd = col(valueCol).cast(D)
    val stats = df.groupBy(col(groupCol)).agg(
      count(lit(1)).as("_n"),
      sum(xd).as("_sx"), sum(xd * xd).as("_sxx"))
    val n = col("_n").cast(DoubleType)
    val sx = col("_sx").cast(DoubleType)
    val sxx = col("_sxx").cast(DoubleType)
    val cxx = n * sxx - sx * sx
    // The n >= 2 guard keeps ANSI arithmetic from evaluating the
    // divide-by-zero branch for singleton groups.
    val enriched = stats.select(col(groupCol).as("_grp_key"),
      (sx / n).as("_mean"),
      when(col("_n") >= 2, sqrt(cxx / (n * (n - lit(1.0)))))
        .otherwise(lit(0.0)).as("_sd"))
    // NULL-SAFE stats lookup: groupBy keeps a null-key group and its
    // stats row exists, but a plain equi-join would drop every
    // null-group row from the output — a normalization pass must never
    // delete rows
    df.join(broadcast(enriched), col(groupCol) <=> col("_grp_key"))
      .drop("_grp_key")
      .withColumn("zscore",
        when(col("_sd") > 0,
          round((col(valueCol).cast(DoubleType) - col("_mean")) / col("_sd"),
            roundTo))
          .otherwise(lit(0.0)))
      .drop("_mean", "_sd")
  }
}
