package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-dimensional skyline (Pareto frontier, Börzsönyi et al. 2001's
  * SKYLINE OF operator): rows not dominated by any other row, where q
  * dominates p iff q.x <= p.x, q.y >= p.y, and at least one is strict
  * (minimize x, maximize y; flip signs at the call site for other
  * orientations). Equal (x, y) twins never dominate each other, so
  * exact ties all survive — the ANSI-style semantics an independent
  * NOT EXISTS oracle reproduces verbatim.
  *
  * Algorithm: the sort-sweep identity — p survives iff
  *   (a) y equals the MAX y of p's own x-group (anything less is
  *       dominated inside the group), and
  *   (b) y strictly exceeds every cheaper group's max y (any cheaper
  *       point with >= y dominates).
  * So: collapse to (x, gmax) per distinct x — a map-side-combinable
  * aggregate whose state is bounded by the X VALUE DOMAIN, not row
  * count — take the running max over the x-ordered GROUP table
  * (domain-sized window), and semi-join survivors back at scan speed.
  * No row-row dominance join ever runs; the O(n²) all-pairs check
  * exists only in the oracle, which is the point of the gate.
  *
  * DECLARED PREMISES: (1) xCol is DISCRETE — the group table, the
  * single-task running-max window, and the broadcast back are all
  * bounded by the distinct-x domain, so a continuous x (distinct x ~
  * row count) must be bucketed/quantized by the caller first;
  * (2) rows with a null coordinate are EXCLUDED — dominance is a
  * comparison, and SQL comparisons against null are never true, so a
  * null-coordinate row can neither dominate nor be dominated; including
  * them would also poison the running max (null x sorts first and its
  * group max would suppress genuine frontier points).
  */
object Skyline {

  /** Skyline rows of `df` minimizing `xCol`, maximizing `yCol`. */
  def skyline2d(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val clean = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
    val groups = clean.groupBy(col(xCol))
      .agg(max(col(yCol)).as("_gmax"))
    val w = Window.orderBy(col(xCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = groups
      .withColumn("_prevmax", max(col("_gmax")).over(w))
      .filter(col("_prevmax").isNull || col("_gmax") > col("_prevmax"))
      .select(col(xCol), col("_gmax"))
    clean.join(broadcast(frontier), Seq(xCol))
      .filter(col(yCol) === col("_gmax"))
      .drop("_gmax")
  }
}
