package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join: for every left row, attach the most recent right row (by
  * time) with `right.ts <= left.ts`, per key — the temporal lookup
  * ("state as of this event") that Spark has no native operator for.
  *
  * Spark-first construction, not a range join: tag both sides, UNION
  * them, and run ONE carry-forward window per key ordered by
  * (timestamp, side) with right rows sorting before left rows at equal
  * timestamps (so a same-instant right row is visible, matching the
  * `<=` bound). All value columns are packed into ONE struct per right
  * row and `last(struct, ignoreNulls)` over the running frame fills each
  * left row with the latest preceding right ROW as a unit; left rows are
  * then filtered back out and the struct unpacked. Carrying the struct —
  * not each column independently — is what gives true AS-OF semantics
  * for nullable values: a NULL field in the most-recent right row stays
  * NULL instead of being back-filled from an older right row, and every
  * output column is guaranteed to come from the same right row.
  *
  * Scale shape: one shuffle on the key (the window partition), linear
  * scan within each key — no per-row range probe, no interval
  * cross-product, and keys are independent (embarrassingly parallel
  * across a 1000-executor cluster). The classic alternative — a
  * non-equi range join — degenerates to per-key quadratic work.
  *
  * Requirement: `right` must be unique per (keys, rightTsCol); ties
  * there would be resolved by partition order (nondeterministic).
  * Deduplicate with a deterministic pick first (see `q_asof_join`).
  */
object AsOfJoin {

  def asOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTsCol: String,
      rightTsCol: String,
      valueCols: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    require(keys.nonEmpty, "as-of join requires at least one key column")
    require(valueCols.nonEmpty, "as-of join requires value columns to carry")
    val lTagged = left
      .withColumn("_ats", col(leftTsCol))
      .withColumn("_side", lit(1))
    // a right row with a NULL timestamp can never satisfy ts <= left.ts
    // — unfiltered it would sort FIRST (nulls-first ascending) and
    // attach to every left row as if stamped -infinity
    val rTagged = right.filter(col(rightTsCol).isNotNull).select(
        keys.map(col) ++ Seq(col(rightTsCol).as("_ats"),
          struct(valueCols.map(col): _*).as("_aval")): _*)
      .withColumn("_side", lit(0))
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ats"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // _aval is null on left rows (missing column in the union), non-null
    // on every right row — ignoreNulls therefore means "latest right row",
    // never "latest non-null value per column".
    val filled = unioned
      .withColumn("_aval", last(col("_aval"), ignoreNulls = true).over(w))
    val unpacked = valueCols.foldLeft(filled) { (df, c) =>
      df.withColumn(s"$prefix$c", col("_aval").getField(c))
    }
    unpacked.filter(col("_side") === 1).drop("_ats", "_side", "_aval")
  }

  /** The same join as [[asOf]], executed by the NATIVE operator
    * ([[graft.plans.AsOfJoinNode]] / [[graft.plans.AsOfJoinExec]],
    * planned via the injected strategy — the session must be built
    * `.withExtensions(new GraftExtensions)`). One sorted-merge pass per
    * co-partition with a single buffered right row — no union
    * materialization and no window frame machinery.
    *
    * The right side is re-aliased internally, so self-joins (left and
    * right derived from the same scan) are safe. Keys should be
    * non-null: like the window formulation (whose `partitionBy` groups
    * nulls together), a null key matches a null-keyed right row rather
    * than following SQL's null-never-equal join rule.
    */
  def asOfNative(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTsCol: String,
      rightTsCol: String,
      valueCols: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    require(keys.nonEmpty, "as-of join requires at least one key column")
    require(valueCols.nonEmpty, "as-of join requires value columns to carry")
    import org.apache.spark.sql.{GraftSqlBridge => B}
    // Fresh aliases give the right side new exprIds, so left/right built
    // from the same source never collide in the analyzer.
    val rCols = (keys :+ rightTsCol) ++ valueCols
    // null-ts right rows filtered for parity with [[asOf]] (they can
    // never satisfy ts <= left.ts)
    val rAliased = right.filter(col(rightTsCol).isNotNull)
      .select(rCols.map(c => col(c).as(s"_r_$c")): _*)
    val lPlan = B.analyzed(left)
    val rPlan = B.analyzed(rAliased)
    def attrOf(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    val node = graft.plans.AsOfJoinNode(
      lPlan, rPlan,
      keys.map(attrOf(lPlan, _)),
      keys.map(k => attrOf(rPlan, s"_r_$k")),
      attrOf(lPlan, leftTsCol),
      attrOf(rPlan, s"_r_$rightTsCol"),
      valueCols.map(c => attrOf(rPlan, s"_r_$c")),
      outputPrefix = prefix)
    // The node names value outputs prefix + "_r_" + col (after the
    // internal aliasing); rename to match [[asOf]]'s prefix + col
    // contract.
    val df = B.dataFrame(left.sparkSession, node)
    valueCols.foldLeft(df) { (d, c) =>
      d.withColumnRenamed(prefix + "_r_" + c, prefix + c)
    }
  }
}
