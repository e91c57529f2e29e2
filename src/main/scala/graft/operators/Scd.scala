package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history builder: turn a change log
  * (one row per observed state of an entity) into versioned validity
  * intervals — `version` (1-based per entity), `valid_from` (the change's
  * own timestamp), `valid_to` (the NEXT change's timestamp, null while
  * current) and `is_current`. This is the standard warehouse shape for
  * "what did this row look like on date D" queries: the D lookup becomes
  * `valid_from <= D AND (valid_to IS NULL OR D < valid_to)` — a range
  * predicate over an equi-partitioned table instead of a self-join.
  *
  * One window over (key, ts, tiebreak) is the whole plan: a single
  * shuffle on the entity key, linear within each entity, no self-join.
  * The tiebreak column makes same-timestamp changes deterministic (two
  * updates in one batch get distinct versions in tiebreak order) — the
  * same later-row-wins discipline as the ingest merge
  * (see MergeOps), expressed as history instead of overwrite.
  *
  * At 100 TB the window shuffle partitions by entity key; entities are
  * independent so skew only arises from a single pathological entity's
  * change count, which is bounded by ingest frequency, not corpus size.
  */
object Scd {

  def scd2(
      changes: DataFrame,
      keyCol: String,
      tsCol: String,
      tiebreakCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tiebreakCol))
    changes
      .withColumn("version", row_number().over(w))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Point-in-time predicate over an SCD2 table: the rows valid at `at`. */
  def asOf(at: Column): Column =
    col("valid_from") <= at && (col("valid_to").isNull || at < col("valid_to"))
}
