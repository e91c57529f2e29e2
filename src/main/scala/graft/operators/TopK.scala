package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable per-group top-k.
  *
  * A plain `row_number().over(Window.partitionBy(group))` shuffles the
  * entire table into one reducer per group — with few groups (the common
  * "top-k per category" case) that serializes the whole dataset through a
  * handful of tasks and falls over at scale.
  *
  * Two-phase instead: (1) a local top-k inside each input partition
  * (window keyed by (group, spark_partition_id) — parallel across all
  * partitions, no data movement beyond the partition), then (2) the
  * global top-k over the k*numPartitions survivors — the same few-reducer
  * window, but now over a vanishingly small input. Results are identical
  * to the single-window plan whenever the ordering is total (ties broken
  * deterministically), which callers should ensure.
  */
object TopK {

  def perGroup(
      df: DataFrame,
      groupCols: Seq[Column],
      order: Seq[Column],
      k: Int,
      rankCol: String = "rn"): DataFrame = {
    val local = Window
      .partitionBy(groupCols :+ spark_partition_id(): _*)
      .orderBy(order: _*)
    val global = Window.partitionBy(groupCols: _*).orderBy(order: _*)
    df.withColumn("_local_rn", row_number().over(local))
      .filter(col("_local_rn") <= k)
      .drop("_local_rn")
      .withColumn(rankCol, row_number().over(global))
      .filter(col(rankCol) <= k)
  }
}
