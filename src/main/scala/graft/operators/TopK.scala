package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.graftTopK

/** Scalable per-group top-k.
  *
  * A plain `row_number().over(Window.partitionBy(group))` shuffles the
  * entire table into one reducer per group — with few groups (the common
  * "top-k per category" case) that serializes the whole dataset through a
  * handful of tasks and falls over at scale.
  *
  * Two strategies:
  *
  *  - [[perGroupAgg]] (preferred): the native `graft_topk`
  *    TypedImperativeAggregate. Map-side partial aggregation keeps a
  *    k-element heap per group per task, so the shuffle carries only
  *    `k * tasks * groups` rows regardless of input size.
  *  - [[perGroup]]: two-phase windows — a local top-k keyed by
  *    (group, spark_partition_id), then the global top-k over the
  *    `k * partitions` survivors. Same results when the ordering is total;
  *    useful when the caller needs window semantics (e.g. rank gaps).
  */
object TopK {

  /** Exact top-k rows per group via the map-side-combining aggregate.
    *
    * @param sortKey ascending sort key — encode DESC components by
    *                negating them (e.g. `struct(-$"price", $"id")`);
    *                must be a total order for deterministic results.
    * @return the top-k rows of `df` per group with `rankCol` = 1..k
    *         assigned in sort-key order.
    */
  def perGroupAgg(
      df: DataFrame,
      groupCols: Seq[Column],
      sortKey: Column,
      k: Int,
      rankCol: String = "rn"): DataFrame = {
    val payload = struct(df.columns.map(col): _*)
    df.groupBy(groupCols: _*)
      .agg(graftTopK(sortKey, payload, k).as("_top"))
      .select(posexplode(col("_top")).as(Seq("_pos", "_row")))
      .select((col("_pos") + 1).as(rankCol), col("_row.*"))
  }

  /** Two-phase window top-k (see class doc). Ordering must be total. */
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
