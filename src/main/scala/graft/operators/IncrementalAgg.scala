package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental (delta-maintained) additive aggregates — classic
  * materialized-view maintenance (Gupta & Mumick's change-propagation
  * algebra for distributive aggregates): a persisted grouped state
  * (counts / sums per key) is advanced by aggregating ONLY the arriving
  * batch and merging, so per-batch cost scales with the batch while the
  * history is never rescanned. At 100 TB this is the difference between
  * an hourly pipeline that reads gigabytes and one that reads
  * everything: COUNT and SUM are distributive, so
  * state(base ∪ delta) = state(base) ⊕ state(delta) with ⊕ = null-safe
  * per-key addition — exactly one full-outer join on the group key,
  * both sides already aggregate-sized (bounded by key cardinality, not
  * row count).
  *
  * Deletions/updates fold in the same algebra with signed deltas
  * (counts -1, sums negated) — [[graft.operators.MergeOps]] owns the
  * row-level versions of those semantics; this operator owns the
  * aggregate-level ones.
  *
  * Exactness: keep sums in DECIMAL state — decimal addition is
  * associative, so merge-then-read equals recompute bit-for-bit (the
  * oracle recomputes from scratch over base+delta and the gate hashes
  * the results). Double state would make the merged sum order-sensitive.
  */
object IncrementalAgg {

  /** Merge two additive aggregate states sharing the schema
    * (keys..., counts/sums...): full-outer join on `keys`, null-safe
    * column-wise addition of every column in `adds`.
    */
  def merge(base: DataFrame, delta: DataFrame, keys: Seq[String],
      adds: Seq[String]): DataFrame = {
    val d2 = adds.foldLeft(delta)((df, c) => df.withColumnRenamed(c, s"_d_$c"))
    adds.foldLeft(base.join(d2, keys, "full_outer")) { (df, c) =>
      df.withColumn(c,
        coalesce(col(c), lit(0)) + coalesce(col(s"_d_$c"), lit(0)))
        .drop(s"_d_$c")
    }
  }
}
