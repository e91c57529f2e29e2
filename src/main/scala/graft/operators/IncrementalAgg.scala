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
    * (keys..., counts/sums...): NULL-SAFE full-outer join on `keys`
    * (groupBy puts all null-key rows in ONE group, so the merge must
    * match null keys too — a plain equi-join would keep one null-key
    * state row per side and duplicate it forever), with column-wise
    * addition that preserves SUM's null semantics: a sum that is null
    * on BOTH sides (all-null values, or one side absent with the other
    * null) stays null, exactly as a recompute over the union would
    * report — rewriting it to 0 would break the merge==recompute
    * bit-for-bit contract and make "no data" read as "sum is zero".
    */
  def merge(base: DataFrame, delta: DataFrame, keys: Seq[String],
      adds: Seq[String]): DataFrame = {
    val d2 = (keys ++ adds).foldLeft(delta)(
      (df, c) => df.withColumnRenamed(c, s"_d_$c"))
    val cond = keys.map(k => col(k) <=> col(s"_d_$k")).reduce(_ && _)
    val joined = base.join(d2, cond, "full_outer")
    val withKeys = keys.foldLeft(joined) { (df, k) =>
      df.withColumn(k, coalesce(col(k), col(s"_d_$k"))).drop(s"_d_$k")
    }
    adds.foldLeft(withKeys) { (df, c) =>
      df.withColumn(c,
        when(col(c).isNull && col(s"_d_$c").isNull, col(c))
          .otherwise(coalesce(col(c), lit(0)) + coalesce(col(s"_d_$c"), lit(0))))
        .drop(s"_d_$c")
    }
  }
}
