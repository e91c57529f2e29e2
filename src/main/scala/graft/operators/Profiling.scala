package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-scan data profiling: per-column row/null/distinct counts and
  * min/max, emitted as one row PER COLUMN — the data-quality summary an
  * ingest pipeline checks before accepting a batch.
  *
  * Shape: a single aggregate computes every column's statistics in one
  * pass over the table (count(DISTINCT a), count(DISTINCT b), ... in one
  * Aggregate — Spark plans the multi-distinct via one Expand of factor
  * k, still one scan), and the k-row result is reshaped column-wise on
  * the 1-row output — no per-column re-scans, which is what a naive
  * "loop over columns and run a query each" profiler costs. At 100 TB
  * the exact-distinct Expand is the deliberate trade for an
  * oracle-exact answer; the sketch path (approx_count_distinct, no
  * Expand, mergeable state) is the same plan minus exactness and is
  * demonstrated separately (q_approx_distinct).
  *
  * min/max are emitted as strings so heterogeneous column types share
  * one output schema (the profile is a report, not an input to further
  * arithmetic).
  */
object Profiling {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"_rows_$c"),
        count(when(col(c).isNull, 1)).as(s"_nulls_$c"),
        countDistinct(col(c)).as(s"_dist_$c"),
        min(col(c)).cast("string").as(s"_min_$c"),
        max(col(c)).cast("string").as(s"_max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("col_name"),
        col(s"_rows_$c").as("n_rows"),
        col(s"_nulls_$c").as("n_nulls"),
        col(s"_dist_$c").as("n_distinct"),
        col(s"_min_$c").as("min_val"),
        col(s"_max_$c").as("max_val"))
    }
    one.select(explode(array(rows: _*)).as("_p")).select(col("_p.*"))
  }
}
