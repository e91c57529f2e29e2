package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic token-budget curation: take documents in priority
  * order (best first, ties by id) until the cumulative token count
  * would exceed the budget — "fill a 10B-token training mix with the
  * highest-quality documents first".
  *
  * The naive formulation is a running-total window over a GLOBAL
  * (priority DESC, id) sort — a single-reducer sort of the corpus. The
  * scalable shape mirrors GlobalIndex's split-points trick, keyed on
  * the QUANTIZED priority (quality scores here are already rounded to
  * 2 decimals, so the priority domain is bounded):
  *
  *  1. per-priority-bucket token totals — tiny map-side-combinable
  *     aggregate, one (priority, sum, n) row per distinct priority on
  *     the driver,
  *  2. driver prefix-sums the buckets best-first and finds the BOUNDARY
  *     priority where the budget crosses (bounded work: one row per
  *     distinct priority),
  *  3. strictly-better buckets are taken whole with a scan-speed
  *     filter — no sort, no window, no shuffle,
  *  4. only the boundary bucket runs a running-total window (ordered by
  *     id) against the remaining budget.
  *
  * The quantized-priority assumption is what bounds step 4: a corpus
  * where every document shares one priority value degenerates to the
  * global window. Selection is a pure function of (priority, id, token)
  * values — bit-identical to the single-reducer formulation, which is
  * exactly what the oracle checks.
  */
object BudgetSample {

  def fillTokenBudget(
      docs: DataFrame,
      tokenCol: String,
      priorityCol: String,
      idCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    val buckets = docs.groupBy(col(priorityCol))
      .agg(sum(col(tokenCol)).as("_t"))
      .collect()
      .map(r => (r.getDouble(0), r.getLong(1)))
      .sortBy(-_._1)
    var acc = 0L
    var boundary = Double.NaN
    var remaining = budget
    val it = buckets.iterator
    var done = false
    while (it.hasNext && !done) {
      val (p, t) = it.next()
      if (acc + t <= budget) acc += t
      else { boundary = p; remaining = budget - acc; done = true }
    }
    if (boundary.isNaN) {
      // every bucket fits: the whole corpus is within budget
      docs
    } else {
      val full = docs.filter(col(priorityCol) > boundary)
      val partial = docs.filter(col(priorityCol) === boundary)
        .withColumn("_cum", sum(col(tokenCol))
          .over(Window.orderBy(col(idCol))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .filter(col("_cum") <= remaining)
        .drop("_cum")
      full.unionByName(partial)
    }
  }
}
