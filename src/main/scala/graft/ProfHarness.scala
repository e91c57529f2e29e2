package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The ONE definition of the two idioms every profiling/bench main
  * repeats: full-result forcing and the repeated-run timer. Previously
  * re-implemented with slight drift across nine scratch mains (reps,
  * print prefixes, and two mains silently losing shared session
  * configs) — a fix to the forcing idiom now lands everywhere at once.
  */
private[graft] object ProfHarness {

  /** Force COMPLETE evaluation of every row and column without
    * collecting: reduce the whole frame to one bit_xor of per-row
    * xxhash64 over all columns (order-insensitive, so no sort is
    * added to the measured plan). The same reduction Bench bills.
    */
  def force(df: DataFrame): Unit = {
    val cols = df.columns.map(col).toIndexedSeq
    df.agg(bit_xor(xxhash64(struct(cols: _*)))).head()
    ()
  }

  /** Run `f` `reps` times printing `<label> runN: S s` — run1 carries
    * cold planning+codegen cost, later runs the warm plan cost; the gap
    * is compile overhead.
    */
  def time(label: String, reps: Int = 3)(f: => Any): Unit =
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      f
      println(f"$label run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

  /** [[time]] for tools whose measured expression RETURNS the readout
    * (a count, a knob value): prints `<label> runN: S s (<result>)`.
    */
  def timeShown(label: String, reps: Int = 1)(f: => Any): Unit =
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val r = f
      println(f"$label run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($r)")
    }
}
