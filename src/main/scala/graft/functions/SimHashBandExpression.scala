package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Shared by the interpreted and codegen paths of [[SimHashBandKeys]]. */
object SimHashBandUtil {

  private val comboCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Int]]]()

  /** All size-`shared` subsets of chunk indices 0..pieces-1, in a stable
    * order (the subset's position IS its combo id).
    */
  def combos(pieces: Int, shared: Int): Array[Array[Int]] =
    comboCache.computeIfAbsent((pieces, shared),
      _ => (0 until pieces).combinations(shared).map(_.toArray).toArray)

  /** C(n, r) computed arithmetically, capped: returns as soon as the
    * running count exceeds `cap` (so the analysis-time replication check
    * never materializes — or even fully counts — an astronomical
    * combination table).
    */
  def comboCountCapped(n: Int, r: Int, cap: Long): Long = {
    val k = math.min(r, n - r)
    if (k < 0) return 0L
    var c = 1L
    var i = 0
    while (i < k) {
      c = c * (n - i) / (i + 1) // exact: product of i+1 consecutive ints
      if (c > cap) return c
      i += 1
    }
    c
  }

  /** The C(pieces, pieces-maxHamming) banding keys of one fingerprint,
    * each packed as (comboId << 48) | concatenated-chunk-bits — one long
    * per key, so the candidate equi-join runs on a single long column.
    */
  def bandKeys(simhash: Long, pieces: Int, maxHamming: Int): ArrayData = {
    val width = 64 / pieces
    val shared = pieces - maxHamming
    val mask = if (width == 64) -1L else (1L << width) - 1
    val cs = combos(pieces, shared)
    val out = new Array[Any](cs.length)
    var ci = 0
    while (ci < cs.length) {
      val c = cs(ci)
      var key = 0L
      var i = 0
      while (i < c.length) {
        key |= ((simhash >>> (c(i) * width)) & mask) << (i * width)
        i += 1
      }
      out(ci) = (ci.toLong << 48) | key
      ci += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_simhash_bands(simhash, pieces, maxHamming)` — the multi-block
  * banding keys of a 64-bit SimHash fingerprint as one array<long>.
  *
  * Replaces an explode over C(pieces, shared) per-combo struct
  * expressions, each a chain of shifts and ORs: that form is correct but
  * its generated code is quadratic-ish in the combo count and appears on
  * BOTH sides of the candidate self-join, so Janino compile time
  * dominated the banding stage on small inputs (the same failure mode
  * the SimHash aggregate itself had as 64 sum columns). Here the whole
  * key set is one static helper call — constant-size generated code, the
  * combo table computed once per (pieces, shared) and cached.
  *
  * Packing (comboId << 48) | key keeps completeness intact: two
  * fingerprints collide on a packed value iff they collide on the SAME
  * combo with the SAME chunk bits, which is exactly the (combo, bkey)
  * pair-key this replaces. Requires shared * (64/pieces) <= 48 so the
  * key bits never reach the combo id bits — enforced at type check.
  */
case class SimHashBandKeys(simhash: Expression, piecesExpr: Expression,
    maxHammingExpr: Expression) extends TernaryExpression {

  override def prettyName: String = "graft_simhash_bands"
  override def first: Expression = simhash
  override def second: Expression = piecesExpr
  override def third: Expression = maxHammingExpr
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def litInt(e: Expression): Option[Int] =
    if (e.foldable && e.dataType == IntegerType && e.eval() != null)
      Some(e.eval().asInstanceOf[Int])
    else None

  override def checkInputDataTypes(): TypeCheckResult = {
    if (simhash.dataType != LongType)
      return TypeCheckResult.TypeCheckFailure(s"$prettyName simhash must be BIGINT")
    (litInt(piecesExpr), litInt(maxHammingExpr)) match {
      case (Some(p), Some(h)) =>
        // pieces need not divide 64: chunks are floor(64/pieces) bits
        // each, and any leftover TOP bits are simply uncovered — a flip
        // there dirties no chunk, so it can only make the pigeonhole
        // argument easier; completeness is untouched and the candidate
        // join re-checks the exact bit_count anyway. Non-dividing piece
        // counts are the knob that trades key length (bucket
        // selectivity) against combo replication.
        if (p <= 0 || p > 64)
          TypeCheckResult.TypeCheckFailure(s"$prettyName needs 1 <= pieces <= 64")
        else if (h < 0 || h >= p)
          TypeCheckResult.TypeCheckFailure(
            s"$prettyName needs 0 <= maxHamming < pieces for pigeonhole completeness")
        else if ((p - h) * (64 / p) > 48)
          TypeCheckResult.TypeCheckFailure(
            s"$prettyName key bits (pieces-maxHamming)*(64/pieces) must fit in 48")
        // count C(p, p-h) ARITHMETICALLY with an early cutoff — calling
        // combos() here would materialize the full combination table
        // before the cap check, and C(64, 48) ~ 4.9e14 arrays hangs the
        // driver during ANALYSIS for parameter mistakes the check exists
        // to reject
        else if (SimHashBandUtil.comboCountCapped(p, p - h, 256) > 256)
          TypeCheckResult.TypeCheckFailure(
            s"$prettyName C($p, ${p - h}) banding subsets - too much replication")
        else TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName pieces and maxHamming must be INT literals")
    }
  }

  override protected def nullSafeEval(s: Any, p: Any, h: Any): Any =
    SimHashBandUtil.bandKeys(s.asInstanceOf[Long],
      p.asInstanceOf[Int], h.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, p, h) =>
      s"${ev.value} = graft.functions.SimHashBandUtil.bandKeys($s, $p, $h);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): SimHashBandKeys =
    copy(simhash = newFirst, piecesExpr = newSecond, maxHammingExpr = newThird)
}
