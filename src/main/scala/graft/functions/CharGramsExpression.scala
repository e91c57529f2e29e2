package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass character n-gram extraction for the trained language
  * classifier, shared by the interpreted and codegen paths of
  * [[CharGrams]].
  */
object CharGramsUtil {

  /** The canonical rendering as CODE POINTS: trim + lowercase, every
    * whitespace run collapsed to a single space, then optionally
    * truncated to the first `maxChars` characters. Code points, not
    * UTF-16 units, because the replaying SQL (`substr(regexp_replace(
    * trim(lower(text)), '\s+', ' ', 'g'), 1, maxChars)` and its
    * windows) counts CHARACTERS — a UTF-16 formulation would mis-window
    * (and could split a surrogate pair at the truncation edge) on any
    * supplementary-plane character. One shared helper so the gram
    * expression and the NB scorer can never drift apart (the two are
    * parity-critical halves of the same oracle contract).
    */
  def canonicalCodePoints(text: UTF8String, maxChars: Int): Array[Int] = {
    val s = WsPattern.collapse(text.trim().toLowerCase().toString)
    val cps = s.codePoints().toArray
    if (maxChars > 0 && cps.length > maxChars) java.util.Arrays.copyOf(cps, maxChars)
    else cps
  }

  /** All character n-grams (WITH multiplicity — the NB scorer needs
    * term frequencies) of the canonical rendering of `text` — see
    * [[canonicalCodePoints]] for the exact-SQL-parity contract.
    */
  def grams(text: UTF8String, n: Int, maxChars: Int): ArrayData = {
    val cps = canonicalCodePoints(text, maxChars)
    val len = cps.length
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](len - n + 1)
    var i = 0
    while (i + n <= len) {
      out(i) = UTF8String.fromString(new String(cps, i, n))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_char_grams(text, n, maxChars)` — character n-grams of the
  * canonical rendering as one native expression.
  *
  * Why native (the r13 lesson): the relational composition
  * `transform(sequence(...), i -> substr(canonical, i, n))` embeds the
  * canonicalization INSIDE the lambda, and Catalyst higher-order
  * functions evaluate their body per element interpreted — the
  * regexp_replace re-ran once per character and turned a scan into an
  * O(len^2) regex loop (measured 20 s at sf0.1). This expression does
  * the canonicalization once and emits the windows in one tight pass,
  * inside whole-stage codegen.
  */
case class CharGrams(text: Expression, nExpr: Expression, maxExpr: Expression)
    extends TernaryExpression {

  override def prettyName: String = "graft_char_grams"
  override def first: Expression = text
  override def second: Expression = nExpr
  override def third: Expression = maxExpr
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName text must be STRING")
    else if (!nExpr.foldable || nExpr.dataType != IntegerType ||
        nExpr.eval() == null || nExpr.eval().asInstanceOf[Int] <= 0)
      TypeCheckResult.TypeCheckFailure(s"$prettyName n must be a positive INT literal")
    else if (!maxExpr.foldable || maxExpr.dataType != IntegerType ||
        maxExpr.eval() == null)
      TypeCheckResult.TypeCheckFailure(s"$prettyName maxChars must be an INT literal")
    else TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(t: Any, n: Any, m: Any): Any =
    CharGramsUtil.grams(t.asInstanceOf[UTF8String],
      n.asInstanceOf[Int], m.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n, m) =>
      s"${ev.value} = graft.functions.CharGramsUtil.grams($t, $n, $m);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): CharGrams =
    copy(text = newFirst, nExpr = newSecond, maxExpr = newThird)
}
