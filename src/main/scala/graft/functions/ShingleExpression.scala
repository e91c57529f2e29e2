package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass distinct word n-gram shingling, shared by the interpreted
  * and codegen paths of [[WordShingles]].
  */
/** Statically compiled whitespace pattern shared by the scan-speed text
  * utilities: `String.split(regex, …)` compiles a fresh Pattern on EVERY
  * row for multi-char regexes — exactly the per-row cost these native
  * expressions exist to remove (the NormalizeTextUtil discipline).
  * `Pattern.split(s, -1)` is semantics-identical to
  * `s.split("\\s+", -1)` (trailing empties kept), and Pattern is
  * immutable/thread-safe.
  */
private[functions] object WsPattern {
  private val ws = java.util.regex.Pattern.compile("\\s+")
  def split(s: String): Array[String] = ws.split(s, -1)
  def collapse(s: String): String = ws.matcher(s).replaceAll(" ")
}

object ShingleUtil {

  /** Distinct word n-gram shingles of `text`, in first-occurrence order.
    *
    * Semantics mirror the SQL composition it replaces —
    * `array_distinct(transform(sequence(...), i -> concat_ws(' ',
    * slice(split(trim(text), '\\s+'), i+1, n))))` — exactly:
    * ASCII-space-only trim (SQL trim), Java-regex `\s+` split (so a
    * leading tab still yields a leading empty word, as in both Spark and
    * DuckDB), single-space joins, and fewer than n words -> empty array.
    */
  def distinctShingles(text: UTF8String, n: Int): ArrayData = {
    val s = text.trim().toString // UTF8String.trim removes ASCII spaces only
    if (s.isEmpty) return new GenericArrayData(Array.empty[Any])
    // limit -1: SQL split keeps TRAILING empty strings (text ending in a
    // tab/newline yields a trailing "" word); Java's default limit 0
    // drops them and would lose the final shingle.
    val words = WsPattern.split(s)
    if (words.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= words.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}

/** `graft_shingles(text, n)` — distinct word n-gram shingles as a native
  * expression.
  *
  * Why not `array_distinct(transform(sequence(...), slice + concat_ws))`:
  * Catalyst higher-order functions are interpreted per element, so that
  * composition runs ~words-per-doc lambda invocations each allocating a
  * slice — it dominated the shingle-based dedup plans' scan time. This
  * expression does one tight pass per row (split, StringBuilder joins,
  * order-preserving hash-set dedup) and stays inside whole-stage codegen
  * via a static helper call, like [[DotProduct]].
  */
case class WordShingles(text: Expression, nExpr: Expression)
    extends BinaryExpression {

  override def prettyName: String = "graft_shingles"
  override def left: Expression = text
  override def right: Expression = nExpr
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName text must be STRING")
    else if (!nExpr.foldable || nExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName n must be an INT literal")
    else if (nExpr.eval() == null || nExpr.eval().asInstanceOf[Int] <= 0)
      TypeCheckResult.TypeCheckFailure(s"$prettyName n must be positive")
    else TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(t: Any, n: Any): Any =
    ShingleUtil.distinctShingles(t.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n) =>
      s"${ev.value} = graft.functions.ShingleUtil.distinctShingles($t, $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordShingles =
    copy(text = newLeft, nExpr = newRight)
}
