package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass "how many words of this text are in this set" counter,
  * shared by the interpreted and codegen paths of [[WordSetCount]].
  * The set is built once per (executor, expression) from the literal
  * array and cached by identity.
  */
object WordSetCountUtil {
  // One cached set per literal ArrayData instance (the Literal is shared
  // across rows within a task, so identity caching is effective and
  // avoids rebuilding the set per row).
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[ArrayData, java.util.HashSet[String]]()

  private def setOf(words: ArrayData): java.util.HashSet[String] = {
    val hit = cache.get(words)
    if (hit != null) return hit
    val s = new java.util.HashSet[String]()
    var i = 0
    while (i < words.numElements()) {
      s.add(words.getUTF8String(i).toString)
      i += 1
    }
    cache.putIfAbsent(words, s)
    s
  }

  /** Count of non-empty `\s+`-separated words of (space-trimmed) `text`
    * that are members of `words` — exactly
    * `size(filter(split(trim(text), '\\s+'), w -> len(w) > 0 AND w IN set))`.
    */
  def count(text: UTF8String, words: ArrayData): Int = {
    val set = setOf(words)
    val s = text.trim().toString
    if (s.isEmpty) return 0
    val ws = WsPattern.split(s)
    var n = 0
    var i = 0
    while (i < ws.length) {
      if (ws(i).nonEmpty && set.contains(ws(i))) n += 1
      i += 1
    }
    n
  }
}

/** `graft_wordset_count(text, array('the','a',...))` — marker-word hit
  * count as a native expression.
  *
  * Why not `size(filter(split(...), w -> w.isin(...)))`: the
  * higher-order filter is interpreted per word with a linear `isin` scan
  * per element — language ID runs it four times (one per candidate
  * language) over every document. One codegen'd pass with a hashed set
  * turns the text-analysis gates into scan-speed expressions.
  */
case class WordSetCount(text: Expression, wordsExpr: Expression)
    extends BinaryExpression {

  override def prettyName: String = "graft_wordset_count"
  override def left: Expression = text
  override def right: Expression = wordsExpr
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName text must be STRING")
    else if (!wordsExpr.foldable ||
      !wordsExpr.dataType.isInstanceOf[ArrayType] ||
      wordsExpr.dataType.asInstanceOf[ArrayType].elementType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName words must be a literal ARRAY<STRING>")
    else TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(t: Any, w: Any): Any =
    WordSetCountUtil.count(t.asInstanceOf[UTF8String], w.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, w) =>
      s"${ev.value} = graft.functions.WordSetCountUtil.count($t, $w);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordSetCount =
    copy(text = newLeft, wordsExpr = newRight)
}
