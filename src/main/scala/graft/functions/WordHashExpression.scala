package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass Karp-Rabin word hash shared by the interpreted and
  * codegen paths of [[KarpRabinHash]].
  */
object WordHashUtil {
  /** base-131 polynomial over the word's CODE POINTS mod 1000003 —
    * numerically identical to the SQL fold it replaces
    * (`aggregate(split(w, ''), 0L, (acc, ch) -> (acc * 131 + ascii(ch))
    * % 1000003)`): a Java-regex empty split keeps a surrogate pair as
    * one element and `ascii` returns its code point, and the DuckDB
    * oracle's character split is code-point-based too, so the fold must
    * step per code point, not per UTF-16 unit. acc < 2^20, so
    * acc * 131 + code never overflows a long.
    */
  def hash(word: UTF8String): Long = {
    val s = word.toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 131L + cp.toLong) % 1000003L
      i += Character.charCount(cp)
    }
    acc
  }
}

/** `graft_word_hash(word)` — the CDC chunker's per-word Karp-Rabin
  * value as a native expression.
  *
  * Why native (the [[WordShingles]] argument): the SQL composition
  * `aggregate(filter(split(w, ''), ...), ...)` materializes one
  * single-character STRING per character and folds over them with an
  * interpreted lambda — per-character allocation plus lambda dispatch
  * on the hottest projection of the chunking scan. This is one tight
  * char loop inside whole-stage codegen.
  */
case class KarpRabinHash(word: Expression) extends UnaryExpression {

  override def prettyName: String = "graft_word_hash"
  override def child: Expression = word
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (word.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName input must be STRING")

  override protected def nullSafeEval(w: Any): Any =
    WordHashUtil.hash(w.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, w => s"graft.functions.WordHashUtil.hash($w)")

  override protected def withNewChildInternal(newChild: Expression): KarpRabinHash =
    copy(word = newChild)
}
