package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass per-document bigram statistics, shared by the interpreted
  * and codegen paths of [[BigramStats]].
  */
object BigramStatsUtil {

  val schema: StructType = StructType(Seq(
    StructField("total_bigrams", LongType, nullable = false),
    StructField("distinct_bigrams", LongType, nullable = false),
    StructField("max_count", LongType, nullable = false)))

  /** (total, distinct, max) word-bigram occurrence counts of the
    * lowercased text. Word semantics mirror the SQL composition this
    * replaces exactly: ASCII-space trim, then Java-regex `\s+` split
    * with limit -1 (a leading tab yields a leading empty word, a
    * trailing newline a trailing one — both participate in bigrams, as
    * they did in the explode form). Fewer than two words = zero bigrams.
    */
  def stats(text: UTF8String): InternalRow = {
    // UTF8String.trim removes ASCII spaces only (same as SQL trim), and
    // UTF8String.toLowerCase is the exact lower() implementation — not
    // java.lang.String.toLowerCase, whose default-locale behavior
    // diverges (Turkish dotless i).
    val s = text.trim().toLowerCase().toString
    val out = new Array[Any](3)
    val ws = WsPattern.split(s)
    if (ws.length < 2) {
      out(0) = 0L; out(1) = 0L; out(2) = 0L
      return new GenericInternalRow(out)
    }
    val counts = new java.util.HashMap[String, Long]()
    val sb = new java.lang.StringBuilder()
    var maxc = 0L
    var i = 0
    while (i < ws.length - 1) {
      sb.setLength(0)
      sb.append(ws(i)).append(' ').append(ws(i + 1))
      val g = sb.toString
      val c = counts.merge(g, 1L, (a, b) => a + b)
      if (c > maxc) maxc = c
      i += 1
    }
    out(0) = (ws.length - 1).toLong
    out(1) = counts.size.toLong
    out(2) = maxc
    new GenericInternalRow(out)
  }
}

/** `graft_bigram_stats(text)` — per-document word-bigram occurrence
  * statistics (total, distinct, max single-bigram count) as one native
  * expression returning a struct.
  *
  * Why not slice + arrays_zip + explode + two aggregations + a join
  * back: repetition signals are a function of ONE document, so shuffling
  * every (doc, bigram) pair across the cluster to count within-document
  * repeats is pure waste — the counting fits in a per-row hash map
  * bounded by the document's own length, runs at scan speed inside
  * whole-stage codegen, and needs zero exchanges. (A pathological
  * multi-GB single document would bound this by its own size; documents
  * at that size break the explode form's shuffle just as hard.)
  */
case class BigramStats(text: Expression) extends UnaryExpression {

  override def prettyName: String = "graft_bigram_stats"
  override def child: Expression = text
  override def dataType: DataType = BigramStatsUtil.schema

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName input must be STRING")

  override protected def nullSafeEval(t: Any): Any =
    BigramStatsUtil.stats(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.BigramStatsUtil.stats($t)")

  override protected def withNewChildInternal(newChild: Expression): BigramStats =
    copy(text = newChild)
}
