package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass per-document word-n-gram CHARACTER statistics for the
  * Gopher repetition rules (Rae et al. 2021, table A1), shared by the
  * interpreted and codegen paths of [[GopherNgramStats]].
  */
object NgramRepUtil {

  val schema: StructType = StructType(
    StructField("total_chars", LongType, nullable = false) +:
      (2 to 4).map(n => StructField(s"top${n}_chars", LongType, nullable = false)) ++:
      (5 to 10).map(n => StructField(s"dup${n}_chars", LongType, nullable = false)))

  /** All eleven statistics over the CANONICAL rendering of the document:
    * trim + lowercase, `\s+`-split with empty words dropped, words
    * re-joined with single spaces. Character positions, gram lengths and
    * the total are all measured in that canonical string, which makes
    * gram equality equal to word-sequence equality (words carry no
    * whitespace) and gives any engine an exact replay path.
    *
    *   total_chars        — length of the canonical string
    *   topN_chars (2..4)  — max over distinct n-grams of
    *                        occurrences x gram-length: the character
    *                        mass held by the heaviest single n-gram
    *                        (no overlap dedup — occurrences x length,
    *                        the published rule's accounting)
    *   dupN_chars (5..10) — UNION of the canonical-string spans of all
    *                        n-grams occurring more than once (each
    *                        character counted once however many
    *                        duplicated grams cover it) — the table-A1
    *                        "fraction of characters in duplicate
    *                        n-grams" numerator
    *
    * Cost: the word split once, then one hash-map pass per n (9 passes)
    * over the document's own grams — O(words x 9) time and a map bounded
    * by the document size, inside whole-stage codegen. The spans of a
    * fixed n arrive in increasing start order, so the union is a single
    * running-max sweep (no sort, no interval list).
    */
  def stats(text: UTF8String): InternalRow = {
    // 10 slots = schema: total + top2..4 + dup5..10
    val out = new Array[Any](10)
    java.util.Arrays.fill(out.asInstanceOf[Array[AnyRef]], java.lang.Long.valueOf(0L))
    val ws0 = WsPattern.split(text.trim().toLowerCase().toString)
    var nw = 0
    var k = 0
    while (k < ws0.length) { if (ws0(k).nonEmpty) nw += 1; k += 1 }
    if (nw == 0) return new GenericInternalRow(out)
    val ws = new Array[String](nw)
    val starts = new Array[Int](nw)
    val ends = new Array[Int](nw)
    var pos = 0
    var j = 0
    k = 0
    while (k < ws0.length) {
      if (ws0(k).nonEmpty) {
        ws(j) = ws0(k)
        starts(j) = pos
        pos += ws0(k).length
        ends(j) = pos
        pos += 1 // the joining space
        j += 1
      }
      k += 1
    }
    out(0) = (pos - 1).toLong // canonical length: last word has no trailing space
    val cs = ws.mkString(" ")
    var n = 2
    while (n <= 10) {
      if (nw >= n) {
        val counts = new java.util.HashMap[String, Long]()
        var i = 0
        while (i + n <= nw) {
          counts.merge(cs.substring(starts(i), ends(i + n - 1)), 1L, (a, b) => a + b)
          i += 1
        }
        if (n <= 4) {
          var mass = 0L
          val it = counts.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            val m = e.getValue * e.getKey.length
            if (m > mass) mass = m
          }
          out(n - 1) = mass
        } else {
          // spans of duplicated grams arrive in ascending start order:
          // union = running-max sweep
          var chars = 0L
          var pmax = 0
          var i = 0
          while (i + n <= nw) {
            if (counts.get(cs.substring(starts(i), ends(i + n - 1))) > 1L) {
              val s = math.max(starts(i), pmax)
              val e = ends(i + n - 1)
              if (e > s) chars += (e - s)
              if (e > pmax) pmax = e
            }
            i += 1
          }
          out(n - 1) = chars
        }
      }
      n += 1
    }
    new GenericInternalRow(out)
  }
}

/** `graft_ngram_rep_stats(text)` — the per-document character-mass
  * statistics behind Gopher's n-gram repetition rules, as one native
  * struct-returning expression.
  *
  * Why native (same argument as [[BigramStats]]): every statistic is a
  * function of ONE document, so a relational form would shuffle every
  * (doc, n, gram, span) row across the cluster — 9 x corpus-token-count
  * exchange rows — to count repeats that never leave their document.
  * Here the whole computation is per-row hash maps bounded by the
  * document's own length, at scan speed inside whole-stage codegen,
  * with zero exchanges.
  */
case class GopherNgramStats(text: Expression) extends UnaryExpression {

  override def prettyName: String = "graft_ngram_rep_stats"
  override def child: Expression = text
  override def dataType: DataType = NgramRepUtil.schema

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName input must be STRING")

  override protected def nullSafeEval(t: Any): Any =
    NgramRepUtil.stats(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.NgramRepUtil.stats($t)")

  override protected def withNewChildInternal(newChild: Expression): GopherNgramStats =
    copy(text = newChild)
}
