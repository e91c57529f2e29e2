package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Exact Viterbi segmentation under a unigram piece model — the E-step
  * and encode primitive of the SentencePiece-style trainer
  * ([[graft.operators.TermIndex.trainUnigram]]).
  *
  * All arithmetic is INTEGER: piece log-probabilities arrive as
  * 10^6-scaled longs (floor-rounded — see the trainer's parity note),
  * path scores are long sums, and the tie-break is total — maximize
  * (score, then piece length), so two engines replaying the same DP
  * always choose the same segmentation. A word containing a character
  * absent from the piece table (impossible for the training corpus,
  * possible for later encode input) falls back to its per-character
  * split with unknown characters kept as 1-char pieces.
  */
object UnigramSegmentUtil {

  /** Best segmentation of `word`: forward DP over positions, candidates
    * are the table pieces ending at each position (length <= maxLen),
    * argmax by (score, piece length); then one backtrace pass.
    */
  def segment(word: String, lp: java.util.HashMap[String, java.lang.Long],
      maxLen: Int): Array[String] = {
    val n = word.length
    if (n == 0) return Array.empty
    val best = new Array[Long](n + 1)
    val bl = new Array[Int](n + 1)
    java.util.Arrays.fill(best, Long.MinValue)
    best(0) = 0L
    var pos = 1
    while (pos <= n) {
      var l = 1
      while (l <= maxLen && l <= pos) {
        if (best(pos - l) != Long.MinValue) {
          val w = lp.get(word.substring(pos - l, pos))
          if (w != null) {
            val sc = best(pos - l) + w.longValue()
            if (sc > best(pos) || (sc == best(pos) && l > bl(pos))) {
              best(pos) = sc
              bl(pos) = l
            }
          }
        }
        l += 1
      }
      pos += 1
    }
    if (best(n) == Long.MinValue) {
      // unknown character somewhere: per-character fallback
      val out = new Array[String](n)
      var i = 0
      while (i < n) { out(i) = word.substring(i, i + 1); i += 1 }
      return out
    }
    var cnt = 0
    pos = n
    while (pos > 0) { cnt += 1; pos -= bl(pos) }
    val out = new Array[String](cnt)
    pos = n
    var k = cnt - 1
    while (pos > 0) {
      out(k) = word.substring(pos - bl(pos), pos)
      k -= 1
      pos -= bl(pos)
    }
    out
  }
}

/** `graft_unigram_segment(word)` over a FIXED piece table (constructor
  * data, not child expressions — the table is a bounded trained
  * artifact, broadcast by closure like the BPE merge literal). Returns
  * the chosen piece array.
  *
  * CodegenFallback on purpose: the expression runs once per DISTINCT
  * word (vocabulary scale — the corpus stream reduces to (word, freq)
  * before segmentation everywhere it is used), so interpreted eval is
  * never on a corpus-scale hot path, and fallback keeps the piece-map
  * state a plain `@transient lazy val` instead of generated-code
  * plumbing.
  */
case class UnigramSegment(word: Expression, pieces: Seq[String],
    logps: Seq[Long], maxPieceLen: Int)
  extends UnaryExpression with CodegenFallback {

  require(pieces.length == logps.length,
    "unigram piece/logp tables must align")

  override def prettyName: String = "graft_unigram_segment"
  override def child: Expression = word
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (word.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName input must be STRING")

  @transient private lazy val table: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
    var i = 0
    while (i < pieces.length) {
      m.put(pieces(i), java.lang.Long.valueOf(logps(i)))
      i += 1
    }
    m
  }

  override def nullSafeEval(w: Any): Any = {
    val segs = UnigramSegmentUtil.segment(
      w.asInstanceOf[UTF8String].toString, table, maxPieceLen)
    new GenericArrayData(segs.map(UTF8String.fromString(_)).asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramSegment =
    copy(word = newChild)
}
