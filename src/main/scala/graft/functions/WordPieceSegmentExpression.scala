package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match-first WordPiece segmentation (the published
  * BERT encode rule — Schuster & Nakajima 2012; Devlin et al. 2019,
  * "WordPiece tokenization"): scan left to right, at each position take
  * the LONGEST vocabulary piece that matches ('##'-prefixed when not
  * word-initial), and if no piece matches at some position the whole
  * word becomes the single `[UNK]` token.
  *
  * The rule is deliberately NOT the merge-replay segmentation of the
  * BPE family: a trained WordPiece vocabulary is applied by MaxMatch,
  * so two different training histories that produce the same piece set
  * encode identically — which is exactly what an external oracle can
  * replay position by position.
  */
object WordPieceSegmentUtil {

  val Unk = "[UNK]"

  /** MaxMatch segmentation of `word` against `vocab` (which holds the
    * word-initial pieces plain and continuation pieces '##'-prefixed).
    * `maxLen` bounds candidate piece length in CHARACTERS OF THE WORD
    * (the '##' prefix is not counted). Deterministic with no tie to
    * break: at a given position, piece length alone decides.
    */
  def segment(word: String, vocab: java.util.HashSet[String],
      maxLen: Int): Array[String] = {
    val n = word.length
    if (n == 0) return Array.empty
    val out = new scala.collection.mutable.ArrayBuffer[String](4)
    var pos = 0
    while (pos < n) {
      var l = math.min(maxLen, n - pos)
      var hit: String = null
      while (l >= 1 && hit == null) {
        val raw = word.substring(pos, pos + l)
        val cand = if (pos == 0) raw else "##" + raw
        if (vocab.contains(cand)) hit = cand
        l -= 1
      }
      if (hit == null) return Array(Unk)
      out += hit
      pos += hit.length - (if (pos == 0) 0 else 2)
    }
    out.toArray
  }
}

/** `graft_wordpiece_segment(word)` over a FIXED trained vocabulary
  * (constructor data, broadcast by closure like the BPE merge literal
  * and the unigram piece table). Returns the piece array, or the
  * single-element `[UNK]` array when MaxMatch fails.
  *
  * CodegenFallback on purpose, same rationale as
  * [[UnigramSegment]]: segmentation runs once per DISTINCT word
  * (vocabulary scale — the corpus stream reduces to (word, freq)
  * before this expression everywhere it is used), so interpreted eval
  * never sits on a corpus-scale hot path.
  */
case class WordPieceSegment(word: Expression, vocab: Seq[String])
  extends UnaryExpression with CodegenFallback {

  require(vocab.nonEmpty, "wordpiece vocabulary must be non-empty")

  override def prettyName: String = "graft_wordpiece_segment"
  override def child: Expression = word
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (word.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName input must be STRING")

  @transient private lazy val table: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.length * 2)
    vocab.foreach(s.add)
    s
  }

  /** Longest candidate in WORD characters: '##' prefixes do not count. */
  @transient private lazy val maxLen: Int =
    vocab.iterator.map(p => if (p.startsWith("##")) p.length - 2 else p.length).max

  override def nullSafeEval(w: Any): Any = {
    val segs = WordPieceSegmentUtil.segment(
      w.asInstanceOf[UTF8String].toString, table, maxLen)
    new GenericArrayData(segs.map(UTF8String.fromString(_)).asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieceSegment =
    copy(word = newChild)
}
