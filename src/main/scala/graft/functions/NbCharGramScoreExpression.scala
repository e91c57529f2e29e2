package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_nb_chargram_score(text)` over a FIXED multi-class char-n-gram
  * Naive Bayes model (constructor data — the model is a bounded trained
  * artifact, closure-embedded like [[UnigramSegment]]'s piece table):
  * per document, the 10^6-scaled log-likelihood sum for every class in
  * ONE pass — canonicalize once, walk the classification prefix, one
  * hash lookup per gram, accumulate k longs. Null when the document has
  * no grams (canonically shorter than n).
  *
  * This replaces the relational form (explode grams → broadcast-join
  * the model → doc-keyed aggregate): with a per-row model lookup there
  * is NOTHING to join or shuffle — scoring is pure scan work, the right
  * shape at any corpus size. CodegenFallback is fine here: the per-row
  * work (a few hundred hash probes) dwarfs the interpreted-call
  * overhead, exactly the [[UnigramSegment]] argument.
  */
case class NbCharGramScore(
    text: Expression,
    grams: Seq[String],
    lps: Seq[Seq[Long]],
    unseen: Seq[Long],
    n: Int,
    maxChars: Int)
  extends UnaryExpression with CodegenFallback {

  require(grams.length == lps.length && lps.forall(_.length == unseen.length),
    "NB model tables must align")

  override def prettyName: String = "graft_nb_chargram_score"
  override def child: Expression = text
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName input must be STRING")

  @transient private lazy val table: java.util.HashMap[String, Array[Long]] = {
    val m = new java.util.HashMap[String, Array[Long]](grams.length * 2)
    var i = 0
    while (i < grams.length) { m.put(grams(i), lps(i).toArray); i += 1 }
    m
  }
  @transient private lazy val unseenArr: Array[Long] = unseen.toArray

  override def nullSafeEval(t: Any): Any = {
    // shared canonicalization with the gram expression — the two are
    // halves of the same oracle-parity contract (code-point windows)
    val cps = CharGramsUtil.canonicalCodePoints(t.asInstanceOf[UTF8String], maxChars)
    val len = cps.length
    if (len < n) return null
    val k = unseenArr.length
    val acc = new Array[Long](k)
    var i = 0
    while (i + n <= len) {
      val arr = table.get(new String(cps, i, n))
      val src = if (arr == null) unseenArr else arr
      var j = 0
      while (j < k) { acc(j) += src(j); j += 1 }
      i += 1
    }
    new GenericArrayData(acc)
  }

  override protected def withNewChildInternal(newChild: Expression): NbCharGramScore =
    copy(text = newChild)
}
