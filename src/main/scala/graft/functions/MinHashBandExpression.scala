package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Shared by the interpreted and codegen paths of [[MinHashBandKeys]]
  * and [[SignatureOverlap]].
  */
object MinHashBandUtil {

  /** One packed key per band: (band << 48) | 48-bit mix of the band's
    * signature slice. The mix is a Fibonacci-multiplier polynomial —
    * banding keys only need to be deterministic and well-spread (they
    * generate candidates; nothing downstream depends on the hash
    * function), so a tight loop beats a generic hash(slice(...)).
    */
  def bandKeys(sig: ArrayData, bands: Int): ArrayData = {
    val n = sig.numElements()
    val r = n / bands
    // r == 0 would make every band key the seed constant — the
    // candidate self-join downstream degenerates to a full cross
    // product with no error; a remainder silently ignores the trailing
    // signature positions (reduced recall). Signature length is only
    // known per row, so the guard lives here, not in the type check —
    // one branch per row against a degenerate-join meltdown.
    if (r == 0 || n % bands != 0)
      throw new IllegalArgumentException(
        s"graft_minhash_bands: bands $bands must divide signature length $n")
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      var h = -7046029254386353131L // 0x9E3779B97F4A7C15 seed
      var i = b * r
      val end = i + r
      while (i < end) {
        h = (h ^ sig.getLong(i)) * -7046029254386353131L
        h ^= (h >>> 29)
        i += 1
      }
      out(b) = (b.toLong << 48) | (h & 0xFFFFFFFFFFFFL)
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Count of positions where the two signatures agree (the MinHash
    * Jaccard estimator's numerator). Mismatched lengths compare the
    * common prefix — callers always pass equal-k signatures.
    */
  def overlap(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }
}

/** `graft_minhash_bands(signature, bands)` — banded LSH bucket keys of a
  * MinHash signature as one array<long>, each (band << 48) | bucket.
  *
  * Replaces `posexplode(transform(sequence(0, bands-1), b ->
  * hash(slice(signature, b*r+1, r))))`: higher-order lambdas are
  * interpreted per element and slice allocates per band, so the banding
  * projection ran bands x docs interpreted calls on BOTH sides of the
  * candidate self-join. One static call per row, packed so the join
  * keys on a single long column.
  */
case class MinHashBandKeys(sig: Expression, bandsExpr: Expression)
    extends BinaryExpression {

  override def prettyName: String = "graft_minhash_bands"
  override def left: Expression = sig
  override def right: Expression = bandsExpr
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def sigOk: Boolean = sig.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!sigOk)
      return TypeCheckResult.TypeCheckFailure(s"$prettyName signature must be ARRAY<BIGINT>")
    if (!bandsExpr.foldable || bandsExpr.dataType != IntegerType ||
        bandsExpr.eval() == null || bandsExpr.eval().asInstanceOf[Int] <= 0 ||
        bandsExpr.eval().asInstanceOf[Int] > 65535)
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName bands must be an INT literal in [1, 65535]")
    TypeCheckResult.TypeCheckSuccess
  }

  override protected def nullSafeEval(s: Any, b: Any): Any =
    MinHashBandUtil.bandKeys(s.asInstanceOf[ArrayData], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, b) =>
      s"${ev.value} = graft.functions.MinHashBandUtil.bandKeys($s, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashBandKeys =
    copy(sig = newLeft, bandsExpr = newRight)
}

/** `graft_sig_overlap(a, b)` — positions where two equal-length long
  * signatures agree, i.e. the MinHash Jaccard estimator's numerator.
  * Replaces `aggregate(zip_with(a, b, (p,q) -> if(p=q,1,0)), 0, +)`,
  * which runs two interpreted lambdas per signature position per
  * candidate pair.
  */
case class SignatureOverlap(a: Expression, b: Expression)
    extends BinaryExpression {

  override def prettyName: String = "graft_sig_overlap"
  override def left: Expression = a
  override def right: Expression = b
  override def dataType: DataType = IntegerType

  private def ok(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(a) && ok(b)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName takes two ARRAY<BIGINT>")

  override protected def nullSafeEval(x: Any, y: Any): Any =
    MinHashBandUtil.overlap(x.asInstanceOf[ArrayData], y.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.MinHashBandUtil.overlap($x, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SignatureOverlap =
    copy(a = newLeft, b = newRight)
}
