package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Shared by the interpreted and codegen paths of [[LshBuckets]]. Owns
  * the deterministic hyperplane draw so the expression and the Scala
  * operator layer ([[graft.operators.Similarity]]) can never drift.
  */
object LshBucketUtil {

  private val cache = new java.util.concurrent.ConcurrentHashMap[
    (Int, Int), Array[Array[Double]]]()

  /** `n` deterministic pseudo-random hyperplanes (seed fixed) — the
    * public sign-random-projection construction. Draw order is the
    * canonical row-major fill; every consumer (expression, operator,
    * generated oracle SQL) sees byte-identical planes.
    */
  def hyperplanes(n: Int, dim: Int): Array[Array[Double]] =
    cache.computeIfAbsent((n, dim), _ => {
      val rnd = new scala.util.Random(7)
      Array.fill(n)(Array.fill(dim)(rnd.nextGaussian()))
    })

  /** All `tables` sign-LSH buckets of one vector: element t is table t's
    * bucket (bit i = sign of vec · plane[t*planes + i]). Dot products
    * run in sequential element order, float widened to double — the
    * same arithmetic as [[DotProduct]] and DuckDB's list_dot_product,
    * so buckets are engine-reproducible.
    */
  def buckets(vec: ArrayData, planes: Int, tables: Int, dim: Int,
      isFloat: Boolean): ArrayData = {
    val hps = hyperplanes(planes * tables, dim)
    val n = math.min(vec.numElements(), dim)
    val v = new Array[Double](n)
    var i = 0
    while (i < n) {
      v(i) = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      i += 1
    }
    val out = new Array[Any](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var p = 0
      while (p < planes) {
        val hp = hps(t * planes + p)
        var acc = 0.0
        var j = 0
        while (j < n) { acc += v(j) * hp(j); j += 1 }
        if (acc >= 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_lsh_buckets(vec, planes, tables, dim)` — every hash table's
  * sign-LSH bucket of an embedding in one native call.
  *
  * Replaces a filter predicate built from planes x tables `graft_dot(v,
  * lit(<64 doubles>))` sign tests: each literal plane embedded in
  * generated code made the multi-table probe filter a compile bomb
  * (measured: the ANN probe query spent ~3/4 of its bench time in
  * Janino). Here the plane matrix is a cached static table and the
  * generated code is one call — the scan stays a short codegen span at
  * any (planes, tables).
  */
case class LshBuckets(vec: Expression, planesExpr: Expression,
    tablesExpr: Expression, dimExpr: Expression) extends QuaternaryExpression {

  override def prettyName: String = "graft_lsh_buckets"
  override def first: Expression = vec
  override def second: Expression = planesExpr
  override def third: Expression = tablesExpr
  override def fourth: Expression = dimExpr
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def isFloat: Boolean = vec.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def litOk(e: Expression): Boolean =
    e.foldable && e.dataType == IntegerType && e.eval() != null &&
      e.eval().asInstanceOf[Int] > 0

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = vec.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (!vecOk)
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName vec must be array<float|double>")
    if (!litOk(planesExpr) || !litOk(tablesExpr) || !litOk(dimExpr))
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName planes/tables/dim must be positive INT literals")
    if (planesExpr.eval().asInstanceOf[Int] > 63)
      return TypeCheckResult.TypeCheckFailure(s"$prettyName planes must be <= 63")
    TypeCheckResult.TypeCheckSuccess
  }

  override protected def nullSafeEval(v: Any, p: Any, t: Any, d: Any): Any =
    LshBucketUtil.buckets(v.asInstanceOf[ArrayData], p.asInstanceOf[Int],
      t.asInstanceOf[Int], d.asInstanceOf[Int], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, p, t, d) =>
      s"${ev.value} = graft.functions.LshBucketUtil.buckets($v, $p, $t, $d, $isFloat);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): LshBuckets =
    copy(vec = newFirst, planesExpr = newSecond,
      tablesExpr = newThird, dimExpr = newFourth)
}
