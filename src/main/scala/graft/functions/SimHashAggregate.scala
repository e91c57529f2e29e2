package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** `graft_simhash(h)` — 64-bit SimHash fingerprint as a
  * TypedImperativeAggregate over per-word hashes: bit i of the result is
  * the sign of the sum over inputs of (+1 if bit i of h is set, else -1).
  *
  * Why an aggregate and not 64 `sum(when((h >> i) & 1 = 1, 1, -1))`
  * columns: that formulation carries 64 aggregate buffers per group and a
  * 64-term CASE/OR assembly projection — a generated method large enough
  * that its codegen COMPILATION dominated the query's cold run. This
  * aggregate keeps one int[64] per group, is map-side combinable
  * (elementwise sum), and assembles the fingerprint in eval.
  *
  * Input rows with a null hash are ignored. An empty group yields the
  * all-zero fingerprint (every bit sum is 0, sign taken as 0 — matching
  * the column formulation where sum > 0 gates each bit).
  */
case class SimHashAgg(
    hash: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Int]] {

  override def prettyName: String = "graft_simhash"
  override def children: Seq[Expression] = Seq(hash)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (hash.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName hash input must be BIGINT")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val hv = hash.eval(input)
    if (hv != null) {
      val h = hv.asInstanceOf[Long]
      var i = 0
      while (i < 64) {
        buf(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1)
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Int], other: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Int]): Any = {
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (buf(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * 64)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getInt)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(hash = newChildren(0))
}
