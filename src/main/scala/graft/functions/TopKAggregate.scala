package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Shared literal-argument checks for the typed aggregates. */
private[functions] object GraftAggUtil {
  /** True when the expression's type can be read as an integral k —
    * checked BEFORE any `asInstanceOf[Number]` so a string literal
    * fails analysis cleanly instead of throwing ClassCastException,
    * and a fractional literal is rejected instead of silently
    * truncating.
    */
  def integralLiteralType(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }
}

/** Bounded top-k kept during update/merge: at most k (key, value) pairs
  * with the smallest keys, as a max-heap so the current worst is O(1).
  */
final class TopKBuffer(val k: Int, ord: Ordering[Any]) {
  // max-first priority queue on the key
  val heap: mutable.PriorityQueue[(Any, Any)] =
    mutable.PriorityQueue.empty[(Any, Any)](Ordering.by[(Any, Any), Any](_._1)(ord))

  def insert(key: Any, value: Any): Unit =
    if (heap.size < k) heap.enqueue((key, value))
    else if (ord.lt(key, heap.head._1)) { heap.dequeue(); heap.enqueue((key, value)) }

  /** True when [[insert]] would keep this key — callers use it to skip
    * materializing the VALUE for the overwhelming majority of rows a
    * full heap rejects (safe on the un-copied key: only compared, never
    * stored).
    */
  def wouldAccept(key: Any): Boolean =
    heap.size < k || ord.lt(key, heap.head._1)

  def sortedValues(implicitOrd: Ordering[Any]): Array[Any] =
    heap.toArray.sortBy(_._1)(implicitOrd).map(_._2)
}

/** `graft_topk(key, value, k)` — exact per-group top-k as a
  * TypedImperativeAggregate.
  *
  * Why an aggregate and not `row_number().over(Window.partitionBy(g))`:
  * a window shuffles every input row to the reducer owning its group —
  * with few groups that is the whole table through a handful of tasks.
  * An aggregate does map-side partial aggregation: each task keeps a
  * k-element heap per group and the shuffle carries only
  * `k * tasks * groups` rows, independent of input size. That is the
  * difference between "top 3 per category over 100 TB" being a full-table
  * shuffle or a few kilobytes.
  *
  * Returns `array<valueType>` sorted by key ascending (smallest-key
  * first); callers encode DESC orderings by negating/inverting the key.
  * Rows with a null key are ignored, matching SQL aggregate semantics.
  */
case class TopKRows(
    key: Expression,
    value: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] {

  override def prettyName: String = "graft_topk"
  override def children: Seq[Expression] = Seq(key, value, kExpr)
  override def nullable: Boolean = false
  // a non-null key can carry a NULL value — the heap stores it, so the
  // array's containsNull must follow the value's nullability (a false
  // promise here lets downstream codegen elide null checks and read
  // garbage)
  override def dataType: DataType =
    ArrayType(value.dataType, containsNull = value.nullable)

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()
  @transient private lazy val ord: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(key.dataType)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!kExpr.foldable || !GraftAggUtil.integralLiteralType(kExpr)) {
      // type check BEFORE the Number cast: a string literal would throw
      // ClassCastException out of analysis, a fractional literal would
      // silently truncate
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName k must be an integral literal")
    } else if (kExpr.eval() == null ||
        kExpr.eval().asInstanceOf[Number].intValue() <= 0) {
      TypeCheckResult.TypeCheckFailure(s"$prettyName k must be a positive integer")
    } else {
      TypeUtils.checkForOrderingExpr(key.dataType, prettyName)
    }
  }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k, ord)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val kv = key.eval(input)
    // gate BEFORE touching the value: once the heap is full, almost
    // every row is rejected on the key alone, and evaluating + deep-
    // copying the (often wide) payload struct for rejected rows was
    // the aggregate's dominant per-row cost (measured ~35% off the
    // q_window_topk scan). The key compare runs on the un-copied eval
    // result; copies happen only for the <= k accepted rows.
    if (kv != null && buf.wouldAccept(kv)) {
      // copy: Spark reuses the underlying row/array buffers between rows
      buf.insert(InternalRow.copyValue(kv), InternalRow.copyValue(value.eval(input)))
    }
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    other.heap.foreach { case (kv, vv) => buf.insert(kv, vv) }
    buf
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.sortedValues(ord))

  // ---- shuffle format: each (key, value) pair as one UnsafeRow ----

  @transient private lazy val pairProj =
    UnsafeProjection.create(Array(key.dataType, value.dataType))
  @transient private lazy val pairRow = new UnsafeRow(2)

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val rows = buf.heap.toArray.map { case (kv, vv) =>
      // copy() before getBytes: UnsafeProjection reuses one backing buffer,
      // and for exactly-sized (fixed-width) rows getBytes returns that
      // buffer UNCOPIED — without the copy every serialized pair aliases
      // the last one written.
      pairProj(InternalRow(kv, vv)).copy().getBytes
    }
    val size = 4 + rows.map(4 + _.length).sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(rows.length)
    rows.foreach { r => bb.putInt(r.length); bb.put(r) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val buf = new TopKBuffer(k, ord)
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      pairRow.pointTo(arr, len)
      buf.insert(
        InternalRow.copyValue(pairRow.get(0, key.dataType)),
        InternalRow.copyValue(pairRow.get(1, value.dataType)))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKRows =
    copy(key = newChildren(0), value = newChildren(1), kExpr = newChildren(2))
}
