package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries summary: at most k counters, plus the total weight ever
  * removed by decrements (`spilled`). Invariants that make the sketch
  * externally checkable:
  *
  *  - est(x) <= true(x)            (counters only ever under-count)
  *  - true(x) - spilled <= est(x)  (each decrement event / merge
  *                                  subtraction costs any single item at
  *                                  most its amount, and `spilled` sums
  *                                  exactly those amounts)
  *
  * so any item with true frequency above `spilled` is GUARANTEED present,
  * and `spilled <= n/(k+1)` gives the classic deterministic bound.
  */
final class MgBuffer(val k: Int) {
  val counts = new java.util.HashMap[String, Long]()
  var spilled: Long = 0L

  def add(item: String, w: Long): Unit = {
    // getOrDefault: a bare get() returns null for a missing key and
    // Scala's auto-unboxing would NPE. Counters are always > 0.
    val cur = counts.getOrDefault(item, 0L)
    if (cur > 0L) {
      counts.put(item, cur + w)
    } else if (counts.size < k) {
      counts.put(item, w)
    } else {
      // miss with a full table: decrement everything by the incoming
      // weight (amortized O(1) per increment for unit weights), dropping
      // the incoming item too — one spill event of weight w.
      spilled += w
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val nv = e.getValue - w
        if (nv > 0) e.setValue(nv) else it.remove()
      }
    }
  }

  /** Standard mergeable-summaries shrink: after pointwise addition, if
    * over capacity subtract the (k+1)-th largest count from everything
    * and keep the strictly-positive survivors. "Strictly greater than
    * the cut" is deliberate — it makes the surviving SET independent of
    * tie-breaking, so the result depends only on the merged multiset.
    */
  def shrinkTo(cap: Int): Unit = {
    if (counts.size > cap) {
      val values = new Array[Long](counts.size)
      var i = 0
      val vit = counts.values().iterator()
      while (vit.hasNext) { values(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(values)
      val cut = values(values.length - cap - 1) // (cap+1)-th largest
      spilled += cut
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val nv = e.getValue - cut
        if (nv > 0) e.setValue(nv) else it.remove()
      }
    }
  }
}

/** `graft_heavyhitters(item, k)` — mergeable Misra–Gries heavy-hitter
  * summary as a TypedImperativeAggregate.
  *
  * Why a sketch and not `GROUP BY item ORDER BY count DESC LIMIT k`: the
  * exact form shuffles one record per DISTINCT item — at 100 TB of text
  * that is billions of group keys through the exchange just to read off
  * the top handful. The sketch holds k counters per task, the shuffle
  * carries k rows per task, and the deterministic error bound
  * (`spilled`, at most n/(k+1)) is part of the output, so downstream can
  * certify every item whose true count exceeds it.
  *
  * Returns `struct<spilled: bigint, items: array<struct<item: string,
  * est: bigint>>>` with items sorted by item ascending (a total,
  * engine-reproducible order).
  */
case class HeavyHitters(
    item: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MgBuffer] {

  override def prettyName: String = "graft_heavyhitters"
  override def children: Seq[Expression] = Seq(item, kExpr)
  override def nullable: Boolean = false

  private val itemsType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  override def dataType: DataType = StructType(Seq(
    StructField("spilled", LongType, nullable = false),
    StructField("items", itemsType, nullable = false)))

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult = {
    if (item.dataType != StringType) {
      TypeCheckResult.TypeCheckFailure(s"$prettyName item must be STRING")
    } else if (!kExpr.foldable || !GraftAggUtil.integralLiteralType(kExpr) ||
        kExpr.eval() == null ||
        kExpr.eval().asInstanceOf[Number].intValue() <= 0) {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName k must be a positive integral literal")
    } else {
      TypeCheckResult.TypeCheckSuccess
    }
  }

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(k)

  override def update(buf: MgBuffer, input: InternalRow): MgBuffer = {
    val v = item.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(buf: MgBuffer, other: MgBuffer): MgBuffer = {
    buf.spilled += other.spilled
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = buf.counts.getOrDefault(e.getKey, 0L)
      buf.counts.put(e.getKey, cur + e.getValue)
    }
    buf.shrinkTo(k)
    buf
  }

  override def eval(buf: MgBuffer): Any = {
    val items = new Array[(String, Long)](buf.counts.size)
    var i = 0
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      items(i) = (e.getKey, e.getValue)
      i += 1
    }
    val sorted = items.sortBy(_._1)
    new GenericInternalRow(Array[Any](
      buf.spilled,
      new GenericArrayData(sorted.map { case (s, c) =>
        new GenericInternalRow(Array[Any](UTF8String.fromString(s), c))
      })))
  }

  override def serialize(buf: MgBuffer): Array[Byte] = {
    val entries = new scala.collection.mutable.ArrayBuffer[(Array[Byte], Long)](buf.counts.size)
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      entries += ((e.getKey.getBytes(StandardCharsets.UTF_8), e.getValue))
    }
    val size = 8 + 4 + entries.map(e => 4 + e._1.length + 8).sum
    val bb = ByteBuffer.allocate(size)
    bb.putLong(buf.spilled)
    bb.putInt(entries.size)
    entries.foreach { case (b, c) => bb.putInt(b.length); bb.put(b); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MgBuffer = {
    val buf = new MgBuffer(k)
    val bb = ByteBuffer.wrap(bytes)
    buf.spilled = bb.getLong
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      buf.counts.put(new String(arr, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHitters =
    copy(item = newChildren(0), kExpr = newChildren(1))
}
