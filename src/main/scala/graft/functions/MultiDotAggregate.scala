package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_multi_dot(word, w)` — document-at-a-time sparse retrieval
  * scoring: ALL queries' dot products for one document in a single pass
  * over its posting rows.
  *
  * The query side of a k-NN batch is bounded (it is the request, not
  * the corpus), so its postings ship as constructor data — a
  * closure-embedded `word -> [(queryIdx, weight)]` table, the same
  * artifact-by-closure pattern as [[UnigramSegment]]. Per input row the
  * aggregate probes the table once and accumulates `qw * w` into the
  * hit queries' slots; buffers hold 2k longs per GROUP (k dots + k
  * shared-term counts — the count preserves the pair-existence
  * semantics of the posting equi-join it replaces: a (query, doc) pair
  * exists iff the two share at least one indexed term).
  *
  * Why this beats the query-at-a-time equi-join it replaces: the join
  * materializes and SHUFFLES one row per (query term, matching doc) —
  * sum over query terms of df(term) rows (2.3M at sf0.1, the measured
  * cost center of q_sparse_knn) — just to re-group them by (query,
  * doc). Here the posting table is scanned ONCE, partials combine
  * map-side per doc id, and the exchange carries one 2k-long buffer
  * per (doc, task). Exact integer arithmetic throughout (the weights
  * are the index's 10^4-scaled longs), so the result is bit-identical
  * to the join form.
  */
case class MultiDotScore(
    word: Expression,
    w: Expression,
    queryWords: Seq[String],
    hitIdx: Seq[Seq[Int]],
    hitW: Seq[Seq[Long]],
    nQueries: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(queryWords.length == hitIdx.length && hitIdx.length == hitW.length,
    "query posting tables must align")

  override def prettyName: String = "graft_multi_dot"
  override def children: Seq[Expression] = Seq(word, w)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (word.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName word must be STRING")
    else if (w.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName w must be BIGINT")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val table
      : java.util.HashMap[String, (Array[Int], Array[Long])] = {
    val m = new java.util.HashMap[String, (Array[Int], Array[Long])](
      queryWords.length * 2)
    var i = 0
    while (i < queryWords.length) {
      m.put(queryWords(i), (hitIdx(i).toArray, hitW(i).toArray))
      i += 1
    }
    m
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](2 * nQueries)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val wv = word.eval(input)
    val wt = w.eval(input)
    if (wv != null && wt != null) {
      val hit = table.get(wv.asInstanceOf[UTF8String].toString)
      if (hit != null) {
        val (idx, qws) = hit
        val wl = wt.asInstanceOf[Long]
        var i = 0
        while (i < idx.length) {
          buf(idx(i)) += qws(i) * wl
          buf(nQueries + idx(i)) += 1L
          i += 1
        }
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MultiDotScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MultiDotScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MultiDotScore =
    copy(word = newChildren(0), w = newChildren(1))
}
