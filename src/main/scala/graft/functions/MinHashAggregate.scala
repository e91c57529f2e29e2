package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Shared MinHash permutation constants: deterministic affine permutations
  * sig_i(h) = (a_i * h + b_i) mod p over the Mersenne prime p = 2^31-1,
  * from a fixed seed so signatures are reproducible across runs/sessions.
  * a_i is forced odd; products a_i * h stay under 2^62 (no overflow).
  */
object MinHash {
  val MersennePrime: Long = (1L << 31) - 1

  def params(numHashes: Int): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(42)
    val a = Array.fill(numHashes)(math.abs(rnd.nextLong()) % MersennePrime | 1L)
    val b = Array.fill(numHashes)(math.abs(rnd.nextLong()) % MersennePrime)
    // VALIDATE the fixed draw rather than redraw with a safer idiom —
    // changing the draw would change every signature ever persisted.
    // Two latent hazards in the idiom above: `abs % p | 1` can yield
    // exactly p (p is odd), making (a_i*h + b_i) % p constant in h and
    // slot i useless; and abs(Long.MinValue) is NEGATIVE, which would
    // emit negative residues. Neither occurs in the seed-42 stream for
    // any k (checked here on every materialization), so the guard is a
    // tripwire, not a behavior change.
    require(a.forall(x => x > 0L && x != MersennePrime) && b.forall(_ >= 0L),
      "degenerate MinHash parameter draw — see params() scaladoc")
    (a, b)
  }
}

/** `graft_minhash(h, k)` — MinHash signature as a TypedImperativeAggregate:
  * sig[i] = min over input hashes h of (a_i * h + b_i) mod p.
  *
  * Why an aggregate and not posexplode + groupBy(id, i) + collect: the
  * explode materializes k rows per shingle (64x row amplification) and
  * shuffles them twice. This aggregate keeps a k-slot min array per group,
  * is map-side combinable (partial signatures merge with elementwise min),
  * and shuffles exactly one k-long array per group per task — the same
  * shape win as [[TopKRows]].
  *
  * Input rows with a null hash are ignored. Empty groups (no shingles)
  * yield an all-sentinel signature, but the caller's explode-based shingle
  * feed never produces empty groups.
  */
case class MinHashSig(
    hash: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  import MinHash.MersennePrime

  override def prettyName: String = "graft_minhash"
  override def children: Seq[Expression] = Seq(hash, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()
  @transient private lazy val (pa, pb) = MinHash.params(k)

  override def checkInputDataTypes(): TypeCheckResult =
    if (!kExpr.foldable || !GraftAggUtil.integralLiteralType(kExpr))
      TypeCheckResult.TypeCheckFailure(s"$prettyName k must be an integral literal")
    else if (kExpr.eval() == null || kExpr.eval().asInstanceOf[Number].intValue() <= 0)
      TypeCheckResult.TypeCheckFailure(s"$prettyName k must be a positive integer")
    else if (hash.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName hash input must be BIGINT")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val hv = hash.eval(input)
    if (hv != null) {
      // Reduce mod p BEFORE the affine permutation: graft_minhash is a
      // public SQL function, so a caller may feed raw xxhash64 values —
      // unreduced, a_i * h overflows Long and yields negative residues
      // (garbage signatures with no error). For already-reduced input
      // (h < p) floorMod is the identity, so existing signatures are
      // unchanged.
      val h = Math.floorMod(hv.asInstanceOf[Long], MersennePrime)
      var i = 0
      while (i < k) {
        val v = (pa(i) * h + pb(i)) % MersennePrime
        if (v < buf(i)) buf(i) = v
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) {
      if (other(i) < buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * k)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSig =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSig =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashSig =
    copy(hash = newChildren(0), kExpr = newChildren(1))
}
