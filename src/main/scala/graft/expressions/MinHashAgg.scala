package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** MinHash signature as a single custom aggregate (SURVEY §4.3's
  * optional UDAF tier — `TypedImperativeAggregate`, the same mechanism
  * behind Spark's own percentile/HLL aggregates).
  *
  * Input: one 64-bit shingle hash per row (`Dedup.shingleHashes`).
  * Buffer: the `numPerm` running minima, updated in ONE pass — the
  * composed-expression form (`Dedup.minHashSignatures`) evaluates
  * numPerm separate `min(xxhash64(p, h0))` aggregate expressions over
  * the same rows; this buffer computes all of them per input row and
  * ships ONE `numPerm·8`-byte buffer through partial/final aggregation
  * instead of numPerm separate min states.
  *
  * Bit-compatibility: the per-permutation rehash replicates
  * `xxhash64(lit(p), h0)` exactly — Spark's XxHash64 folds its
  * arguments left-to-right from seed 42, so permutation p's value is
  * `hash(h0, LongType, hash(p, IntegerType, 42))`. MinHashAggSpec
  * asserts equality with the composed form on real docs.
  */
case class MinHashAgg(child: Expression, numPerm: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with ImplicitCastInputTypes {

  require(numPerm > 0, s"minhash_sig numPerm must be positive, got $numPerm")

  // analysis-time contract: input coerces to BIGINT (an INT hash column
  // auto-casts; a STRING column fails analysis cleanly instead of
  // throwing ClassCastException mid-query). Return type inferred:
  // AbstractDataType is private[sql] in Spark 4 and can't be named here.
  override def inputTypes = Seq(LongType)

  // seeds precomputed once: hash(p, IntegerType, 42) per permutation
  private lazy val permSeeds: Array[Long] =
    Array.tabulate(numPerm)(p => XxHash64Function.hash(p, IntegerType, 42L))

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numPerm)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h0 = v.asInstanceOf[Long]
      var p = 0
      while (p < numPerm) {
        val h = XxHash64Function.hash(h0, LongType, permSeeds(p))
        if (h < buf(p)) buf(p) = h
        p += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var p = 0
    while (p < numPerm) { if (b(p) < a(p)) a(p) = b(p); p += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(numPerm * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numPerm)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "minhash_sig"
}

object MinHashAgg {
  /** Column API: `minhash_sig(shingleHash, numPerm)` → ARRAY<BIGINT>. */
  def minhash_sig(shingleHash: Column, numPerm: Int): Column =
    GraftBridge.column(
      MinHashAgg(GraftBridge.expression(shingleHash), numPerm)
        .toAggregateExpression())
}

/** 64-bit SimHash as a single custom aggregate over raw token-hash
  * occurrences: bit i of the result is set when more occurrences voted
  * 1 than 0 at that bit. One buffer of 64 vote counters replaces BOTH
  * stages of the composed form (`Dedup.simHash`'s per-(doc, token)
  * count pre-aggregation and its 64 weighted bit-vote sums) — each
  * occurrence votes ±1 directly, which equals the count-weighted vote
  * by commutativity, so the signature is bit-identical
  * (SimHashAggSpec). */
case class SimHashAgg(child: Expression,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with ImplicitCastInputTypes {

  override def inputTypes = Seq(LongType)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < 64) { buf(i) += ((h >>> i) & 1L) * 2 - 1; i += 1 }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    var sig = 0L
    var i = 0
    while (i < 64) { if (buf(i) > 0) sig |= (1L << i); i += 1 }
    sig
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(64 * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getLong)
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "simhash_sig"
}

object SimHashAgg {
  /** Column API: `simhash_sig(tokenHash)` → BIGINT signature. */
  def simhash_sig(tokenHash: Column): Column =
    GraftBridge.column(
      SimHashAgg(GraftBridge.expression(tokenHash)).toAggregateExpression())
}
