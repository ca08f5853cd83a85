package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** One-pass 64-bit SimHash aggregate: per group, bit `p` of the result is
  * set iff `Σ rows (((h >>> p) & 1) · 2 − 1) > 0` — the per-bit ±1 vote sum
  * over the input word hashes, identical to 64 separate `sum(...)` aggregate
  * columns but held in ONE long[64] buffer.
  *
  * Exists for the same reason as [[MinHashSketch]]: 64 separate aggregate
  * columns generate O(64)-sized codegen that janino recompiles inside every
  * enclosing plan, and each column carries its own buffer slot through the
  * shuffle. Input must be DISTINCT per group where set semantics are wanted —
  * unlike min, vote sums are multiset-sensitive.
  */
case class SimHashBits(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"graft_simhash expects BIGINT, got $dt")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash"

  // slot 64 counts non-null inputs so an all-null/empty group evals to null
  // (mirroring MinHashSketch) instead of an all-zero signature that would
  // read as hamming-0 "identical" to another empty group.
  override def createAggregationBuffer(): Array[Long] = new Array[Long](65)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var p = 0
      while (p < 64) {
        buf(p) += ((h >>> p) & 1L) * 2 - 1
        p += 1
      }
      buf(64) += 1
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var p = 0
    while (p < 65) { b1(p) += b2(p); p += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    if (buf(64) == 0) return null
    var bits = 0L
    var p = 0
    while (p < 64) { if (buf(p) > 0) bits |= (1L << p); p += 1 }
    bits
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashBits =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashBits =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SimHashBits =
    copy(child = newChild)
}

object SimHashBits {
  /** Aggregate Column: 64-bit SimHash of a BIGINT hash column. */
  def apply(h: Column): Column =
    Bridge.column(SimHashBits(Bridge.expression(h)).toAggregateExpression())
}
