package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** One-pass MinHash signature aggregate: for each group, the k-slot array
  * `sig[i] = min over rows of perm_i(h)` where `h` is the input word hash and
  * `perm_i` is the i-th member of a fixed bijective hash family (splitmix64
  * finalizer over `h ^ seed_i` — JVM wrapping multiply, no ANSI concerns).
  *
  * Exists because the expression-level formulation (posexplode of a k-wide
  * hash array, then two groupBys) amplifies every (doc, word) row ×k into the
  * shuffle — 43% of the round-1 bench. This aggregate keeps ONE row per
  * (doc, word) and holds the running k mins in a single `long[]` buffer with
  * map-side partial aggregation (ObjectHashAggregate), so the shuffle carries
  * one k·8-byte sketch per (group, partition).
  *
  * MinHash is multiset-insensitive (min over duplicates == min over the set),
  * so callers can skip the distinct-words shuffle entirely.
  */
case class MinHashSketch(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(k > 0 && k <= 1024, "1..1024 minhash slots")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"graft_minhash expects BIGINT, got $dt")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"

  // deterministic per-slot seeds (splitmix64 stream)
  private lazy val seeds: Array[Long] = MinHashSketch.seedsFor(k)

  override def createAggregationBuffer(): Array[Long] = Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val ss = seeds
      var i = 0
      while (i < k) {
        val g = MinHashSketch.mix(h ^ ss(i))
        if (g < buf(i)) buf(i) = g
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any =
    if (buf.forall(_ == Long.MaxValue)) null // all-null input group
    else new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashSketch =
    copy(child = newChild)
}

object MinHashSketch {
  /** splitmix64 finalizer — a bijection on Long, so each seed induces an
    * independent pseudo-permutation of the word-hash space.
    */
  @inline def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Deterministic per-slot seeds (splitmix64 stream from 42). */
  def seedsFor(k: Int): Array[Long] = {
    val out = new Array[Long](k)
    var s = 42L
    var i = 0
    while (i < k) { s += 0x9E3779B97F4A7C15L; out(i) = mix(s); i += 1 }
    out
  }

  /** Aggregate Column: k-slot MinHash signature of a BIGINT hash column. */
  def apply(h: Column, k: Int): Column =
    Bridge.column(MinHashSketch(Bridge.expression(h), k).toAggregateExpression())
}
