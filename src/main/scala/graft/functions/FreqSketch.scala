package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitters sketch (Metwally et al.): tracks at most
  * `capacity` distinct tokens with per-token (count, err) where
  * `count ≥ true ≥ count − err`; any token whose true frequency exceeds
  * n / capacity is GUARANTEED to be tracked. An untracked arrival evicts
  * the current minimum m and enters at (m + 1, m).
  *
  * Exists because exact token frequencies shuffle the WHOLE vocabulary —
  * at 100 TB with n-gram tokens that is a corpus-sized aggregation for an
  * answer whose useful part is the top few hundred rows. This aggregate
  * holds one bounded buffer per partition (ObjectHashAggregate, map-side
  * partial), and the shuffle carries `capacity`-entry sketches, not the
  * vocabulary. Merging follows SpaceSaving±: a key absent from a FULL
  * sketch is assumed at that sketch's minimum count (with the same error),
  * then the union is re-truncated to `capacity` — the overestimate
  * invariant survives merging, so the containment guarantee holds for the
  * merged stream.
  *
  * The eviction scan is O(capacity) (hit on untracked arrivals only, which
  * Zipfian text makes rare); capacity is capped so the worst case stays a
  * few hundred long-compares per row. A stream-summary bucket list would
  * make it O(1) — the upgrade path if a uniform-vocabulary corpus ever
  * makes the scan dominant.
  *
  * Output is deterministic GIVEN the buffer (sorted count desc, token asc),
  * but tail entries below the n/capacity guarantee depend on arrival order
  * like every SpaceSaving sketch — gates therefore check guaranteed
  * containment of the exact head, not hash equality.
  */
case class FreqSketch(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[String, Array[Long]]]
    with UnaryLike[Expression] {

  require(capacity > 0 && capacity <= 4096, "1..4096 heavy-hitter slots")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"graft_freq expects STRING, got $dt")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_freq"

  type Buf = java.util.HashMap[String, Array[Long]]

  override def createAggregationBuffer(): Buf = new java.util.HashMap()

  private def minEntry(buf: Buf): java.util.Map.Entry[String, Array[Long]] = {
    var m: java.util.Map.Entry[String, Array[Long]] = null
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (m == null || e.getValue()(0) < m.getValue()(0)) m = e
    }
    m
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val tok = v.asInstanceOf[UTF8String].toString
      val cur = buf.get(tok)
      if (cur != null) cur(0) += 1
      else if (buf.size() < capacity) buf.put(tok, Array(1L, 0L))
      else {
        val m = minEntry(buf)
        val mc = m.getValue()(0)
        buf.remove(m.getKey)
        buf.put(tok, Array(mc + 1, mc))
      }
    }
    buf
  }

  override def merge(b1: Buf, b2: Buf): Buf = {
    // a key absent from a FULL sketch may have occurred up to that
    // sketch's min count times there — assume exactly that (same err)
    def floorOf(b: Buf): Long =
      if (b.size() < capacity) 0L
      else { val m = minEntry(b); if (m == null) 0L else m.getValue()(0) }
    val f1 = floorOf(b1); val f2 = floorOf(b2)
    val out = new java.util.HashMap[String, Array[Long]]()
    val keys = new java.util.HashSet[String](b1.keySet()); keys.addAll(b2.keySet())
    val ki = keys.iterator()
    while (ki.hasNext) {
      val k = ki.next()
      val e1 = b1.get(k); val e2 = b2.get(k)
      val c = (if (e1 != null) e1(0) else f1) + (if (e2 != null) e2(0) else f2)
      val e = (if (e1 != null) e1(1) else f1) + (if (e2 != null) e2(1) else f2)
      out.put(k, Array(c, e))
    }
    if (out.size() <= capacity) out
    else {
      // keep the top `capacity` by (count desc, token asc) — deterministic
      val entries = new java.util.ArrayList(out.entrySet())
      entries.sort { (a, b) =>
        val c = java.lang.Long.compare(b.getValue()(0), a.getValue()(0))
        if (c != 0) c else a.getKey.compareTo(b.getKey)
      }
      val trimmed = new java.util.HashMap[String, Array[Long]]()
      var i = 0
      while (i < capacity) {
        val e = entries.get(i); trimmed.put(e.getKey, e.getValue); i += 1
      }
      trimmed
    }
  }

  override def eval(buf: Buf): Any = {
    val entries = new java.util.ArrayList(buf.entrySet())
    entries.sort { (a, b) =>
      val c = java.lang.Long.compare(b.getValue()(0), a.getValue()(0))
      if (c != 0) c else a.getKey.compareTo(b.getKey)
    }
    val rows = new Array[Any](entries.size())
    var i = 0
    while (i < entries.size()) {
      val e = entries.get(i)
      rows(i) = new GenericInternalRow(Array[Any](
        UTF8String.fromString(e.getKey), e.getValue()(0), e.getValue()(1)))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: Buf): Array[Byte] = {
    var n = 4
    val it0 = buf.entrySet().iterator()
    val items = new java.util.ArrayList[(Array[Byte], Array[Long])](buf.size())
    while (it0.hasNext) {
      val e = it0.next()
      val kb = e.getKey.getBytes(StandardCharsets.UTF_8)
      items.add((kb, e.getValue))
      n += 4 + kb.length + 16
    }
    val bb = ByteBuffer.allocate(n)
    bb.putInt(items.size())
    var i = 0
    while (i < items.size()) {
      val (kb, v) = items.get(i)
      bb.putInt(kb.length); bb.put(kb); bb.putLong(v(0)); bb.putLong(v(1))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = new java.util.HashMap[String, Array[Long]]()
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](bb.getInt); bb.get(kb)
      out.put(new String(kb, StandardCharsets.UTF_8),
        Array(bb.getLong, bb.getLong))
      i += 1
    }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqSketch =
    copy(child = newChild)
}

object FreqSketch {
  /** Aggregate Column: SpaceSaving heavy-hitters over a STRING column. */
  def apply(tok: Column, capacity: Int): Column =
    Bridge.column(FreqSketch(Bridge.expression(tok), capacity).toAggregateExpression())
}
