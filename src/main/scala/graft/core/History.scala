package graft.core

import scala.collection.mutable

/** Undo/redo history (≙ `commands.py:12-60`, `history.py:298-417` — where
  * the reference's `redo` is unimplemented, `history.py:385-395`).
  *
  * Spark-native twist: because fact frames are immutable, every mutation's
  * inverse is simply the previous DataFrame reference — a command log of
  * state handles, O(1) per entry, no value-level deltas. Undo/redo move a
  * cursor over the log and restore (`facts`, overlay) pairs; time-travel is
  * a jump to any logged position.
  */
final class History(cube: Cube) {

  final case class Entry(label: String, state: Cube.State, at: Long)

  private val log = mutable.ArrayBuffer[Entry]()
  private var cursor: Int = -1 // index of the entry matching current state
  private[core] var applying = false

  record("initial")

  /** Called by the cube on every mutation (set/delete/area op/replace). */
  private[core] def record(label: String): Unit = if (!applying) {
    // a new edit truncates the redo tail (standard undo-stack semantics)
    log.remove(cursor + 1, log.length - cursor - 1)
    log += Entry(label, cube.snapshotState(), System.currentTimeMillis())
    cursor = log.length - 1
  }

  def entries: Seq[(String, Long)] = log.toSeq.map(e => (e.label, e.at))
  def position: Int = cursor
  def canUndo: Boolean = cursor > 0
  def canRedo: Boolean = cursor < log.length - 1

  def undo(): Boolean =
    if (!canUndo) false
    else { cursor -= 1; restore(); true }

  def redo(): Boolean =
    if (!canRedo) false
    else { cursor += 1; restore(); true }

  /** Jump to any logged position (≙ time-travel API `history.py:329+`). */
  def goTo(position: Int): Unit = {
    require(position >= 0 && position < log.length, s"position $position out of range")
    cursor = position; restore()
  }

  /** Timestamp-range introspection (≙ `history.py:88-113` any/count). */
  def countBetween(fromMs: Long = Long.MinValue, toMs: Long = Long.MaxValue): Int =
    log.count(e => e.at >= fromMs && e.at <= toMs)
  def anyBetween(fromMs: Long = Long.MinValue, toMs: Long = Long.MaxValue): Boolean =
    log.exists(e => e.at >= fromMs && e.at <= toMs)

  /** Time-travel by TIMESTAMP: restore the state as of `tsMs` — the last
    * entry recorded at or before it (the cursor form of the reference's
    * timestamp-addressed log, `history.py:63-86`). False when `tsMs`
    * precedes the whole log (nothing to restore).
    */
  def goToTime(tsMs: Long): Boolean = {
    val pos = log.lastIndexWhere(_.at <= tsMs)
    if (pos < 0) false
    else { cursor = pos; restore(); true }
  }

  private def restore(): Unit = {
    applying = true
    try cube.restoreState(log(cursor).state)
    finally applying = false
  }
}

/** Per-cell comments with user + timestamp (≙ `comments.py:5-111`). Driver-
  * side catalog metadata (comments are annotations, not data-plane rows).
  */
final class CellComments {
  final case class Comment(text: String, user: String, at: Long)
  private val map = mutable.Map[Vector[Int], mutable.ArrayBuffer[Comment]]()

  def add(ids: Vector[Int], text: String, user: String): Unit =
    map.getOrElseUpdate(ids, mutable.ArrayBuffer()) += Comment(text, user, System.currentTimeMillis())
  def get(ids: Vector[Int]): Seq[Comment] = map.getOrElse(ids, Nil).toSeq
  def remove(ids: Vector[Int]): Unit = map.remove(ids)
  def clear(): Unit = map.clear()
  def count: Int = map.valuesIterator.map(_.size).sum
}
