package graft.core

import java.nio.file.{Files, Path, Paths}
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Named, timestamped database snapshots with inventory + restore
  * (≙ `snapshot.py:55-140` — where the reference's `restore`/`delete` are
  * unimplemented stubs, this one works).
  *
  * Layout: `<dir>/<database>.<timestamp>.snapshot/` — a full [[Database.save]]
  * tree plus a `snapshot.json` sidecar (description, created-at). Restore
  * points (`.restore` suffix, ≙ `snapshot.py:31-49`) are written before a
  * restore unless disabled; they are ordinary snapshots and are NOT managed —
  * the reference's contract.
  *
  * Deviation (documented): fact frames and dimension catalogs are immutable
  * handles here, so `restore` returns the freshly loaded [[Database]] rather
  * than mutating the receiver in place; callers swap their reference.
  */
final class SnapshotManager(db: Database, dir: String) {

  final case class SnapshotInfo(id: String, description: String, createdAt: Long, path: String)

  private val snapshots = mutable.LinkedHashMap[String, SnapshotInfo]()
  refresh()

  private def fmt(t: Long): String =
    new java.text.SimpleDateFormat("yyyy-MM-dd-HH-mm-ss-SSS")
      .format(new java.util.Date(t))

  /** Create a snapshot of the database's current state (≙ `create`,
    * `snapshot.py:104-109`).
    */
  def create(description: String = ""): SnapshotInfo = {
    val now = System.currentTimeMillis()
    var id = fmt(now)
    while (snapshots.contains(id)) id = fmt(System.currentTimeMillis())
    val path = s"$dir/${db.name}.$id.snapshot"
    db.save(path)
    // proper JSON serialization: descriptions may contain quotes/newlines/
    // backslashes — a malformed sidecar would poison the whole inventory
    import org.json4s.JsonDSL._
    Files.writeString(Paths.get(s"$path/snapshot.json"),
      org.json4s.jackson.JsonMethods.compact(org.json4s.jackson.JsonMethods.render(
        ("id" -> id) ~ ("description" -> description) ~ ("createdAt" -> now))))
    val info = SnapshotInfo(id, description, now, path)
    snapshots(id) = info
    info
  }

  def list: Seq[SnapshotInfo] = snapshots.values.toSeq.sortBy(_.createdAt)
  def size: Int = snapshots.size
  def apply(id: String): SnapshotInfo = snapshots(id)
  def contains(id: String): Boolean = snapshots.contains(id)
  def latest: Option[SnapshotInfo] = list.lastOption

  private def listDir(p: Path): Seq[Path] = {
    val stream = Files.list(p)
    try stream.iterator().asScala.toList finally stream.close()
  }

  /** Re-scan the snapshot folder (≙ `refresh`, `snapshot.py:121-123`). */
  def refresh(): Unit = {
    snapshots.clear()
    val p = Paths.get(dir)
    if (Files.isDirectory(p)) {
      listDir(p)
        .filter(f => f.getFileName.toString.startsWith(s"${db.name}.") &&
          f.getFileName.toString.endsWith(".snapshot"))
        .sortBy(_.getFileName.toString)
        .foreach { f =>
          readSidecar(f).foreach(info => snapshots(info.id) = info)
        }
    }
  }

  /** One unreadable sidecar must not poison the rest of the inventory. */
  private def readSidecar(f: Path): Option[SnapshotInfo] = {
    val sidecar = f.resolve("snapshot.json")
    if (!Files.exists(sidecar)) None
    else try {
      import org.json4s._
      implicit val fmts: Formats = DefaultFormats
      val j = org.json4s.jackson.JsonMethods.parse(Files.readString(sidecar))
      Some(SnapshotInfo((j \ "id").extract[String], (j \ "description").extract[String],
        (j \ "createdAt").extract[Long], f.toString))
    } catch {
      case e: Exception =>
        System.err.println(s"[graft] skipping unreadable snapshot sidecar $sidecar: ${e.getMessage}")
        None
    }
  }

  /** Load a snapshot back into a Database. Writes a `.restore` safety copy of
    * the CURRENT state first unless disabled (≙ `snapshot.py:31-49` — restore
    * points are not managed by the inventory).
    */
  def restore(id: String, createRestorePoint: Boolean = true): Database = {
    val info = snapshots.getOrElse(id,
      throw new NoSuchElementException(s"unknown snapshot '$id' of database '${db.name}'"))
    if (createRestorePoint)
      db.save(s"$dir/${db.name}.${fmt(System.currentTimeMillis())}.restore")
    Database.load(info.path, db.spark)
  }

  /** Delete snapshots by age bounds (≙ `delete`, `snapshot.py:111-118` — a
    * NotImplementedError there). A full wipe is destructive enough that it
    * must be explicit: pass `all = true`; calling with no bounds and
    * `all = false` is rejected.
    */
  def delete(beforeMillis: Option[Long] = None, afterMillis: Option[Long] = None,
      all: Boolean = false): Int = {
    require(all || beforeMillis.isDefined || afterMillis.isDefined,
      "delete() with no bounds would remove ALL snapshots; pass all = true to confirm")
    val doomed = snapshots.values.filter(s =>
      beforeMillis.forall(s.createdAt < _) && afterMillis.forall(s.createdAt > _)).toSeq
    doomed.foreach { s =>
      deleteRecursively(Paths.get(s.path))
      snapshots.remove(s.id)
    }
    doomed.size
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) listDir(p).foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}
