package graft.core

/** Navigable pointer to one cube cell (≙ `cell.py:15` — the reference's
  * central user-facing object): read/write by position, derive sibling cells
  * (`alter`, `shift`), numeric convenience operators. Driver-side sugar over
  * the same read path as `cube.get`.
  */
final class Cell(val cube: Cube, val ids: Vector[Int]) {

  private def boltOf: Bolt = Bolt(
    ids.zipWithIndex.map { case (id, i) => cube.dimensions(i).levelOf(id) }.sum, ids)

  /** Member names, one per dimension. */
  def address: Seq[String] =
    ids.zipWithIndex.map { case (id, i) => cube.dimensions(i).nameOf(id) }

  def value: Option[Double] = cube.getByBolt(boltOf)
  /** Typed read: numbers, text payloads, error sentinels. */
  def typedValue: Option[CellValue] = cube.getCell(address)
  def set(v: Double): Unit = cube.set(address, v)
  def setPayload(p: String): Unit = cube.setPayload(address, p)
  def delete(): Unit = cube.delete(address)

  def isAggregated: Boolean = boltOf.superLevel > 0
  def isEmpty: Boolean = value.isEmpty

  /** Sibling cell with the given dimensions' members replaced
    * (≙ `cell.alter`, `cell.py:110-154`). Dimensions address by name or by
    * 0-based ordinal — `alter("1" -> "Mar")` ≙ the reference's `c["1:Mar"]`
    * (`cell.py:251-331`).
    */
  def alter(dimMember: (String, String)*): Cell = {
    val newIds = dimMember.foldLeft(ids) { case (acc, (dn, m)) =>
      val i = graft.olap.Rules.dimIndexOf(cube, dn)
      require(i >= 0, s"unknown dimension '$dn' in cube '${cube.name}'")
      acc.updated(i, cube.dimensions(i).idOf(m))
    }
    new Cell(cube, newIds)
  }

  /** Sibling cell with one dimension's member moved by ordinal offset
    * (≙ prior-period navigation, `member.py:185-225`).
    */
  def shift(dimName: String, offset: Int): Cell = {
    val i = cube.dimensions.indexWhere(_.name.equalsIgnoreCase(dimName))
    require(i >= 0, s"unknown dimension '$dimName' in cube '${cube.name}'")
    val d = cube.dimensions(i)
    val ord = d.members.indexWhere(_.id == ids(i))
    val target = ord + offset
    require(target >= 0 && target < d.members.length,
      s"shift($dimName, $offset) runs off the member list")
    new Cell(cube, ids.updated(i, d.members(target).id))
  }

  /** Member pointer for one of the cell's dimensions. */
  def member(dimName: String): Member = {
    val i = cube.dimensions.indexWhere(_.name.equalsIgnoreCase(dimName))
    require(i >= 0, s"unknown dimension '$dimName' in cube '${cube.name}'")
    new Member(cube.dimensions(i), ids(i))
  }

  // numeric convenience (empty reads as 0.0, ≙ float(cell) in the reference)
  def toDouble: Double = value.getOrElse(0.0)
  def +(other: Cell): Double = toDouble + other.toDouble
  def -(other: Cell): Double = toDouble - other.toDouble
  def *(other: Cell): Double = toDouble * other.toDouble
  def +(x: Double): Double = toDouble + x
  def -(x: Double): Double = toDouble - x
  def *(x: Double): Double = toDouble * x

  override def toString: String = s"${cube.name}[${address.mkString(", ")}]"
}
