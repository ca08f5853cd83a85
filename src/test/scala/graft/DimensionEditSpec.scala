package graft

import graft.core._
import org.scalatest.funsuite.AnyFunSuite

class DimensionEditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("catalogDf: edges, roots, levels, weights, multi-parent fan-out") {
    val d = new Dimension("m")
    d.edit().add("net", Seq("gross", "disc"), Seq(1.0, -1.0))
      .add("alt", Seq("gross")).commit()
    val rows = d.catalogDf(spark).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getDouble(3))).toSet
    assert(rows == Set(
      ("net", 1, "", 0.0), ("alt", 1, "", 0.0),
      ("gross", 0, "net", 1.0), ("gross", 0, "alt", 1.0),
      ("disc", 0, "net", -1.0)),
      s"one row per edge + one per root, weights on the edge: $rows")
  }

  test("rollback restores the pre-edit committed state") {
    val d = new Dimension("r")
    d.edit().add("All", Seq("a", "b")).commit()
    assert(d.memberCount == 3)
    d.edit().add("All", Seq("c")).add("d")
    d.rollback()
    assert(d.memberCount == 3)
    assert(!d.contains("c") && !d.contains("d"))
    assert(d.leavesOf("All").map(r => d.nameOf(r.leaf)).toSet == Set("a", "b"))
    // dimension is usable again after rollback
    d.edit().add("All", Seq("c")).commit()
    assert(d.contains("c") && d.leavesOf("All").size == 3)
  }

  test("member removal + purge drops orphan facts from rollups") {
    val db = new Database("edit", spark)
    val d = db.addDimension("d")
    d.edit().add("All", Seq("x", "y", "z")).commit()
    val o = db.addDimension("o")
    o.edit().add("ALL", Seq("p")).commit()
    val cube = db.addCube("c", Seq(d, o))
    cube.set(Seq("x", "p"), 10.0)
    cube.set(Seq("y", "p"), 5.0)
    assert(cube.get(Seq("All", "ALL")).contains(15.0))
    // remove member y; its facts must stop contributing after the purge
    d.edit(); d.remove("y"); d.commit()
    cube.purgeUnknownMembers()
    assert(cube.get(Seq("All", "ALL")).contains(10.0))
    assert(cube.cellsCount == 1)
  }
}
