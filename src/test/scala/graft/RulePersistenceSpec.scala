package graft

import graft.core._
import graft.olap._
import org.scalatest.funsuite.AnyFunSuite

class RulePersistenceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("rules round-trip through JSON metadata and fire after load") {
    val db = TinyModel.build(spark)
    val cube = db.cube("sales")
    cube.set(Seq("2021", "Jan", "North", "motorcycles", "Sales"), 123.0)
    cube.set(Seq("2021", "Jan", "North", "motorcycles", "Cost"), 100.0)
    val tmp = java.nio.file.Files.createTempDirectory("graftrules").toString
    db.save(tmp)
    val db2 = Database.load(tmp, spark)
    val c2 = db2.cube("sales")
    assert(c2.rules.exists(_.name == "profit_in_percent"))
    val got = c2.get(Seq("2021", "Jan", "North", "motorcycles", "Profit in %"))
    assert(got.exists(v => math.abs(v - 23.0 / 123.0) < 1e-12))
  }

  test("ON_ENTRY rule transforms the written value (write-path hook)") {
    val db = TinyModel.build(spark)
    val cube = db.addCube("esales", db.cube("sales").dimensions)
    cube.registerRule(RuleDef(
      trigger = Map("measures" -> "Cost"),
      scope = RuleScope.OnEntry,
      expr = RuleExpr.Lit(0), // unused for on-entry
      name = "negate_costs",
      onEntryFn = Some(v => -math.abs(v))))
    cube.set(Seq("2021", "Jan", "North", "sedan", "Cost"), 50.0)
    cube.set(Seq("2021", "Jan", "North", "sedan", "Sales"), 10.0)
    assert(cube.get(Seq("2021", "Jan", "North", "sedan", "Cost")).contains(-50.0))
    // untouched measure unaffected
    assert(cube.get(Seq("2021", "Jan", "North", "sedan", "Sales")).contains(10.0))
  }

  test("enumerated area fill writes the full leaf cross product") {
    val db = TinyModel.build(spark)
    val cube = db.addCube("fsales", db.cube("sales").dimensions)
    val area = cube.area("years" -> Seq("2021"), "months" -> Seq("Q1"),
      "measures" -> Seq("Sales"))
    area.setValueEnumerated(1.0)
    // Q1 = 3 months × 4 regions × 6 leaf products × 1 measure × 1 year
    assert(area.count == 3 * 4 * 6)
    assert(cube.get(Seq("2021", "Q1", "Total", "Total", "Sales")).contains(72.0))
    assert(cube.get(Seq("2021", "Jan", "North", "sports", "Sales")).contains(1.0))
  }
}
