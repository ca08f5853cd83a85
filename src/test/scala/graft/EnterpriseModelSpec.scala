package graft

import graft.core._
import graft.olap._
import org.scalatest.funsuite.AnyFunSuite

/** The reference's `enterprise` model shapes (FIXTURES §2,
  * `samples/enterprise_model/model.py`): signed P&L weights
  * (`Net Sales = Gross Sales − returns − discounts`, `model.py:306-330`),
  * NESTED weighted aggregation (`Gross Profit = Net Sales − COGS` where Net
  * Sales is itself aggregated), datatype variance members
  * (`ACTvsPL = Actual − Plan`, `model.py:276-278`), quarter/half-year
  * calendar rollups, and rule-derived margins — all hand-computed.
  */
class EnterpriseModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def build(): (Database, Cube) = {
    val db = new Database("enterprise", spark)

    val datatype = db.addDimension("datatype")
    datatype.edit()
    datatype.addMany(Seq("Actual", "Plan"))
    datatype.add("ACTvsPL", Seq("Actual", "Plan"), Seq(1.0, -1.0))
    datatype.commit()

    val years = db.addDimension("years")
    years.edit().add("All Years", Seq("2022", "2023")).commit()

    val periods = db.addDimension("periods")
    periods.edit()
      .addMany(Seq("Jan", "Feb", "Mar", "Apr", "Mai", "Jun",
        "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"))
      .add("Q1", Seq("Jan", "Feb", "Mar")).add("Q2", Seq("Apr", "Mai", "Jun"))
      .add("Q3", Seq("Jul", "Aug", "Sep")).add("Q4", Seq("Oct", "Nov", "Dec"))
      .add("HY1", Seq("Q1", "Q2")).add("HY2", Seq("Q3", "Q4"))
      .add("Year", Seq("HY1", "HY2"))
      .commit()

    val company = db.addDimension("company")
    company.edit().add("Group", Seq("Alpha", "Beta", "Gamma")).commit()

    val pnl = db.addDimension("pnl")
    pnl.edit()
      .addMany(Seq("Gross Sales", "returns", "discounts", "COGS"))
      .add("Net Sales", Seq("Gross Sales", "returns", "discounts"), Seq(1.0, -1.0, -1.0))
      .add("Gross Profit", Seq("Net Sales", "COGS"), Seq(1.0, -1.0)) // nested weighted
      .add("GM%") // rule-derived
      .commit()

    val cube = db.addCube("pnl_cube", Seq(datatype, years, periods, company, pnl))
    cube.registerRule(RuleDef(
      trigger = Map("pnl" -> "GM%"), scope = RuleScope.AllLevels,
      expr = RuleParser.parse("[Gross Profit] / [Net Sales]"), name = "gm_pct"))
    (db, cube)
  }

  test("nested signed-weight P&L rolls up correctly at every level") {
    val (_, cube) = build()
    // Actual, 2023 Jan, Alpha
    cube.set(Seq("Actual", "2023", "Jan", "Alpha", "Gross Sales"), 1000.0)
    cube.set(Seq("Actual", "2023", "Jan", "Alpha", "returns"), 50.0)
    cube.set(Seq("Actual", "2023", "Jan", "Alpha", "discounts"), 30.0)
    cube.set(Seq("Actual", "2023", "Jan", "Alpha", "COGS"), 400.0)
    // Actual, 2023 Feb, Beta
    cube.set(Seq("Actual", "2023", "Feb", "Beta", "Gross Sales"), 500.0)
    cube.set(Seq("Actual", "2023", "Feb", "Beta", "COGS"), 200.0)

    // leaf-company, leaf-month
    assert(cube.get(Seq("Actual", "2023", "Jan", "Alpha", "Net Sales")).contains(920.0))
    assert(cube.get(Seq("Actual", "2023", "Jan", "Alpha", "Gross Profit")).contains(520.0))
    // calendar + company rollup through Q1/HY1/Year and Group
    assert(cube.get(Seq("Actual", "2023", "Q1", "Group", "Net Sales")).contains(1420.0))
    assert(cube.get(Seq("Actual", "2023", "HY1", "Group", "Gross Profit")).contains(820.0))
    assert(cube.get(Seq("Actual", "All Years", "Year", "Group", "Gross Profit")).contains(820.0))
    // GM% rule at an aggregated address
    val gm = cube.get(Seq("Actual", "2023", "Q1", "Group", "GM%"))
    assert(gm.exists(v => math.abs(v - 820.0 / 1420.0) < 1e-12))
  }

  test("ACTvsPL variance member: Actual minus Plan across the datatype dim") {
    val (_, cube) = build()
    cube.set(Seq("Actual", "2023", "Jan", "Alpha", "Gross Sales"), 1000.0)
    cube.set(Seq("Plan", "2023", "Jan", "Alpha", "Gross Sales"), 900.0)
    cube.set(Seq("Actual", "2023", "Feb", "Alpha", "Gross Sales"), 800.0)
    cube.set(Seq("Plan", "2023", "Feb", "Alpha", "Gross Sales"), 850.0)
    assert(cube.get(Seq("ACTvsPL", "2023", "Jan", "Alpha", "Gross Sales")).contains(100.0))
    assert(cube.get(Seq("ACTvsPL", "2023", "Feb", "Alpha", "Gross Sales")).contains(-50.0))
    // variance aggregates through the calendar like any other member
    assert(cube.get(Seq("ACTvsPL", "2023", "Q1", "Group", "Gross Sales")).contains(50.0))
    // and composes with the weighted P&L hierarchy
    cube.set(Seq("Actual", "2023", "Jan", "Alpha", "returns"), 10.0)
    cube.set(Seq("Plan", "2023", "Jan", "Alpha", "returns"), 20.0)
    assert(cube.get(Seq("ACTvsPL", "2023", "Jan", "Alpha", "Net Sales")).contains(110.0))
  }
}
