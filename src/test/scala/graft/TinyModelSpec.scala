package graft

import graft.core._
import graft.olap._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graftwh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

/** The reference's `tiny` model (`samples/tiny.py:23-135`) rebuilt on the
  * Spark engine, with the hand-computed assertions from FIXTURES.md §1.
  */
object TinyModel {
  def build(spark: SparkSession): Database = {
    val db = new Database("tiny", spark)
    val years = db.addDimension("years")
    years.edit().addMany(Seq("2021", "2022", "2023"))
      .add("All years", Seq("2021", "2022", "2023")).commit()

    val months = db.addDimension("months")
    months.edit()
      .addMany(Seq("Jan", "Feb", "Mar", "Apr", "Mai", "Jun", "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"))
      .add("Q1", Seq("Jan", "Feb", "Mar")).add("Q2", Seq("Apr", "Mai", "Jun"))
      .add("Q3", Seq("Jul", "Aug", "Sep")).add("Q4", Seq("Oct", "Nov", "Dec"))
      .add("Year", Seq("Q1", "Q2", "Q3", "Q4")).commit()
    months.addSubset("summer", Seq("Jun", "Jul", "Aug", "Sep"))

    val regions = db.addDimension("regions")
    regions.edit().add("Total", Seq("North", "South", "West", "East")).commit()
    regions.addAttribute("manager")
    Seq("Total" -> "Peter Parker", "North" -> "Ingmar Ice", "South" -> "Carlo Carulli",
      "West" -> "Heinz Erhardt", "East" -> "Pyotr Tchaikovsky")
      .foreach { case (m, v) => regions.setAttribute("manager", m, v) }

    val products = db.addDimension("products")
    products.edit()
      .add("Total", Seq("cars", "trucks", "motorcycles"))
      .add("cars", Seq("coupe", "sedan", "sports", "van"))
      .add("best sellers", Seq("sports", "motorcycles"))
      .commit()

    val measures = db.addDimension("measures")
    measures.edit().addMany(Seq("Sales", "Cost", "Profit", "Profit in %"))
      .add("Profit", Seq("Sales", "Cost"), Seq(1.0, -1.0)).commit()
    measures.setFormat("Profit in %", "{:.2%}")

    val cube = db.addCube("sales", Seq(years, months, regions, products, measures))
    cube.registerRule(RuleDef(
      trigger = Map("measures" -> "Profit in %"),
      scope = RuleScope.AllLevels,
      expr = RuleExpr.Div(RuleExpr.Ref("Profit"), RuleExpr.Ref("Sales")),
      name = "profit_in_percent"))
    db
  }
}

class TinyModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val db = TinyModel.build(spark)
  lazy val cube = db.cube("sales")

  test("dimension structure: levels, leaves, multi-parent") {
    val products = db.dimension("products")
    assert(products("sports").level == 0)
    assert(products("cars").level == 1)
    assert(products("Total").level == 2)
    // sports has two parents: cars and best sellers
    assert(products("sports").parents.map(products.nameOf).toSet == Set("cars", "best sellers"))
    assert(products.leavesOf("best sellers").map(r => products.nameOf(r.leaf)).toSet
      == Set("sports", "motorcycles"))
    assert(products.leavesOf("Total").map(r => products.nameOf(r.leaf)).toSet
      == Set("coupe", "sedan", "sports", "van", "trucks", "motorcycles"))
    val months = db.dimension("months")
    assert(months.leafMembers.size == 12)
    assert(months("Year").level == 2)
    assert(months.subset("summer").map(_.name) == Seq("Jun", "Jul", "Aug", "Sep"))
  }

  test("cycle detection rejects circular hierarchies") {
    val d = new Dimension("bad")
    intercept[IllegalArgumentException] {
      d.edit().add("a", Seq("b")).add("b", Seq("c")).add("c", Seq("a")).commit()
    }
  }

  test("write two cells, read the documented rollups (FIXTURES §1)") {
    cube.set(Seq("2021", "Jan", "North", "motorcycles", "Sales"), 123.0)
    cube.set(Seq("2021", "Jan", "North", "sedan", "Sales"), 456.0)
    assert(cube.get(Seq("2021", "Jan", "North", "motorcycles", "Sales")).contains(123.0))
    assert(cube.get(Seq("2021", "Year", "Total", "Total", "Sales")).contains(579.0))
    assert(cube.get(Seq("2021", "Q1", "Total", "cars", "Sales")).contains(456.0))
    // multi-parent: motorcycles feeds both Total and best sellers
    assert(cube.get(Seq("2021", "Q1", "Total", "best sellers", "Sales")).contains(123.0))
    // empty cell
    assert(cube.get(Seq("2022", "Jan", "North", "sedan", "Sales")).isEmpty)
  }

  test("weighted rollup: Profit = Sales - Cost at every level") {
    cube.set(Seq("2021", "Jan", "North", "motorcycles", "Sales"), 123.0)
    cube.set(Seq("2021", "Jan", "North", "sedan", "Sales"), 456.0)
    cube.set(Seq("2021", "Jan", "North", "motorcycles", "Cost"), 100.0)
    cube.set(Seq("2021", "Jan", "North", "sedan", "Cost"), 400.0)
    assert(cube.get(Seq("2021", "Jan", "North", "motorcycles", "Profit")).contains(23.0))
    assert(cube.get(Seq("2021", "Year", "Total", "Total", "Profit")).contains(79.0))
  }

  test("ALL_LEVELS rule: Profit in % = Profit / Sales, None when Sales empty") {
    cube.set(Seq("2021", "Jan", "North", "motorcycles", "Sales"), 123.0)
    cube.set(Seq("2021", "Jan", "North", "motorcycles", "Cost"), 100.0)
    val got = cube.get(Seq("2021", "Jan", "North", "motorcycles", "Profit in %"))
    assert(got.exists(v => math.abs(v - 23.0 / 123.0) < 1e-12))
    assert(cube.get(Seq("2022", "Feb", "South", "van", "Profit in %")).isEmpty)
  }

  test("delete removes a base cell from rollups") {
    cube.set(Seq("2022", "Feb", "South", "van", "Sales"), 10.0)
    assert(cube.get(Seq("2022", "Year", "Total", "Total", "Sales")).contains(10.0))
    cube.delete(Seq("2022", "Feb", "South", "van", "Sales"))
    assert(cube.get(Seq("2022", "Feb", "South", "van", "Sales")).isEmpty)
  }

  test("area aggregates + multiply/increment (≙ tests/test_area.py:40-60)") {
    val a = cube.area("years" -> Seq("2023"), "measures" -> Seq("Sales"))
    a.clear()
    cube.set(Seq("2023", "Jan", "North", "sedan", "Sales"), 1.0)
    cube.set(Seq("2023", "Feb", "South", "van", "Sales"), 1.0)
    cube.compact()
    assert(a.min.contains(1.0) && a.max.contains(1.0) && a.sum.contains(2.0))
    a.multiply(2.0)
    assert(cube.get(Seq("2023", "Jan", "North", "sedan", "Sales")).contains(2.0))
    a.increment(1.0)
    assert(cube.get(Seq("2023", "Feb", "South", "van", "Sales")).contains(3.0))
    assert(a.avg.contains(3.0))
    a.clear()
    assert(a.count == 0)
  }

  test("area copy with transform: Plan2022 = 2021 * 1.15") {
    val c2 = db.addCube("sales2", cube.dimensions)
    c2.set(Seq("2021", "Jan", "North", "sedan", "Sales"), 100.0)
    c2.set(Seq("2021", "Feb", "North", "van", "Sales"), 200.0)
    val src = c2.area("years" -> Seq("2021"))
    val tgt = c2.area("years" -> Seq("2022"))
    tgt.copyFrom(src, c => c * 1.15)
    assert(c2.get(Seq("2022", "Jan", "North", "sedan", "Sales")).exists(v => math.abs(v - 115.0) < 1e-9))
    assert(c2.get(Seq("2022", "Year", "Total", "Total", "Sales")).exists(v => math.abs(v - 345.0) < 1e-9))
    // source untouched
    assert(c2.get(Seq("2021", "Jan", "North", "sedan", "Sales")).contains(100.0))
  }

  test("area allocate: proportional hits target preserving ratios; equal splits evenly") {
    val c3 = db.addCube("sales_alloc", cube.dimensions)
    c3.set(Seq("2021", "Jan", "North", "sedan", "Sales"), 100.0)
    c3.set(Seq("2021", "Feb", "South", "van", "Sales"), 300.0)
    c3.set(Seq("2022", "Jan", "North", "sedan", "Sales"), 7.0)
    val a21 = c3.area("years" -> Seq("2021"), "measures" -> Seq("Sales"))
    a21.allocate(800.0)
    assert(c3.get(Seq("2021", "Jan", "North", "sedan", "Sales")).contains(200.0))
    assert(c3.get(Seq("2021", "Feb", "South", "van", "Sales")).contains(600.0))
    assert(c3.get(Seq("2021", "Year", "Total", "Total", "Sales")).contains(800.0))
    // outside the area: untouched
    assert(c3.get(Seq("2022", "Jan", "North", "sedan", "Sales")).contains(7.0))
    a21.allocate(500.0, AllocationMode.Equal)
    assert(c3.get(Seq("2021", "Jan", "North", "sedan", "Sales")).contains(250.0))
    assert(c3.get(Seq("2021", "Feb", "South", "van", "Sales")).contains(250.0))
    // empty area: nothing to allocate across
    intercept[IllegalArgumentException] {
      c3.area("years" -> Seq("2023"), "measures" -> Seq("Sales")).allocate(1.0)
    }
    // zero-sum area: proportional undefined, equal fine
    c3.set(Seq("2023", "Jan", "North", "sedan", "Sales"), 5.0)
    c3.set(Seq("2023", "Feb", "South", "van", "Sales"), -5.0)
    val a23 = c3.area("years" -> Seq("2023"), "measures" -> Seq("Sales"))
    intercept[IllegalArgumentException] { a23.allocate(10.0) }
    a23.allocate(10.0, AllocationMode.Equal)
    assert(c3.get(Seq("2023", "Year", "Total", "Total", "Sales")).contains(10.0))
  }

  test("attribute filter / regex / by-value") {
    val regions = db.dimension("regions")
    assert(regions.attribute("manager").filter("P*").map(regions.nameOf).toSet
      == Set("Total", "East"))
    assert(regions.attribute("manager").rmatch("(?i)ice$").map(regions.nameOf) == Seq("North"))
    assert(regions.membersByAttribute("manager", "Carlo Carulli").map(_.name) == Seq("South"))
  }

  test("member navigation") {
    val months = db.dimension("months")
    val jan = months.member("Jan")
    assert(jan.next.name == "Feb" && !jan.hasPrevious)
    assert(jan.parents.map(_.name) == Seq("Q1"))
    assert(months.member("Q1").children.map(_.name) == Seq("Jan", "Feb", "Mar"))
    assert(months.member("Year").leaves.size == 12)
    assert(months.member("Jan").allParents.map(_.name).toSet == Set("Q1", "Year"))
  }

  test("persistence round-trip (save/load)") {
    val tmp = java.nio.file.Files.createTempDirectory("graftdb").toString
    cube.set(Seq("2021", "Jan", "North", "motorcycles", "Sales"), 123.0)
    cube.set(Seq("2021", "Jan", "North", "sedan", "Sales"), 456.0)
    db.save(tmp)
    val db2 = Database.load(tmp, spark)
    val c2 = db2.cube("sales")
    assert(c2.get(Seq("2021", "Year", "Total", "Total", "Sales")).contains(579.0))
    assert(c2.get(Seq("2021", "Q1", "Total", "best sellers", "Sales")).contains(123.0))
    assert(db2.dimension("measures")("Profit in %").format.contains("{:.2%}"))
    assert(db2.dimension("regions").getAttribute("manager", "North").contains("Ingmar Ice"))
  }

  test("grid aggregate: one job for a whole cell grid") {
    val c3 = db.addCube("sales3", cube.dimensions)
    c3.set(Seq("2021", "Jan", "North", "motorcycles", "Sales"), 123.0)
    c3.set(Seq("2021", "Jan", "North", "sedan", "Sales"), 456.0)
    c3.set(Seq("2022", "Feb", "South", "van", "Sales"), 10.0)
    val years = db.dimension("years"); val months = db.dimension("months")
    val regions = db.dimension("regions"); val products = db.dimension("products")
    val measures = db.dimension("measures")
    val grid = c3.gridAggregate(Seq(
      Seq(years.idOf("2021"), years.idOf("2022")),
      Seq(months.idOf("Year")),
      Seq(regions.idOf("Total")),
      Seq(products.idOf("Total"), products.idOf("best sellers")),
      Seq(measures.idOf("Sales")))).collect()
    val m = grid.map(r => (r.getInt(0), r.getInt(3)) -> r.getDouble(5)).toMap
    assert(m((years.idOf("2021"), products.idOf("Total"))) == 579.0)
    assert(m((years.idOf("2021"), products.idOf("best sellers"))) == 123.0)
    assert(m((years.idOf("2022"), products.idOf("Total"))) == 10.0)
  }
}
