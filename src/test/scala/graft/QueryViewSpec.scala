package graft

import graft.olap._
import org.scalatest.funsuite.AnyFunSuite

/** SQL dialect + View over the tiny model (parser fixtures from FIXTURES §5,
  * `tests/test_query.py:15-24`; view semantics from `tests/test_view.py`).
  */
class QueryViewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val db = TinyModel.build(spark)
  lazy val cube = {
    val c = db.cube("sales")
    c.set(Seq("2021", "Jan", "North", "motorcycles", "Sales"), 123.0)
    c.set(Seq("2021", "Jan", "North", "sedan", "Sales"), 456.0)
    c.set(Seq("2021", "Jan", "North", "motorcycles", "Cost"), 100.0)
    c.set(Seq("2021", "Feb", "South", "sports", "Sales"), 50.0)
    c
  }

  test("dialect: full-address point query") {
    cube
    val df = OlapQuery(db, "SELECT * FROM sales WHERE '2021', 'Jan', North, 'motorcycles', 'Sales'")
    val rows = df.collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[String]("years") == "2021" && r.getAs[String]("products") == "motorcycles")
    assert(math.abs(r.getAs[Number]("value").doubleValue() - 123.0) < 1e-9)
  }

  test("dialect: projection of selected fields") {
    cube
    val df = OlapQuery(db, "SELECT months, value FROM sales WHERE '2021', 'Jan', North, 'motorcycles', 'Sales'")
    assert(df.columns.toSeq == Seq("months", "value"))
  }

  test("dialect: attribute field + case-insensitive cube name") {
    cube
    val df = OlapQuery(db,
      "SELECT regions, regions.manager, months, value FROM saLes WHERE '2021', North, 'motorcycles', 'Sales'")
    val r = df.collect().head
    assert(r.getAs[String]("regions.manager") == "Ingmar Ice")
  }

  test("dialect: member list slicer") {
    cube
    val df = OlapQuery(db,
      "SELECT months, value FROM sales WHERE '2021', months=('Jan','Feb'), regions='Total', products='Total', 'Sales'")
    val got = df.collect().map(r => r.getAs[String]("months") -> r.getAs[Number]("value").doubleValue()).toMap
    assert(math.abs(got("Jan") - 579.0) < 1e-9)
    assert(got.get("Feb").forall(_ == 50.0) || !got.contains("Feb")) // Feb South sports = 50 under Total
  }

  test("dialect: subset + wildcard slicers") {
    cube
    val df = OlapQuery(db,
      "SELECT months, products FROM sAles WHERE '2021', months=summer, North, products='*', 'Sales'")
    // summer = Jun..Sep has no data → empty grid, but parse+plan must succeed
    assert(df.columns.toSeq == Seq("months", "products"))
    df.collect()
  }

  test("dialect: rule-backed measure computed inside the grid job") {
    cube
    val df = OlapQuery(db,
      "SELECT months, value FROM sales WHERE '2021', months=('Jan','Feb'), regions='Total', products='Total', 'Profit in %'")
    val got = df.collect().map(r =>
      r.getAs[String]("months") -> r.getAs[Number]("value").doubleValue()).toMap
    // Jan: Profit = 579 - 100 = 479; Profit in % = 479/579
    assert(math.abs(got("Jan") - 479.0 / 579.0) < 1e-12)
    // Feb: Sales 50, no Cost → Profit 50 → 100%
    assert(math.abs(got("Feb") - 1.0) < 1e-12)
  }

  test("view: pivot grid with rule-derived measure column") {
    cube
    val view = new View(cube, ViewDef(
      filters = Seq("years" -> "2021", "regions" -> "Total", "products" -> "Total"),
      rows = AxisDef(Seq("months" -> Seq("Jan", "Feb", "Q1", "Year"))),
      cols = AxisDef(Seq("measures" -> Seq("Sales", "Cost", "Profit", "Profit in %")))))
    val grid = view.refresh().collect()
    val byMonth = grid.map(r => r.getAs[String]("months") -> r).toMap
    val jan = byMonth("Jan")
    assert(jan.getAs[Double]("Sales") == 579.0)
    assert(jan.getAs[Double]("Cost") == 100.0)
    assert(jan.getAs[Double]("Profit") == 479.0)
    assert(math.abs(jan.getAs[Double]("Profit in %") - 479.0 / 579.0) < 1e-12)
    val q1 = byMonth("Q1")
    assert(q1.getAs[Double]("Sales") == 629.0) // Jan 579 + Feb 50
    // ordering follows axis member order
    assert(grid.map(_.getAs[String]("months")).toSeq == Seq("Jan", "Feb", "Q1", "Year"))
  }

  test("view: multi-dimension column axis (months x measures, ruled member)") {
    cube
    val v = new View(cube, ViewDef(
      filters = Seq("regions" -> "Total", "products" -> "Total", "months" -> "Year"),
      rows = AxisDef(Seq("years" -> Seq("2021", "2022"))),
      cols = AxisDef(Seq(
        "months" -> Seq("Jan", "Feb"),
        "measures" -> Seq("Sales", "Profit in %")))))
    val grid = v.refresh()
    // cartesian positions in order: last axis entry varies fastest
    assert(grid.columns.toSeq ==
      Seq("years", "Jan/Sales", "Jan/Profit in %", "Feb/Sales", "Feb/Profit in %"))
    val y2021 = grid.collect().map(r => r.getAs[String]("years") -> r).toMap.apply("2021")
    assert(y2021.getAs[Double]("Jan/Sales") == 579.0)
    // ruled member resolves refs WITHIN its position: Jan/Profit ÷ Jan/Sales
    assert(math.abs(y2021.getAs[Double]("Jan/Profit in %") - 479.0 / 579.0) < 1e-12)
    assert(y2021.getAs[Double]("Feb/Sales") == 50.0)
    assert(math.abs(y2021.getAs[Double]("Feb/Profit in %") - 1.0) < 1e-12)
  }

  test("view: zero suppression drops empty rows") {
    cube
    val view = new View(cube, ViewDef(
      filters = Seq("years" -> "2022", "regions" -> "Total", "products" -> "Total"),
      rows = AxisDef(Seq("months" -> Seq("Jan", "Feb", "Mar"))),
      cols = AxisDef(Seq("measures" -> Seq("Sales"))),
      zeroSuppression = true))
    assert(view.refresh().collect().isEmpty)
  }

  test("view: windowed collect and renders") {
    cube
    val view = new View(cube, ViewDef(
      filters = Seq("years" -> "2021", "regions" -> "Total", "products" -> "Total"),
      rows = AxisDef(Seq("months" -> Seq("Jan", "Feb", "Mar", "Q1"))),
      cols = AxisDef(Seq("measures" -> Seq("Sales", "Cost")))))
    val (cols, rows) = view.collect(Some(ViewWindow(0, 0, 1, 0)))
    assert(cols == Seq("months", "Sales") && rows.size == 2)
    val console = view.toConsole()
    assert(console.contains("Jan") && console.contains("579"))
    assert(view.toHtml().startsWith("<table>"))
    assert(view.toJson().startsWith("["))
    assert(view.stats.columns == 2)
    assert(view.stats.aggregatedPositions == 2 && view.stats.rulePositions == 0)
    // rule-backed column counted separately in stats
    val vr = new View(cube, ViewDef(
      filters = Seq("years" -> "2021", "regions" -> "Total", "products" -> "Total"),
      rows = AxisDef(Seq("months" -> Seq("Jan"))),
      cols = AxisDef(Seq("measures" -> Seq("Sales", "Profit in %")))))
    vr.refresh()
    assert(vr.stats.aggregatedPositions == 1 && vr.stats.rulePositions == 1)
  }

  test("named view registry: define, fetch, JSON round-trip") {
    cube
    val dfn = ViewDef(
      filters = Seq("years" -> "2021", "regions" -> "Total", "products" -> "Total"),
      rows = AxisDef(Seq("months" -> Seq("Jan", "Feb"))),
      cols = AxisDef(Seq("measures" -> Seq("Sales"))))
    cube.views.define("monthly sales", dfn)
    assert(cube.views.contains("Monthly Sales")) // case-insensitive
    val grid = cube.views("monthly sales").refresh().collect()
    assert(grid.map(_.getAs[String]("months")).toSeq == Seq("Jan", "Feb"))
    // registry round-trips through JSON into a fresh cube handle
    val other = new graft.core.Cube("copy", cube.dimensions, spark, Some(cube.facts))
    other.views.loadJson(cube.views.toJson)
    assert(other.views.names == Seq("monthly sales"))
    assert(other.views.definition("monthly sales") == dfn)
    // and through full database save/load
    val dir = java.nio.file.Files.createTempDirectory("graftviews").toString
    db.save(dir)
    val db2 = graft.core.Database.load(dir, spark)
    assert(db2.cube("sales").views.contains("monthly sales"))
    assert(db2.cube("sales").views.definition("monthly sales") == dfn)
  }

  test("view definition JSON round-trip yields an identical grid") {
    cube
    val dfn = ViewDef(
      filters = Seq("years" -> "2021", "regions" -> "Total", "products" -> "Total"),
      rows = AxisDef(Seq("months" -> Seq("Jan", "Feb", "Q1"))),
      cols = AxisDef(Seq("measures" -> Seq("Sales", "Cost"))),
      zeroSuppression = true)
    val dfn2 = ViewDef.fromJson(ViewDef.toJson(dfn))
    assert(dfn2 == dfn)
    val g1 = new View(cube, dfn).refresh().collect().map(_.toString).toSeq
    val g2 = new View(cube, dfn2).refresh().collect().map(_.toString).toSeq
    assert(g1 == g2)
  }

  test("format mini-language") {
    assert(ViewFormat(Some("{:.2%}"), 0.8640239) == "86.40%")
    assert(ViewFormat(Some("{:,.0f}"), 1234567.0) == "1,234,567")
    assert(ViewFormat(Some("{:.3f}"), 1.5) == "1.500")
    assert(ViewFormat(None, 42.0) == "42")
  }
}
