package graft

import graft.olap._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CommandApproxSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("COMMAND rule fires only explicitly and writes back") {
    val db = TinyModel.build(spark)
    val cube = db.addCube("cmdsales", db.cube("sales").dimensions)
    cube.registerRule(RuleDef(
      trigger = Map("measures" -> "Cost"), scope = RuleScope.Command,
      expr = RuleExpr.Mul(RuleExpr.Ref("Sales"), RuleExpr.Lit(0.4)),
      name = "seed_costs"))
    cube.set(Seq("2021", "Jan", "North", "sedan", "Sales"), 100.0)
    // a read does NOT fire a command rule
    assert(cube.get(Seq("2021", "Jan", "North", "sedan", "Cost")).isEmpty)
    // explicit execution computes and writes the cell
    val got = Rules.executeCommand(cube, "seed_costs", Seq("2021", "Jan", "North", "sedan", "Cost"))
    assert(got.contains(40.0))
    assert(cube.get(Seq("2021", "Jan", "North", "sedan", "Cost")).contains(40.0))
  }

  test("COMMAND rule over an area: bulk evaluate + merge, area-scoped, null cells skipped") {
    val db = TinyModel.build(spark)
    val cube = db.addCube("cmdarea", db.cube("sales").dimensions)
    cube.registerRule(RuleDef(
      trigger = Map("measures" -> "Cost"), scope = RuleScope.Command,
      expr = RuleExpr.Mul(RuleExpr.Ref("Sales"), RuleExpr.Lit(0.5)),
      name = "seed_costs"))
    cube.set(Seq("2021", "Jan", "North", "sedan", "Sales"), 100.0)
    cube.set(Seq("2021", "Feb", "North", "coupe", "Sales"), 40.0)
    cube.set(Seq("2021", "Jan", "South", "sedan", "Sales"), 8.0)
    // scope the command to North: South must stay untouched
    val n = Rules.executeCommandArea(cube, "seed_costs",
      cube.area("regions" -> Seq("North")))
    assert(n == 2) // only cells where Sales exists get a Cost
    assert(cube.get(Seq("2021", "Jan", "North", "sedan", "Cost")).contains(50.0))
    assert(cube.get(Seq("2021", "Feb", "North", "coupe", "Cost")).contains(20.0))
    assert(cube.get(Seq("2021", "Jan", "South", "sedan", "Cost")).isEmpty)
    // aggregates read the post-command state
    assert(cube.get(Seq("2021", "Year", "North", "Total", "Cost")).contains(70.0))
    // re-execution overwrites (upsert semantics, no duplicate cells)
    cube.set(Seq("2021", "Jan", "North", "sedan", "Sales"), 200.0)
    val n2 = Rules.executeCommandArea(cube, "seed_costs",
      cube.area("regions" -> Seq("North")))
    assert(n2 == 2)
    assert(cube.get(Seq("2021", "Jan", "North", "sedan", "Cost")).contains(100.0))
    assert(cube.get(Seq("2021", "Year", "North", "Total", "Cost")).contains(120.0))
  }

  test("area command replaces a payload at a written cell; null cells keep theirs") {
    val db = TinyModel.build(spark)
    val cube = db.addCube("cmdpay", db.cube("sales").dimensions)
    cube.registerRule(RuleDef(
      trigger = Map("measures" -> "Cost"), scope = RuleScope.Command,
      expr = RuleExpr.Mul(RuleExpr.Ref("Sales"), RuleExpr.Lit(0.5)),
      name = "seed_costs"))
    cube.set(Seq("2021", "Jan", "North", "sedan", "Sales"), 100.0)
    // a payload on the WRITTEN target cell (Sales exists → Cost computes)…
    cube.setPayload(Seq("2021", "Jan", "North", "sedan", "Cost"), "to review")
    // …and one on a cell the command will NOT write (no Feb Sales)
    cube.setPayload(Seq("2021", "Feb", "North", "sedan", "Cost"), "keep me")
    Rules.executeCommandArea(cube, "seed_costs", cube.area("regions" -> Seq("North")))
    // the number replaced the annotation — one value per cell, like set()
    assert(cube.getCell(Seq("2021", "Jan", "North", "sedan", "Cost"))
      .contains(graft.core.CellValue.Num(50.0)))
    // the unwritten cell keeps its annotation
    assert(cube.getCell(Seq("2021", "Feb", "North", "sedan", "Cost"))
      .contains(graft.core.CellValue.Text("keep me")))
  }

  test("approx_count_distinct stays within 5% of exact") {
    val s = spark
    val dir = "/root/testdata/sf0.01"
    val orders = s.read.parquet(s"$dir/orders.parquet")
    // raw per-group error check (what the gate summary thresholds)
    val both = orders.groupBy(col("o_orderpriority"))
      .agg(approx_count_distinct(col("o_custkey"), 0.01).as("ap"),
        countDistinct(col("o_custkey")).as("ex"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val (k, ap, ex) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(math.abs(ap - ex).toDouble / ex < 0.05, s"$k: approx $ap vs exact $ex")
    }
    // the gate itself emits the oracle-checkable all-true summary row
    val row = SparkEntry.queries("rel_approx_distinct")(s, dir).collect()
    assert(row.length == 1 && row(0).getBoolean(0) && row(0).getBoolean(1))
  }
}
