package graft

import graft.core.{Database, Dimension}
import graft.olap._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-11 review findings: below-grain rule references must not
  * make a cube unsummarizable, the registry must support the summary
  * refresh cycle, and sentinel-valued raw keys must decline maintenance.
  */
class Round11FixesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def freshModel(tag: String) = {
    val db = TinyModel.build(spark)
    val c = db.cube("sales")
    val cube = new graft.core.Cube(s"sales_$tag", c.dimensions, spark, Some(c.facts))
    c.rules.foreach(cube.registerRule)
    cube.set(Seq("2021", "Jan", "North", "motorcycles", "Sales"), 123.0)
    cube.set(Seq("2021", "Feb", "North", "sedan", "Sales"), 456.0)
    cube
  }

  test("a rule triggering on a BELOW-GRAIN member skips, not fails, materialize") {
    val cube = freshModel("r11bg")
    // an ALL_LEVELS rule scoped to January: the derived quarter catalog has
    // no 'Jan', so registration on the summary cannot validate — the rule
    // must join the skipped set instead of aborting the build
    cube.registerRule(RuleDef(
      trigger = Map("months" -> "Jan", "measures" -> "Cost"),
      scope = RuleScope.AllLevels,
      expr = RuleExpr.Mul(RuleExpr.Ref("Sales"), RuleExpr.Lit(0.1)),
      name = "jan_cost"))
    val summary = Aggregates.materialize(cube, "sales_r11bg_q",
      Seq(None, Some(1), None, None, None))
    assert(!summary.rules.exists(_.name == "jan_cost"))
    assert(Aggregates.metaOf(summary).get.skippedRules.contains("jan_cost"))
    val nav = new Aggregates.Navigator(cube, Seq(summary))
    // the rule's own territory is below the grain → base by membership
    assert(nav.cubeFor(Seq("2021", "Jan", "Total", "Total", "Cost")) eq cube)
    assert(nav.get(Seq("2021", "Jan", "Total", "Total", "Cost")) ==
      cube.get(Seq("2021", "Jan", "Total", "Total", "Cost")))
    // rule-free territory still serves from the summary, bit-identically
    val qAddr = Seq("2021", "Q1", "Total", "Total", "Sales")
    assert(nav.cubeFor(qAddr) eq summary)
    assert(nav.get(qAddr) == cube.get(qAddr))
  }

  test("a rule triggering on a raw key still allows a collapsed degenerate summary") {
    val db = new Database("r11degr", spark)
    val cust = db.addDegenerateDimension("customer", "C#")
    val m = db.addDimension("m"); m.edit().addMany(Seq("v", "w")).commit()
    val cube = db.addCube("sales", Seq(cust, m))
    cube.set(Seq("C#1", "v"), 10.0)
    cube.set(Seq("C#2", "v"), 5.0)
    cube.registerRule(RuleDef(
      trigger = Map("customer" -> "C#5", "m" -> "w"),
      scope = RuleScope.AllLevels,
      expr = RuleExpr.Lit(7.0), name = "c5rule"))
    val summary = Aggregates.materialize(cube, "r11degr_all", Seq(Some(1), None))
    assert(Aggregates.metaOf(summary).get.skippedRules.contains("c5rule"))
    val nav = new Aggregates.Navigator(cube, Seq(summary))
    assert(nav.get(Seq("All", "v")).contains(15.0))
    // the skipped rule's territory (and the all-member reached by it) routes to base
    assert(nav.cubeFor(Seq("C#5", "w")) eq cube)
    assert(nav.get(Seq("C#5", "w")).contains(7.0))
  }

  test("a travelling rule referencing skipped-rule territory cascades to skipped") {
    val cube = freshModel("r11casc")
    cube.set(Seq("2021", "Jan", "North", "motorcycles", "Cost"), 100.0)
    // A: BASE_LEVEL rule computing Cost — statically summary-unsafe
    cube.registerRule(RuleDef(
      trigger = Map("measures" -> "Cost"), scope = RuleScope.BaseLevel,
      expr = RuleExpr.Mul(RuleExpr.Ref("Sales"), RuleExpr.Lit(0.5)),
      name = "half_cost"))
    // B: ALL_LEVELS rule whose expr READS Cost — would resolve the Ref
    // against the summary's stored (rule-less) cells and silently diverge
    cube.registerRule(RuleDef(
      trigger = Map("measures" -> "Profit in %"), scope = RuleScope.AllLevels,
      expr = RuleExpr.Div(RuleExpr.Ref("Cost"), RuleExpr.Ref("Sales")),
      name = "cost_ratio"))
    val summary = Aggregates.materialize(cube, "sales_r11casc_q",
      Seq(None, Some(1), None, None, None))
    val meta = Aggregates.metaOf(summary).get
    assert(meta.skippedRules.contains("half_cost"))
    assert(meta.skippedRules.contains("cost_ratio"),
      "a rule referencing skipped territory must cascade to skipped")
    val nav = new Aggregates.Navigator(cube, Seq(summary))
    val rAddr = Seq("2021", "Q1", "Total", "Total", "Profit in %")
    assert(nav.cubeFor(rAddr) eq cube) // unservable → base
    assert(nav.get(rAddr) == cube.get(rAddr))
    // first-match: TinyModel's profit_in_percent wins on base — (579−100)/579
    assert(nav.get(rAddr).contains(479.0 / 579.0))
    // rule-free territory still summary-serves
    val qAddr = Seq("2021", "Q1", "Total", "Total", "Sales")
    assert(nav.cubeFor(qAddr) eq summary)
    assert(nav.get(qAddr) == cube.get(qAddr))
  }

  test("refreshSummaries re-registers refreshed cubes; save picks them up") {
    val db2 = TinyModel.build(spark)
    val base = db2.cube("sales")
    base.set(Seq("2021", "Jan", "North", "motorcycles", "Sales"), 123.0)
    db2.registerCube(Aggregates.materialize(base, "s_reg",
      Seq(None, Some(1), None, None, None)))
    // a base write parks the registered summary…
    base.set(Seq("2021", "Feb", "North", "sedan", "Sales"), 456.0)
    assert(!db2.navigator("sales").fresh)
    // …refreshSummaries refreshes AND re-registers it under its name
    val nav = db2.refreshSummaries("sales")
    assert(nav.fresh)
    val qAddr = Seq("2021", "Q1", "Total", "Total", "Sales")
    assert(nav.cubeFor(qAddr).name == "s_reg")
    assert(nav.get(qAddr).contains(579.0))
    assert(db2.cube("s_reg") eq nav.summaries.head) // registry holds the fresh cube
    // save now persists the refreshed summary instead of dropping it
    val tmp = java.nio.file.Files.createTempDirectory("r11save").toString
    db2.save(tmp)
    val loaded = Database.load(tmp, spark)
    assert(loaded.cubeExists("s_reg"))
    assert(loaded.navigator("sales").get(qAddr).contains(579.0))
  }

  test("maintain declines a batch carrying a sentinel-valued degenerate key") {
    val db = new Database("r11sent", spark)
    val cust = db.addDegenerateDimension("customer", "C#")
    val m = db.addDimension("m"); m.edit().addMany(Seq("v")).commit()
    val cube = db.addCube("sales", Seq(cust, m))
    cube.set(Seq("C#1", "v"), 10.0)
    // KEPT-at-leaf grain: a batch key equal to DegenerateLeafAllId would
    // conflate with the "every key" grid selection — must decline
    val summary = Aggregates.materialize(cube, "r11sent_keep", Seq(None, None))
    val schema = StructType(Seq(StructField("d0", IntegerType),
      StructField("d1", IntegerType), StructField("value", DoubleType)))
    val batch = spark.createDataFrame(
      java.util.List.of(Row(Dimension.DegenerateLeafAllId, m.idOf("v"), 1.0)),
      schema)
    assert(Aggregates.maintain(cube, summary, batch).isEmpty)
    val batch2 = spark.createDataFrame(
      java.util.List.of(Row(Dimension.DegenerateAllId, m.idOf("v"), 1.0)), schema)
    assert(Aggregates.maintain(cube, summary, batch2).isEmpty)
  }
}
