package graft

import graft.core._
import graft.olap._
import graft.sources.FactSources
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SourcesShiftSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("shift rule: month-over-month delta via relative member offset") {
    val db = TinyModel.build(spark)
    val cube = db.addCube("ssales", db.cube("sales").dimensions)
    // Cost measure repurposed as "MoM delta of Sales" via a shift rule
    cube.registerRule(RuleDef(
      trigger = Map("measures" -> "Cost"), scope = RuleScope.AllLevels,
      expr = RuleExpr.Sub(RuleExpr.Ref("Sales"), RuleExpr.Shift("months", -1)),
      name = "mom_delta"))
    cube.set(Seq("2021", "Jan", "North", "sedan", "Sales"), 100.0)
    cube.set(Seq("2021", "Feb", "North", "sedan", "Sales"), 130.0)
    val feb = cube.get(Seq("2021", "Feb", "North", "sedan", "Cost"))
    assert(feb.contains(30.0)) // 130 - 100
    // Jan has no previous month → shift yields None → treated as 0 by Sub
    assert(cube.get(Seq("2021", "Jan", "North", "sedan", "Cost")).contains(100.0))
  }

  test("rule validation rejects unknown refs and triggers") {
    val db = TinyModel.build(spark)
    val cube = db.addCube("vsales", db.cube("sales").dimensions)
    intercept[IllegalArgumentException] {
      cube.registerRule(RuleDef(Map("nope" -> "Sales"), RuleScope.AllLevels,
        RuleExpr.Ref("Sales"), "bad1"))
    }
    intercept[IllegalArgumentException] {
      cube.registerRule(RuleDef(Map("measures" -> "Sales"), RuleScope.AllLevels,
        RuleExpr.Ref("NoSuchMember"), "bad2"))
    }
  }

  test("fact sources: csv round-trip and name-addressed import") {
    val db = TinyModel.build(spark)
    val cube = db.addCube("csales", db.cube("sales").dimensions)
    cube.set(Seq("2021", "Jan", "North", "sedan", "Sales"), 42.0)
    cube.compact()
    val tmp = java.nio.file.Files.createTempDirectory("graftcsv").toString
    FactSources.writeCsv(cube.facts, s"$tmp/facts")
    val back = FactSources.readCsv(spark, s"$tmp/facts", cube.nDims)
    assert(back.collect().toSeq == cube.facts.collect().toSeq)

    // name-addressed import (bulk load path)
    import spark.implicits._
    val recs = Seq(
      ("2022", "Feb", "South", "van", "Sales", 7.0),
      ("2022", "Mar", "East", "trucks", "Cost", 3.0))
      .toDF("years", "months", "regions", "products", "measures", "value")
    val ids = FactSources.importNamed(cube, recs)
    assert(ids.columns.toSeq == cube.dimCols :+ "value")
    cube.replaceFacts(cube.facts.unionByName(ids))
    assert(cube.get(Seq("2022", "Feb", "South", "van", "Sales")).contains(7.0))
    assert(cube.get(Seq("2022", "Year", "Total", "Total", "Cost")).contains(3.0))

    // aggregate-addressed records drop like unknown names (leaf-only
    // resolution, mirroring set's leaf gate): landing 'Total' at its
    // aggregate id would double-count under the identity-rollup elision
    val agg = Seq(("2022", "Feb", "Total", "van", "Sales", 99.0))
      .toDF("years", "months", "regions", "products", "measures", "value")
    assert(FactSources.importNamed(cube, agg).isEmpty)
  }

  test("fact sources: orc round-trip") {
    val db = TinyModel.build(spark)
    val cube = db.addCube("osales", db.cube("sales").dimensions)
    cube.set(Seq("2021", "Jan", "North", "sedan", "Sales"), 42.0)
    cube.set(Seq("2021", "Feb", "South", "coupe", "Cost"), 7.0)
    cube.compact()
    val tmp = java.nio.file.Files.createTempDirectory("graftorc").toString
    FactSources.writeOrc(cube.facts, s"$tmp/facts")
    val back = FactSources.readOrc(spark, s"$tmp/facts", cube.nDims)
    assert(back.schema == cube.facts.schema)
    assert(back.collect().toSet == cube.facts.collect().toSet)
  }

  test("fact sources: json and parquet round-trips") {
    val db = TinyModel.build(spark)
    val cube = db.addCube("jsales", db.cube("sales").dimensions)
    cube.set(Seq("2021", "Jan", "North", "sedan", "Sales"), 42.0)
    cube.set(Seq("2021", "Feb", "South", "coupe", "Cost"), 7.0)
    cube.compact()
    val tmp = java.nio.file.Files.createTempDirectory("graftjson").toString
    FactSources.writeJson(cube.facts, s"$tmp/jfacts")
    val jback = FactSources.readJson(spark, s"$tmp/jfacts", cube.nDims)
    assert(jback.schema == cube.facts.schema)
    assert(jback.collect().toSet == cube.facts.collect().toSet)
    FactSources.writeParquet(cube.facts, s"$tmp/pfacts")
    val pback = FactSources.readParquet(spark, s"$tmp/pfacts")
    assert(pback.collect().toSet == cube.facts.collect().toSet)
  }

  test("partitioned parquet sink enables partition pruning") {
    val db = TinyModel.build(spark)
    val cube = db.addCube("psales", db.cube("sales").dimensions)
    cube.set(Seq("2021", "Jan", "North", "sedan", "Sales"), 1.0)
    cube.set(Seq("2022", "Jan", "North", "sedan", "Sales"), 2.0)
    cube.compact()
    val tmp = java.nio.file.Files.createTempDirectory("graftpart").toString
    FactSources.writePartitioned(cube.facts, s"$tmp/facts", Seq("d0"))
    val read = spark.read.parquet(s"$tmp/facts").filter(col("d0") === 0)
    val plan = read.queryExecution.executedPlan.toString
    assert(read.count() == 1)
    assert(plan.contains("PartitionFilters") || plan.contains("d0"))
  }

  test("view csv render and comment tooltips in html") {
    val db = TinyModel.build(spark)
    val cube = db.cube("sales")
    cube.set(Seq("2021", "Jan", "North", "sedan", "Sales"), 500.0)
    cube.addComment(Seq("2021", "Jan", "Total", "Total", "Sales"), "spike!", "eve")
    val view = new View(cube, ViewDef(
      filters = Seq("years" -> "2021", "regions" -> "Total", "products" -> "Total"),
      rows = AxisDef(Seq("months" -> Seq("Jan", "Feb"))),
      cols = AxisDef(Seq("measures" -> Seq("Sales")))))
    val csv = view.toCsv()
    assert(csv.startsWith("months,Sales"))
    assert(csv.contains("Jan"))
    val html = view.toHtml()
    assert(html.contains("title=\"eve: spike!\""))
  }
}
