package graft

import graft.olap._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-10 advice fixes: AGGREGATION_LEVEL rules on coarsened
  * summaries, trigger-less unsafe rules, the overlay fast path's value-type
  * and null handling, the command measure-axis convention, and maintain's
  * row-count emptiness test.
  */
class Round10FixesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def freshModel(tag: String) = {
    val db = TinyModel.build(spark)
    val c = db.cube("sales")
    val cube = new graft.core.Cube(s"sales_$tag", c.dimensions, spark, Some(c.facts))
    c.rules.foreach(cube.registerRule)
    cube.set(Seq("2021", "Jan", "North", "motorcycles", "Sales"), 123.0)
    cube.set(Seq("2021", "Feb", "North", "sedan", "Sales"), 456.0)
    cube.set(Seq("2021", "Jan", "North", "motorcycles", "Cost"), 100.0)
    cube.set(Seq("2021", "Apr", "South", "sports", "Sales"), 50.0)
    cube
  }

  test("AGGREGATION_LEVEL rule fires at grain addresses of a coarsened summary") {
    val cube = freshModel("r10agg")
    // margin = Profit / Sales, but scoped to AGGREGATED addresses only —
    // on the summary a quarter is a derived-catalog LEAF, so without the
    // ALL_LEVELS re-registration the rule never fires there and the
    // navigator would surface the stored (empty) cell
    cube.registerRule(RuleDef(
      trigger = Map("measures" -> "Profit in %"),
      scope = RuleScope.AggregationLevel,
      expr = RuleExpr.Div(RuleExpr.Ref("Profit"), RuleExpr.Ref("Sales")),
      name = "agg_margin"))
    val summary = Aggregates.materialize(cube, "sales_r10agg_q",
      Seq(None, Some(1), None, None, None))
    // the rule traveled, re-scoped to ALL_LEVELS
    assert(summary.rules.exists(r =>
      r.name == "agg_margin" && r.scope == RuleScope.AllLevels))
    val nav = new Aggregates.Navigator(cube, Seq(summary))
    val qAddr = Seq("2021", "Q1", "Total", "Total", "Profit in %")
    assert(nav.cubeFor(qAddr) eq summary)
    assert(cube.get(qAddr).isDefined)
    assert(nav.get(qAddr) == cube.get(qAddr)) // (579-100)/579 on both paths
    // year-level (an aggregate on the summary too) also matches
    val yAddr = Seq("2021", "Year", "Total", "Total", "Profit in %")
    assert(nav.get(yAddr) == cube.get(yAddr))
  }

  test("summary-unsafe rule without a resolvable trigger fails materialize loudly") {
    val cube = freshModel("r10trig")
    // a BASE_LEVEL rule with an empty trigger matches EVERY cell — no
    // unservable region can bound it, so a coarsened summary must refuse
    cube.registerRule(RuleDef(
      trigger = Map.empty,
      scope = RuleScope.BaseLevel,
      expr = RuleExpr.Mul(RuleExpr.Lit(2.0), RuleExpr.Lit(3.0)),
      name = "everywhere"))
    val ex = intercept[IllegalArgumentException] {
      Aggregates.materialize(cube, "sales_r10trig_q",
        Seq(None, Some(1), None, None, None))
    }
    assert(ex.getMessage.contains("everywhere"))
    // an uncoarsened summary (no grain) is still fine — the rule is safe there
    val flat = Aggregates.materialize(cube, "sales_r10trig_flat",
      Seq(None, None, None, None, None))
    assert(flat.rules.exists(_.name == "everywhere"))
  }

  test("non-Double summaries refresh through the frame rewrite, bit-identically") {
    val cube = freshModel("r10dec")
    // rewrite the fact frame as decimal(21,4) — the TPCH/100TB value shape
    import org.apache.spark.sql.functions._
    cube.replaceFacts(cube.facts.withColumn("value",
      col("value").cast(DecimalType(21, 4))))
    val summary = Aggregates.materialize(cube, "sales_r10dec_q",
      Seq(None, Some(1), None, None, None))
    // sum widens the precision; what matters is it is NOT Double
    assert(summary.facts.schema("value").dataType.isInstanceOf[DecimalType])
    cube.set(Seq("2021", "Jan", "North", "motorcycles", "Sales"), 200.0)
    val p = Aggregates.refreshPartial(cube, summary)
      .getOrElse(fail("point write after a bulk rewrite baseline must refresh"))
    // the refresh took the typed frame rewrite, NOT the Double overlay
    assert(Aggregates.metaOf(p).get.fastLayers == 0)
    assert(p.get(Seq("2021", "Q1", "Total", "Total", "Sales")).contains(656.0))
    val full = Aggregates.rebuild(cube, summary)
    assert(p.facts.collect().map(_.toSeq).toSet ==
      full.facts.collect().map(_.toSeq).toSet)
  }

  test("null aggregate in the overlay fast path is a tombstone, not a MatchError") {
    val cube = freshModel("r10null")
    val summary = Aggregates.materialize(cube, "sales_r10null_q",
      Seq(None, Some(1), None, None, None))
    // poison ONE stored cell with a null value (a raw-ingest shape the
    // write path itself never produces), then maintain over exactly it:
    // the recomputed grain cell aggregates to null → must tombstone
    val ids = cube.bolt(Seq("2021", "Apr", "South", "sports", "Sales")).ids
    import org.apache.spark.sql.functions._
    val pred = cube.dimCols.zipWithIndex
      .map { case (c, i) => col(c) === ids(i) }.reduce(_ && _)
    cube.replaceFacts(cube.facts.withColumn("value",
      when(pred, lit(null).cast("double")).otherwise(col("value"))))
    val schema = StructType(cube.dimCols.map(c =>
      StructField(c, IntegerType, nullable = true)) :+
      StructField("value", DoubleType, nullable = true))
    val batch = spark.createDataFrame(
      java.util.List.of(Row.fromSeq(ids.map(i => i: java.lang.Integer) :+ null)),
      schema)
    val m = Aggregates.maintain(cube, summary, batch)
    assert(m.isDefined, "a nameable batch must maintain, not decline")
    assert(m.get.get(Seq("2021", "Q2", "Total", "Total", "Sales")).isEmpty)
  }

  test("maintain declines (not re-anchors) on a batch with an all-null id column") {
    val cube = freshModel("r10nullid")
    val summary = Aggregates.materialize(cube, "sales_r10nullid_q",
      Seq(None, Some(1), None, None, None))
    cube.set(Seq("2021", "Feb", "North", "sedan", "Sales"), 999.0) // stale now
    val schema = StructType(cube.dimCols.map(c =>
      StructField(c, IntegerType, nullable = true)) :+
      StructField("value", DoubleType, nullable = true))
    // one row, but d0 is null — the touched cells cannot be named; treating
    // this as "empty batch" would re-anchor the STALE summary as fresh
    val vals: Seq[Any] = null +: cube.bolt(
      Seq("2021", "Feb", "North", "sedan", "Sales")).ids.tail
      .map(i => i: java.lang.Integer) :+ (999.0: java.lang.Double)
    val batch = spark.createDataFrame(
      java.util.List.of(Row.fromSeq(vals)), schema)
    assert(Aggregates.maintain(cube, summary, batch).isEmpty)
    // and the summary was NOT re-anchored: the navigator still sees it stale
    assert(!new Aggregates.Navigator(cube, Seq(summary)).fresh)
  }

  test("area command with >4 trigger entries pivots on the highest-index dim") {
    val db = TinyModel.build(spark)
    val cube = db.addCube("cmd5", db.cube("sales").dimensions)
    // five trigger entries — beyond Map's order-preserving size, so only
    // the explicit highest-index convention makes the measure axis stable
    cube.registerRule(RuleDef(
      trigger = Map("years" -> "2021", "months" -> "Jan", "regions" -> "North",
        "products" -> "sedan", "measures" -> "Cost"),
      scope = RuleScope.Command,
      expr = RuleExpr.Mul(RuleExpr.Ref("Sales"), RuleExpr.Lit(0.5)),
      name = "seed5"))
    cube.set(Seq("2021", "Jan", "North", "sedan", "Sales"), 100.0)
    cube.set(Seq("2021", "Feb", "North", "sedan", "Sales"), 40.0) // outside trigger
    val n = Rules.executeCommandArea(cube, "seed5", cube.area())
    assert(n == 1) // only the fully-pinned cell
    assert(cube.get(Seq("2021", "Jan", "North", "sedan", "Cost")).contains(50.0))
    assert(cube.get(Seq("2021", "Feb", "North", "sedan", "Cost")).isEmpty)
  }
}
