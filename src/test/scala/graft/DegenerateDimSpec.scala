package graft

import graft.core.{Database, Dimension}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate dimensions (ARCHITECTURE §7): member ids live only as fact-
  * column values — no driver catalog, no broadcast closure — so a 10M-member
  * customer grain builds and queries far past the Dimension.MaxMembers
  * boundary that refuses catalog dimensions.
  */
class DegenerateDimSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** 200k fact rows whose customer keys spread over [0, 10M) in steps of 50 —
    * a 10M-member key space no catalog could hold on the driver.
    */
  private lazy val model: (Database, graft.core.Cube) = {
    val db = new Database("degendb", spark)
    val cust = db.addDegenerateDimension("customer", "C#")
    val reg = db.addDimension("region")
    reg.edit().add("Total", Seq("North", "South")).commit()
    val n = 200000
    val rows = (0 until n).map { i =>
      Row(i * 50, reg.idOf(if (i % 2 == 0) "North" else "South"), (i % 100).toDouble)
    }
    val schema = StructType(Seq(StructField("d0", IntegerType),
      StructField("d1", IntegerType), StructField("value", DoubleType)))
    val facts = spark.createDataFrame(spark.sparkContext.parallelize(rows, 8), schema)
    val cube = db.addCube("sales", Seq(cust, reg), facts)
    (db, cube)
  }

  test("functional member mapping: parse ids anywhere in the 10M space") {
    val cust = model._1.dimension("customer")
    assert(cust.isDegenerate)
    assert(cust.idOf("C#9999950") == 9999950)
    assert(cust.nameOf(9999950) == "C#9999950")
    assert(cust.idOf("All") == Dimension.DegenerateAllId)
    assert(cust.levelOf(9999950) == 0 && cust.levelOf(Dimension.DegenerateAllId) == 1)
    assert(cust.contains("C#0") && !cust.contains("D#5") && !cust.contains("C#x"))
    assert(cust.defaultMember.name == "All")
  }

  test("no catalog to edit — and the cap guard names the degenerate API") {
    val cust = model._1.dimension("customer")
    val e = intercept[IllegalArgumentException](cust.edit())
    assert(e.getMessage.contains("degenerate"))
  }

  test("point read / write at raw keys; aggregated write to All rejected") {
    val cube = model._2
    // row i=124 (even → North): key 6200, value 24
    assert(cube.get(Seq("C#6200", "North")).contains(24.0))
    assert(cube.get(Seq("C#37", "North")).isEmpty) // off-grid key: no cell
    val e = intercept[IllegalArgumentException](cube.set(Seq("All", "North"), 1.0))
    assert(e.getMessage.contains("aggregated"))
    cube.set(Seq("C#6200", "North"), 1000.0)
    assert(cube.get(Seq("C#6200", "North")).contains(1000.0))
    assert(cube.get(Seq("C#6200", "Total")).contains(1000.0))
    cube.set(Seq("C#6200", "North"), 24.0) // restore for later tests
  }

  test("the All member rolls up the whole key space without any closure") {
    val cube = model._2
    val expected = (0 until 200000).map(i => (i % 100).toDouble).sum
    assert(cube.get(Seq("All", "Total")).contains(expected))
    // unmentioned degenerate dimension defaults to All in grids
    val g = cube.gridAggregate(Seq(
      Seq(Dimension.DegenerateAllId),
      Seq(model._1.dimension("region").idOf("North"))))
    val v = g.select(col("value").cast("double")).collect().map(_.getDouble(0))
    val expN = (0 until 200000 by 2).map(i => (i % 100).toDouble).sum
    assert(v.toSeq == Seq(expN))
  }

  test("grids group by raw keys via pushed-down filters (no join)") {
    val cube = model._2
    val reg = model._1.dimension("region")
    val keys = Seq(0, 50, 100, 9999950)
    val g = cube.gridAggregate(Seq(keys, Seq(reg.idOf("Total"))))
    val got = g.select(col("a0"), col("value").cast("double")).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    // keys i*50 for i=0,1,2 and i=199999 → values i%100
    assert(got == Map(0 -> 0.0, 50 -> 1.0, 100 -> 2.0, 9999950 -> 99.0))
    // the plan must contain no join for the degenerate dimension: only the
    // region closure join survives (one BroadcastHashJoin / BroadcastNLJ max)
    val plan = g.queryExecution.executedPlan.toString
    val nJoins = "(?i)join".r.findAllIn(plan).length
    assert(nJoins <= 4, s"unexpected join fan in degenerate grid plan:\n$plan")
  }

  test("mixing All with raw keys in one selection is rejected loudly") {
    val cube = model._2
    val e = intercept[IllegalArgumentException](cube.gridAggregate(Seq(
      Seq(Dimension.DegenerateAllId, 50),
      Seq(model._1.dimension("region").idOf("Total")))))
    assert(e.getMessage.contains("all-member"))
  }

  test("area records compute functional names in place (no catalog join)") {
    val cube = model._2
    val area = cube.area("customer" -> Seq("C#0", "C#50", "C#100"))
    val recs = area.records.collect()
      .map(r => (r.getAs[String]("customer"), r.getAs[String]("region"),
        r.getAs[Number]("value").doubleValue()))
    // a catalog join against the EMPTY degenerate member frame would have
    // silently dropped every record
    assert(recs.toSet == Set(("C#0", "North", 0.0), ("C#50", "South", 1.0),
      ("C#100", "North", 2.0)))
  }

  test("enumeration demands explicit raw keys; purge keeps catalog-less dims") {
    val cube = model._2
    // enumeration without explicit keys for the degenerate dim: loud reject
    val e = intercept[IllegalArgumentException](
      cube.area("region" -> Seq("North")).setValueEnumerated(7.0))
    assert(e.getMessage.contains("degenerate"))
    // with explicit keys it enumerates the cross product
    cube.area("customer" -> Seq("C#25"), "region" -> Seq("North")).setValueEnumerated(7.0)
    assert(cube.get(Seq("C#25", "North")).contains(7.0))
    // purgeUnknownMembers must not treat the catalog-less dim as all-unknown
    val before = cube.cellsCount
    cube.purgeUnknownMembers()
    assert(cube.cellsCount == before)
    cube.delete(Seq("C#25", "North")) // restore
  }

  test("degenerate contract round-trips through JSON save/load") {
    val dir = java.nio.file.Files.createTempDirectory("degen_saveload").toString
    model._1.save(dir)
    val db2 = Database.load(dir, spark)
    val cust2 = db2.dimension("customer")
    assert(cust2.isDegenerate && cust2.degeneratePrefix.contains("C#"))
    assert(cust2.idOf("C#9999950") == 9999950 && cust2.idOf("All") == Dimension.DegenerateAllId)
    assert(db2.cube("sales").get(Seq("C#6200", "North")).contains(24.0))
  }

  test("functional name parse: case-insensitive prefix, canonical numerals only") {
    val cust = model._1.dimension("customer")
    assert(cust.idOf("c#7") == 7)        // prefix case-insensitive
    assert(!cust.contains("C#007"))      // zero-padded alias rejected
    assert(!cust.contains("C#+7"))       // signed spelling rejected
    assert(!cust.contains("C#"))         // empty numeral
  }

  test("importNamed parses functional names in place; junk names drop, never mis-map") {
    import spark.implicits._
    val recs = Seq(
      ("C#6200", "North", 5.0),  // valid
      ("c#50", "South", 6.0),    // prefix case-insensitive
      ("C#007", "North", 7.0),   // non-canonical numeral: dropped
      ("D#1", "North", 8.0),     // wrong prefix: dropped
      ("All", "North", 9.0))     // aggregated name: dropped (not a base key)
      .toDF("customer", "region", "value")
    val got = graft.sources.FactSources.importNamed(model._2, recs)
      .collect().map(r => (r.getInt(0), r.getDouble(2))).toSet
    assert(got == Set((6200, 5.0), (50, 6.0)))
  }

  test("baseRuleGrid on a degenerate dim: All → constant key, raw keys → pushed filter") {
    import graft.olap.{RuleDef, RuleExpr, RuleScope, Rules}
    val db = new Database("degenrule", spark)
    val cust = db.addDegenerateDimension("customer", "K#")
    val reg = db.addDimension("region")
    reg.edit().add("Total", Seq("North", "South")).commit()
    val meas = db.addDimension("measures")
    meas.edit().addMany(Seq("gross", "disc", "plan")).commit()
    val rows = Seq(
      Row(5, reg.idOf("North"), meas.idOf("gross"), 100.0),
      Row(5, reg.idOf("North"), meas.idOf("disc"), 10.0),
      Row(10, reg.idOf("South"), meas.idOf("gross"), 50.0),
      Row(10, reg.idOf("South"), meas.idOf("disc"), 5.0))
    val schema = StructType(Seq(StructField("d0", IntegerType),
      StructField("d1", IntegerType), StructField("d2", IntegerType),
      StructField("value", DoubleType)))
    val cube = db.addCube("ruled", Seq(cust, reg, meas),
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema))
    val rule = RuleDef(trigger = Map("measures" -> "plan"), scope = RuleScope.BaseLevel,
      expr = RuleExpr.Sub(RuleExpr.Ref("gross"), RuleExpr.Ref("disc")), name = "plan_rule")
    cube.registerRule(rule)
    // the All member previously crashed here: level 1 ⇒ not allLeaf ⇒
    // closureDf on a closure-less degenerate dim
    val gAll = Rules.baseRuleGrid(cube, rule,
      Seq(Seq(Dimension.DegenerateAllId), Seq(reg.idOf("Total")), Nil), 2)
    val vAll = gAll.select(col("a0"), col("value").cast("double")).collect()
      .map(r => r.getInt(0) -> r.getDouble(1))
    assert(vAll.toSeq == Seq(Dimension.DegenerateAllId -> 135.0))
    // raw keys: grouped by the fact column itself, filter pushed down
    val gRaw = Rules.baseRuleGrid(cube, rule,
      Seq(Seq(5, 10), Seq(reg.idOf("Total")), Nil), 2)
    val vRaw = gRaw.select(col("a0"), col("value").cast("double")).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(vRaw == Map(5 -> 90.0, 10 -> 45.0))
    // no closure join may appear for the degenerate dimension
    val plan = gRaw.queryExecution.executedPlan.toString
    assert(!plan.contains("leaf_0"), s"degenerate dim leaked a closure join:\n$plan")
    // mixing All with raw keys stays loudly rejected on this path too
    val e = intercept[IllegalArgumentException](Rules.baseRuleGrid(cube, rule,
      Seq(Seq(Dimension.DegenerateAllId, 5), Seq(reg.idOf("Total")), Nil), 2))
    assert(e.getMessage.contains("all-member"))
  }

  test("SQL grids name degenerate members functionally; attributes rejected") {
    val df = graft.olap.OlapQuery(model._1,
      "SELECT customer, value FROM sales WHERE customer = 'C#6200', region = North")
    val rows = df.collect().map(r =>
      (r.getAs[String]("customer"), r.getAs[Number]("value").doubleValue()))
    assert(rows.toSeq == Seq(("C#6200", 24.0)))
    val e = intercept[IllegalArgumentException](graft.olap.OlapQuery(model._1,
      "SELECT customer.segment, value FROM sales WHERE region = North"))
    assert(e.getMessage.contains("no attributes"))
  }
}
