package graft

import graft.core._
import graft.olap._
import graft.sources.FactSources
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Reference parity for the write-path hook on BULK writes: every write
  * passes ON_ENTRY (≙ `cube.py:527-537`), not just per-cell `set` — bulk
  * import, area transforms/copies, and streaming ingest apply the cube's
  * Input-AST ON_ENTRY rules as one declarative column transform
  * ([[graft.olap.Rules.onEntryBulk]]), first matching rule wins per row.
  * Non-bulk-expressible rules (opaque `onEntryFn`, cell-reading exprs)
  * reject LOUDLY instead of silently skipping the hook.
  */
class OnEntryBulkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** t: All → (Jan, Feb); m: Sales, Cost — Cost enters negated: −abs(input). */
  private def model(tag: String): (Database, Cube) = {
    val db = new Database(s"oeb_$tag", spark)
    val t = db.addDimension("t")
    t.edit().add("All", Seq("Jan", "Feb")).commit()
    val m = db.addDimension("m")
    m.edit().addMany(Seq("Sales", "Cost")).commit()
    val cube = db.addCube("c", Seq(t, m))
    cube.registerRule(RuleDef(Map("m" -> "Cost"), RuleScope.OnEntry,
      RuleExpr.Neg(RuleExpr.Fn("abs", RuleExpr.Input)), "negate_costs"))
    (db, cube)
  }

  test("bulk import equals per-cell set under an ON_ENTRY rule") {
    import spark.implicits._
    val (db, cube) = model("imp")
    val recs = Seq(("Jan", "Sales", 10.0), ("Jan", "Cost", 5.0), ("Feb", "Cost", -3.0))
      .toDF("t", "m", "value")
    cube.replaceFacts(FactSources.importNamed(cube, recs))

    // per-cell reference: same rule, same writes through set()
    val ref = db.addCube("cref", cube.dimensions)
    ref.registerRule(cube.rules.head)
    ref.set(Seq("Jan", "Sales"), 10.0)
    ref.set(Seq("Jan", "Cost"), 5.0)
    ref.set(Seq("Feb", "Cost"), -3.0)
    for (addr <- Seq(Seq("Jan", "Sales"), Seq("Jan", "Cost"), Seq("Feb", "Cost"),
        Seq("All", "Cost"), Seq("All", "Sales")))
      assert(cube.get(addr) == ref.get(addr), s"mismatch at $addr")
    assert(cube.get(Seq("Jan", "Cost")).contains(-5.0)) // hook actually fired
    assert(cube.get(Seq("Feb", "Cost")).contains(-3.0)) // −abs(−3) = −3
  }

  test("area setValue/multiply/copyFrom pass the hook at the TARGET address") {
    val (_, cube) = model("area")
    cube.set(Seq("Jan", "Sales"), 10.0)
    cube.set(Seq("Feb", "Sales"), 20.0)
    cube.set(Seq("Jan", "Cost"), 4.0) // enters as −4 via the scalar hook

    // setValue on the Cost slice: 9.0 enters as −abs(9) = −9 per cell
    Area(cube, Seq("m" -> Seq("Cost"))).setValue(9.0)
    assert(cube.get(Seq("Jan", "Cost")).contains(-9.0))

    // multiply: (−9 × 2) = −18 enters as −abs(−18) = −18
    Area(cube, Seq("m" -> Seq("Cost"))).multiply(2.0)
    assert(cube.get(Seq("Jan", "Cost")).contains(-18.0))

    // area copy Sales → Cost: values land at m=Cost, so the hook fires for
    // them there (target-address trigger semantics, as per-cell set would)
    Area(cube, Seq("m" -> Seq("Cost")))
      .copyFrom(Area(cube, Seq("m" -> Seq("Sales"))))
    assert(cube.get(Seq("Jan", "Cost")).contains(-10.0))
    assert(cube.get(Seq("Feb", "Cost")).contains(-20.0))
    assert(cube.get(Seq("Jan", "Sales")).contains(10.0)) // source untouched

    // enumerated constant write over the Cost slice
    Area(cube, Seq("m" -> Seq("Cost"))).setValueEnumerated(7.0)
    assert(cube.get(Seq("Jan", "Cost")).contains(-7.0))
    assert(cube.get(Seq("All", "Cost")).contains(-14.0))
  }

  test("streaming ingest passes the hook per batch") {
    val (_, cube) = model("stream")
    val schema = StructType(Seq(StructField("d0", IntegerType),
      StructField("d1", IntegerType), StructField("value", DoubleType)))
    val t = cube.dimensions(0); val m = cube.dimensions(1)
    val rows = Seq(
      Row(t.idOf("Jan"), m.idOf("Cost"), 6.0),
      Row(t.idOf("Feb"), m.idOf("Sales"), 8.0))
    val tmp = java.nio.file.Files.createTempDirectory("graft_oe_stream").toString
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(tmp)
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(tmp)
    val q = graft.streaming.Streaming.ingestInto(cube, stream,
      org.apache.spark.sql.streaming.Trigger.AvailableNow())
    assert(q.awaitTermination(120000), "stream did not finish")
    assert(cube.get(Seq("Jan", "Cost")).contains(-6.0)) // hook fired
    assert(cube.get(Seq("Feb", "Sales")).contains(8.0)) // untriggered row clean
  }

  test("streaming ingest evaluates Ref rules against the batch's post-write state") {
    val (_, cube) = refModel("stream")
    cube.registerRule(RuleDef(Map("m" -> "Cost"), RuleScope.OnEntry,
      RuleExpr.Mul(RuleExpr.Input, RuleExpr.Ref("Fx")), "cost_times_fx"))
    cube.set(Seq("Jan", "Fx"), 10.0) // pre-existing ref cell
    val t = cube.dimensions(0); val m = cube.dimensions(1)
    val schema = StructType(Seq(StructField("d0", IntegerType),
      StructField("d1", IntegerType), StructField("value", DoubleType)))
    val rows = Seq(
      Row(t.idOf("Jan"), m.idOf("Cost"), 3.0),  // ref from pre-existing Fx
      Row(t.idOf("Feb"), m.idOf("Fx"), 5.0),    // ref cell IN the batch
      Row(t.idOf("Feb"), m.idOf("Cost"), 2.0))  // reads post-write state
    val tmp = java.nio.file.Files.createTempDirectory("graft_oeref_stream").toString
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(tmp)
    val stream = spark.readStream.schema(schema).parquet(tmp)
    val q = graft.streaming.Streaming.ingestInto(cube, stream,
      org.apache.spark.sql.streaming.Trigger.AvailableNow())
    assert(q.awaitTermination(120000), "stream did not finish")
    assert(cube.get(Seq("Jan", "Cost")).contains(30.0))
    assert(cube.get(Seq("Feb", "Cost")).contains(10.0))
    assert(cube.get(Seq("Feb", "Fx")).contains(5.0)) // untriggered row clean
  }

  test("first matching rule wins, including transformless placeholders") {
    import spark.implicits._
    val (_, cube) = model("order")
    // a PLACEHOLDER (no Input) registered FIRST for Sales shadows a later
    // doubling rule — same dispatch as the scalar path
    cube.registerRule(RuleDef(Map("m" -> "Sales"), RuleScope.OnEntry,
      RuleExpr.Lit(0), "placeholder_sales"))
    cube.registerRule(RuleDef(Map("m" -> "Sales"), RuleScope.OnEntry,
      RuleExpr.Mul(RuleExpr.Input, RuleExpr.Lit(2)), "double_sales_shadowed"))
    val recs = Seq(("Jan", "Sales", 11.0)).toDF("t", "m", "value")
    cube.replaceFacts(FactSources.importNamed(cube, recs))
    assert(cube.get(Seq("Jan", "Sales")).contains(11.0)) // neither 0 nor 22
  }

  test("round() agrees between scalar and bulk paths on negative halves") {
    import spark.implicits._
    val (_, cube) = model("round")
    cube.registerRule(RuleDef(Map("m" -> "Sales"), RuleScope.OnEntry,
      RuleExpr.Fn("round", RuleExpr.Input), "round_sales"))
    cube.set(Seq("Jan", "Sales"), -2.5) // scalar hook
    val recs = Seq(("Feb", "Sales", -2.5)).toDF("t", "m", "value")
    cube.replaceFacts(cube.facts.unionByName(FactSources.importNamed(cube, recs)))
    // both paths HALF_UP away from zero (Spark round semantics) — the old
    // scalar math.round would store -2 here while bulk stored -3
    assert(cube.get(Seq("Jan", "Sales")).contains(-3.0))
    assert(cube.get(Seq("Feb", "Sales")).contains(-3.0))
  }

  test("opaque onEntryFn rejects bulk writes; Ref rules reject AREA writes loudly") {
    import spark.implicits._
    val (_, fnCube) = model("fn")
    fnCube.registerRule(RuleDef(Map("m" -> "Sales"), RuleScope.OnEntry,
      RuleExpr.Input, "scala_fn", onEntryFn = Some(v => v * 2)))
    val recs = Seq(("Jan", "Sales", 1.0)).toDF("t", "m", "value")
    val e1 = intercept[IllegalArgumentException](FactSources.importNamed(fnCube, recs))
    assert(e1.getMessage.contains("onEntryFn"))

    // Ref-bearing ON_ENTRY rules are importable (compute-then-write below)
    // but AREA transforms keep the loud column-only boundary
    val (_, refCube) = model("ref2")
    refCube.registerRule(RuleDef(Map("m" -> "Sales"), RuleScope.OnEntry,
      RuleExpr.Add(RuleExpr.Input, RuleExpr.Ref("Cost")), "reads_cells"))
    val e2 = intercept[IllegalArgumentException](
      Area(refCube, Seq("m" -> Seq("Sales"))).setValue(9.0))
    assert(e2.getMessage.contains("reads other cells"))
    // …and the per-cell path still works for exactly these rules
    refCube.set(Seq("Jan", "Cost"), 4.0)
    refCube.set(Seq("Jan", "Sales"), 1.0)
    assert(refCube.get(Seq("Jan", "Sales")).contains(1.0 + -4.0)) // Cost entered as −4
  }

  /** t: All → (Jan, Feb); m: Sales, Cost, Fx — no standing rules. */
  private def refModel(tag: String): (Database, Cube) = {
    val db = new Database(s"oer_$tag", spark)
    val t = db.addDimension("t")
    t.edit().add("All", Seq("Jan", "Feb")).commit()
    val m = db.addDimension("m")
    m.edit().addMany(Seq("Sales", "Cost", "Fx")).commit()
    (db, db.addCube("c", Seq(t, m)))
  }

  test("ON_ENTRY rule with a Ref applies identically via per-cell set and bulk import") {
    import spark.implicits._
    val (db, cube) = refModel("imp")
    // Cost enters scaled by the sibling Fx cell: input × [Fx]
    val rule = RuleDef(Map("m" -> "Cost"), RuleScope.OnEntry,
      RuleExpr.Mul(RuleExpr.Input, RuleExpr.Ref("Fx")), "cost_times_fx")
    cube.registerRule(rule)
    cube.set(Seq("Jan", "Fx"), 10.0) // PRE-EXISTING ref cell
    val recs = Seq(
      ("Jan", "Cost", 3.0),  // ref reads the pre-existing Fx → 30
      ("Feb", "Fx", 5.0),    // ref cell arriving IN the same batch
      ("Feb", "Cost", 2.0),  // reads the post-write state → 10
      ("Feb", "Sales", 7.0)) // untriggered row passes through
      .toDF("t", "m", "value")
    cube.replaceFacts(cube.facts.unionByName(FactSources.importNamed(cube, recs)))

    // per-cell reference: same rule, ref cells written BEFORE their readers
    // (the write order the post-write bulk semantics correspond to)
    val ref = db.addCube("cref", cube.dimensions)
    ref.registerRule(rule)
    ref.set(Seq("Jan", "Fx"), 10.0)
    ref.set(Seq("Feb", "Fx"), 5.0)
    ref.set(Seq("Jan", "Cost"), 3.0)
    ref.set(Seq("Feb", "Cost"), 2.0)
    ref.set(Seq("Feb", "Sales"), 7.0)
    for (addr <- Seq(Seq("Jan", "Cost"), Seq("Feb", "Cost"), Seq("Feb", "Sales"),
        Seq("Jan", "Fx"), Seq("Feb", "Fx"), Seq("All", "Cost"), Seq("All", "Sales")))
      assert(cube.get(addr) == ref.get(addr), s"mismatch at $addr")
    assert(cube.get(Seq("Jan", "Cost")).contains(30.0))
    assert(cube.get(Seq("Feb", "Cost")).contains(10.0))
  }

  test("bulk Ref rule over an ABSENT ref cell keeps the incoming value (None parity)") {
    import spark.implicits._
    val (db, cube) = refModel("absent")
    val rule = RuleDef(Map("m" -> "Cost"), RuleScope.OnEntry,
      RuleExpr.Mul(RuleExpr.Input, RuleExpr.Ref("Fx")), "cost_times_fx")
    cube.registerRule(rule)
    // no Fx anywhere: scalar set() computes None and keeps the input
    val recs = Seq(("Jan", "Cost", 2.0)).toDF("t", "m", "value")
    cube.replaceFacts(FactSources.importNamed(cube, recs))
    val ref = db.addCube("cref", cube.dimensions)
    ref.registerRule(rule)
    ref.set(Seq("Jan", "Cost"), 2.0)
    assert(ref.get(Seq("Jan", "Cost")).contains(2.0))
    assert(cube.get(Seq("Jan", "Cost")) == ref.get(Seq("Jan", "Cost")))
    // Add treats the absent ref as 0 in BOTH paths (not None)
    val (db2, cube2) = refModel("absent2")
    val addRule = RuleDef(Map("m" -> "Cost"), RuleScope.OnEntry,
      RuleExpr.Add(RuleExpr.Input, RuleExpr.Ref("Fx")), "cost_plus_fx")
    cube2.registerRule(addRule)
    cube2.replaceFacts(FactSources.importNamed(cube2,
      Seq(("Jan", "Cost", 2.0)).toDF("t", "m", "value")))
    val ref2 = db2.addCube("cref", cube2.dimensions)
    ref2.registerRule(addRule)
    ref2.set(Seq("Jan", "Cost"), 2.0)
    assert(cube2.get(Seq("Jan", "Cost")) == ref2.get(Seq("Jan", "Cost")))
  }

  test("order-dependent bulk Ref shapes reject loudly instead of guessing") {
    import spark.implicits._
    val recs = Seq(("Jan", "Cost", 1.0)).toDF("t", "m", "value")

    // a referenced member that is itself rule-transformed: what the ref
    // reads depends on write order — reject
    val (_, c1) = refModel("both")
    c1.registerRule(RuleDef(Map("m" -> "Fx"), RuleScope.OnEntry,
      RuleExpr.Mul(RuleExpr.Input, RuleExpr.Lit(2)), "double_fx"))
    c1.registerRule(RuleDef(Map("m" -> "Cost"), RuleScope.OnEntry,
      RuleExpr.Mul(RuleExpr.Input, RuleExpr.Ref("Fx")), "cost_times_fx"))
    val e1 = intercept[IllegalArgumentException](FactSources.importNamed(c1, recs))
    assert(e1.getMessage.contains("write order"))

    // a transforming rule that does NOT pin the ref dimension can transform
    // arbitrary cells of it, including ref'd ones — reject
    val (_, c2) = refModel("nopin")
    c2.registerRule(RuleDef(Map("t" -> "Jan"), RuleScope.OnEntry,
      RuleExpr.Mul(RuleExpr.Input, RuleExpr.Lit(2)), "double_jan"))
    c2.registerRule(RuleDef(Map("m" -> "Cost"), RuleScope.OnEntry,
      RuleExpr.Mul(RuleExpr.Input, RuleExpr.Ref("Fx")), "cost_times_fx"))
    val e2 = intercept[IllegalArgumentException](FactSources.importNamed(c2, recs))
    assert(e2.getMessage.contains("pin"))

    // a transforming rule whose trigger member was REMOVED can never match:
    // it must not trip the pin guard (scalar silent-never-match contract) —
    // the import with the surviving ref rule still works
    val (db4, c4) = refModel("removedtrig")
    c4.registerRule(RuleDef(Map("m" -> "Sales"), RuleScope.OnEntry,
      RuleExpr.Mul(RuleExpr.Input, RuleExpr.Lit(2)), "double_sales"))
    c4.registerRule(RuleDef(Map("m" -> "Cost"), RuleScope.OnEntry,
      RuleExpr.Mul(RuleExpr.Input, RuleExpr.Ref("Fx")), "cost_times_fx"))
    c4.set(Seq("Jan", "Fx"), 10.0)
    db4.dimension("m").edit().remove("Sales").commit()
    val out = FactSources.importNamed(c4, recs) // Cost rule still applies
    c4.replaceFacts(c4.facts.unionByName(out))
    assert(c4.get(Seq("Jan", "Cost")).contains(10.0)) // 1.0 × Fx(10)

    // relative Shift refs stay per-cell-only
    val (_, c3) = refModel("shift")
    c3.registerRule(RuleDef(Map("m" -> "Cost"), RuleScope.OnEntry,
      RuleExpr.Add(RuleExpr.Input, RuleExpr.Shift("t", -1)), "prev_month"))
    val e3 = intercept[IllegalArgumentException](FactSources.importNamed(c3, recs))
    assert(e3.getMessage.contains("Shift"))
  }
}
