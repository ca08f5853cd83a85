package graft

import graft.core._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 fixes.
  *
  * Enumeration cartesian guard (r7 verdict #3): `enumerateDataSpace=true` is
  * reference-mandated semantics (`area.py:140-192`) but an accidental
  * cartesian bomb on a high-cardinality area — the leaf cross-product size is
  * known on the driver for free, so an oversized enumeration must fail loudly
  * BEFORE launching the job, with the estimate in the message.
  */
class Round8FixesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def bigModel(tag: String, n: Int): (Database, Cube) = {
    val db = new Database(s"r8_$tag", spark)
    val a = db.addDimension("a")
    a.edit().add("All", (1 to n).map(i => s"a$i")).commit()
    val b = db.addDimension("b")
    b.edit().add("All", (1 to n).map(i => s"b$i")).commit()
    val c = db.addDimension("c")
    c.edit().add("All", (1 to n).map(i => s"c$i")).commit()
    (db, db.addCube("cube", Seq(a, b, c)))
  }

  test("oversized enumerateDataSpace fails loudly with the estimated size") {
    val (_, cube) = bigModel("boom", 600) // 600^3 = 2.16e8 > default 1e8 cap
    val area = cube.area()
    val e1 = intercept[IllegalArgumentException] { area.addresses(enumerateDataSpace = true) }
    assert(e1.getMessage.contains("cells"))
    assert(e1.getMessage.contains("maxCells"))
    val e2 = intercept[IllegalArgumentException] { area.setValueEnumerated(1.0) }
    assert(e2.getMessage.contains("cells"))
  }

  test("narrowed pattern passes the guard; raised cap admits the big product") {
    val (db, cube) = bigModel("ok", 600)
    // narrowing one dimension to a single member takes 2.16e8 → 3.6e5: fine
    val narrow = cube.area("a" -> Seq("a1"))
    assert(narrow.addresses(enumerateDataSpace = true).count() == 600L * 600L)
    // explicit opt-in via conf admits the big product (estimate only — don't
    // actually run the 2e8-row job in a unit test)
    spark.conf.set("spark.graft.enum.maxCells", "1000000000")
    try {
      val df = cube.area().addresses(enumerateDataSpace = true)
      assert(df.columns.toSeq == Seq("a", "b", "c")) // plan built, not executed
    } finally spark.conf.unset("spark.graft.enum.maxCells")
  }

  test("cross-cube rule: LC×exrate with attribute-mapped currency (reference rules.py:125-139 shape)") {
    import graft.olap._
    val db = new Database("r8_fx", spark)
    // exrates cube: one dimension (currency), one rate per code
    val cur = db.addDimension("currency")
    cur.edit().addMany(Seq("EUR", "USD", "YEN")).commit()
    val exrates = db.addCube("exrates", Seq(cur))
    exrates.set(Seq("EUR"), 1.1)
    exrates.set(Seq("USD"), 1.0)
    exrates.set(Seq("YEN"), 0.007)
    // sales cube: region × measure{LC, GC}; each region's currency is an
    // ATTRIBUTE of the region member — the rule maps it into the lookup
    val reg = db.addDimension("region")
    reg.edit().add("World", Seq("de", "us", "jp")).commit()
    reg.addAttribute("cur")
    reg.setAttribute("cur", "de", "EUR")
    reg.setAttribute("cur", "us", "USD")
    reg.setAttribute("cur", "jp", "YEN")
    val m = db.addDimension("m")
    m.edit().addMany(Seq("LC", "GC")).commit()
    val sales = db.addCube("sales", Seq(reg, m))
    sales.set(Seq("de", "LC"), 100.0)
    sales.set(Seq("us", "LC"), 50.0)
    sales.set(Seq("jp", "LC"), 1000.0)
    sales.registerRule(RuleDef(Map("m" -> "GC"), RuleScope.AllLevels,
      RuleExpr.Mul(RuleExpr.Ref("LC"),
        RuleExpr.CubeRef("exrates", Seq(RuleExpr.CubeRefPart.AttrOf("region", "cur")))),
      "lc_to_gc"))
    assert(sales.get(Seq("de", "GC")).contains(100.0 * 1.1))
    assert(sales.get(Seq("us", "GC")).contains(50.0))
    assert(sales.get(Seq("jp", "GC")).contains(1000.0 * 0.007))
    // Carry + Fixed parts: a 2-dim rates cube addressed by the SAME region
    // member name plus a literal scenario member
    val scen = db.addDimension("scenario")
    scen.edit().addMany(Seq("spot", "plan")).commit()
    val reg2 = db.addDimension("regionmirror")
    reg2.edit().addMany(Seq("de", "us", "jp")).commit()
    val rates2 = db.addCube("rates2", Seq(reg2, scen))
    rates2.set(Seq("de", "spot"), 2.0)
    rates2.set(Seq("us", "spot"), 3.0)
    rates2.set(Seq("jp", "spot"), 4.0)
    // NOTE: Carry resolves by member NAME in THIS cube's dim, looked up in
    // the target cube's dimension of the same position
    sales.registerRule(RuleDef(Map("m" -> "LC"), RuleScope.AggregationLevel,
      RuleExpr.Lit(0.0), "noop_guard")) // ensure multiple rules coexist
    val doubled = RuleDef(Map("m" -> "GC"), RuleScope.AllLevels,
      RuleExpr.Mul(RuleExpr.Ref("LC"),
        RuleExpr.CubeRef("rates2", Seq(
          RuleExpr.CubeRefPart.Carry("region"), RuleExpr.CubeRefPart.Fixed("spot")))),
      "lc_to_gc") // replaces by name
    sales.removeRule("lc_to_gc")
    sales.registerRule(doubled)
    assert(sales.get(Seq("de", "GC")).contains(200.0))
    assert(sales.get(Seq("us", "GC")).contains(150.0))
  }

  test("cross-cube rule survives save/load through the JSON AST") {
    import graft.olap._
    val db = new Database("r8_fxp", spark)
    val cur = db.addDimension("currency")
    cur.edit().addMany(Seq("EUR")).commit()
    val ex = db.addCube("exrates", Seq(cur))
    ex.set(Seq("EUR"), 1.25)
    val reg = db.addDimension("region")
    reg.edit().addMany(Seq("de")).commit()
    reg.addAttribute("cur"); reg.setAttribute("cur", "de", "EUR")
    val m = db.addDimension("m")
    m.edit().addMany(Seq("LC", "GC")).commit()
    val sales = db.addCube("sales", Seq(reg, m))
    sales.set(Seq("de", "LC"), 8.0)
    sales.registerRule(RuleDef(Map("m" -> "GC"), RuleScope.AllLevels,
      RuleExpr.Mul(RuleExpr.Ref("LC"),
        RuleExpr.CubeRef("exrates", Seq(RuleExpr.CubeRefPart.AttrOf("region", "cur")))),
      "fx"))
    assert(sales.get(Seq("de", "GC")).contains(10.0))
    val dir = java.nio.file.Files.createTempDirectory("graftfx").toString
    db.save(dir)
    val db2 = Database.load(dir, spark)
    assert(db2.cube("sales").get(Seq("de", "GC")).contains(10.0))
  }

  test("cross-cube rule error paths raise #REF! sentinels") {
    import graft.olap._
    val db = new Database("r8_fxe", spark)
    val reg = db.addDimension("region")
    reg.edit().addMany(Seq("de")).commit()
    val m = db.addDimension("m")
    m.edit().addMany(Seq("LC", "GC")).commit()
    val sales = db.addCube("sales", Seq(reg, m))
    sales.set(Seq("de", "LC"), 1.0)
    // unknown target cube: registration-time validation rejects it
    val eReg = intercept[IllegalArgumentException] {
      sales.registerRule(RuleDef(Map("m" -> "GC"), RuleScope.AllLevels,
        RuleExpr.CubeRef("nope", Seq(RuleExpr.CubeRefPart.Carry("region"))), "bad"))
    }
    assert(eReg.getMessage.contains("unknown cube"))
    // missing attribute VALUE surfaces as a #REF! error cell at read time
    val cur = db.addDimension("currency")
    cur.edit().addMany(Seq("EUR")).commit()
    db.addCube("exrates", Seq(cur))
    reg.addAttribute("cur") // attribute field exists, but 'de' has no value
    sales.registerRule(RuleDef(Map("m" -> "GC"), RuleScope.AllLevels,
      RuleExpr.CubeRef("exrates", Seq(RuleExpr.CubeRefPart.AttrOf("region", "cur"))),
      "fx"))
    val cell = sales.getCell(Seq("de", "GC"))
    assert(cell.collect { case graft.core.CellValue.Err(c) => c }.contains("#REF!"))
  }

  test("guarded small enumeration still enumerates the full data space") {
    val db = new Database("r8_small", spark)
    val d = db.addDimension("d")
    d.edit().add("All", Seq("x", "y")).commit()
    val o = db.addDimension("o")
    o.edit().add("ALL", Seq("p", "q", "r")).commit()
    val cube = db.addCube("c", Seq(d, o))
    cube.set(Seq("x", "p"), 1.0) // one stored cell; enumeration ignores storage
    assert(cube.area().addresses(enumerateDataSpace = true).count() == 6)
    cube.area().setValueEnumerated(2.0)
    assert(cube.get(Seq("All", "ALL")).contains(12.0))
  }
}
