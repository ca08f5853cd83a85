package graft

import graft.core.Database
import graft.olap._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-cube rule references ([[RuleExpr.CubeRef]]) in GRID mode (r8 ask
  * #6): a view whose column axis carries CubeRef-backed members resolves the
  * target cube's slice via ONE broadcast join per distinct ref shape — the
  * reference's currency-conversion report (`samples/rules.py:125-139`)
  * rendered as a single job, not one scalar read per row. Scalar/grid parity
  * is the core assertion: every grid cell must equal the per-cell read.
  */
class ViewCubeRefSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val db = {
    val db = new Database("viewfx", spark)
    val cur = db.addDimension("currency")
    cur.edit().addMany(Seq("EUR", "USD", "JPY")).commit()
    val exrates = db.addCube("exrates", Seq(cur))
    exrates.set(Seq("EUR"), 1.1)
    exrates.set(Seq("USD"), 1.0) // JPY: deliberately NO stored rate
    val scen = db.addDimension("scen")
    scen.edit().addMany(Seq("actual", "plan")).commit()
    val fx2 = db.addCube("fx2", Seq(cur, scen))
    fx2.set(Seq("EUR", "actual"), 2.0)
    fx2.set(Seq("USD", "actual"), 3.0)
    fx2.set(Seq("JPY", "actual"), 0.25)
    // the target cube's OWN rule: plan rates = 2 x actual — the slice fetch
    // must fire it (rule-aware ruledGrid, not a raw fact scan)
    fx2.registerRule(RuleDef(Map("scen" -> "plan"), RuleScope.AllLevels,
      RuleExpr.Mul(RuleExpr.Ref("actual"), RuleExpr.Lit(2.0)), "plan_double"))
    val reg = db.addDimension("region")
    reg.edit().add("World", Seq("de", "us", "fr", "jp")).commit()
    reg.addAttribute("cur")
    Seq("de" -> "EUR", "us" -> "USD", "fr" -> "EUR", "jp" -> "JPY")
      .foreach { case (r, c) => reg.setAttribute("cur", r, c) } // World: none
    val m = db.addDimension("m")
    m.edit().addMany(Seq("LC", "GC", "GC2", "GC3", "GC4")).commit()
    val sales = db.addCube("sales", Seq(reg, m))
    Seq("de" -> 100.0, "us" -> 200.0, "fr" -> 40.0, "jp" -> 7.0)
      .foreach { case (r, v) => sales.set(Seq(r, "LC"), v) }
    def gcRule(name: String, expr: RuleExpr) =
      sales.registerRule(RuleDef(Map("m" -> name), RuleScope.AllLevels,
        RuleExpr.Mul(RuleExpr.Ref("LC"), expr), s"rule_$name"))
    // attribute-mapped lookup (the canonical currency shape)
    gcRule("GC", RuleExpr.CubeRef("exrates",
      Seq(RuleExpr.CubeRefPart.AttrOf("region", "cur"))))
    // attribute part + Fixed part on a 2-dim target
    gcRule("GC2", RuleExpr.CubeRef("fx2",
      Seq(RuleExpr.CubeRefPart.AttrOf("region", "cur"),
        RuleExpr.CubeRefPart.Fixed("actual"))))
    // slice address hits the TARGET's ruled member (plan = 2 x actual)
    gcRule("GC3", RuleExpr.CubeRef("fx2",
      Seq(RuleExpr.CubeRefPart.AttrOf("region", "cur"),
        RuleExpr.CubeRefPart.Fixed("plan"))))
    // fully pinned address → bounded scalar read path
    gcRule("GC4", RuleExpr.CubeRef("exrates",
      Seq(RuleExpr.CubeRefPart.Fixed("EUR"))))
    db
  }

  private def grid(rows: Seq[String], cols: Seq[String]) = {
    val v = new View(db.cube("sales"), ViewDef(
      rows = AxisDef(Seq("region" -> rows)),
      cols = AxisDef(Seq("m" -> cols))))
    v.refresh().collect().map(r => r.getAs[String]("region") -> r).toMap
  }

  test("currency conversion grid: one job, scalar/grid parity on every cell") {
    val sales = db.cube("sales")
    val leaves = Seq("de", "us", "fr", "jp")
    val g = grid(leaves, Seq("LC", "GC", "GC2", "GC3", "GC4"))
    for (r <- leaves; meas <- Seq("LC", "GC", "GC2", "GC3", "GC4")) {
      val scalar = sales.get(Seq(r, meas))
      val cell = Option(g(r).getAs[java.lang.Double](meas)).map(_.doubleValue())
      assert(cell == scalar, s"cell ($r, $meas): grid=$cell scalar=$scalar")
    }
    // spot values: GC3 goes through the TARGET's own rule (plan = 2x actual)
    assert(g("de").getAs[Double]("GC3") == 100.0 * 2.0 * 2.0)
    // empty target cell (JPY has no exrates rate) stays an empty cell
    assert(g("jp").getAs[java.lang.Double]("GC") == null)
    // fixed-address ref ignores the row's currency
    assert(g("jp").getAs[Double]("GC4") == 7.0 * 1.1)
  }

  test("missing attribute on a requested row member renders the position as #REF!") {
    // World carries no 'cur' attribute → the AttrOf resolution fails for the
    // REQUESTED member set, so the GC position renders the sentinel code
    // (coarser than the scalar path's per-cell error, on record in View)
    val g = grid(Seq("World", "de"), Seq("LC", "GC"))
    assert(g("World").getAs[String]("GC") == "#REF!")
    assert(g("de").getAs[String]("GC") == "#REF!")
    assert(g("World").getAs[Double]("LC") == 347.0) // aggregation unaffected
  }

  test("unknown target member renders #REF!; other positions unaffected") {
    // an unknown target CUBE is already rejected at registration (validate);
    // an unknown fixed MEMBER is only discoverable at read time → sentinel
    val sales = db.cube("sales")
    val m = db.dimension("m")
    m.edit().addMany(Seq("GCbad")).commit()
    sales.registerRule(RuleDef(Map("m" -> "GCbad"), RuleScope.AllLevels,
      RuleExpr.Mul(RuleExpr.Ref("LC"),
        RuleExpr.CubeRef("exrates", Seq(RuleExpr.CubeRefPart.Fixed("ghost")))),
      "rule_bad"))
    try {
      val g = grid(Seq("de"), Seq("LC", "GC", "GCbad"))
      assert(g("de").getAs[String]("GCbad") == "#REF!")
      assert(g("de").getAs[Double]("GC") == db.cube("sales").get(Seq("de", "GC")).get)
    } finally {
      sales.removeRule("rule_bad")
      ()
    }
  }

  test("dialect grid computes CubeRef members — scalar parity incl. target-side rules") {
    val sales = db.cube("sales")
    for (meas <- Seq("GC", "GC2", "GC3", "GC4")) {
      val got = OlapQuery(db,
          s"SELECT region, value FROM sales WHERE region=('de','us','fr','jp'), '$meas'")
        .collect().map(r => r.getAs[String]("region") ->
          r.getAs[Number]("value").doubleValue()).toMap
      for (r <- Seq("de", "us", "fr", "jp")) {
        val scalar = sales.get(Seq(r, meas))
        assert(got.get(r) == scalar, s"($r, $meas): dialect=${got.get(r)} scalar=$scalar")
      }
    }
  }

  test("BASE_LEVEL CubeRef: convert each base cell, then aggregate (feeder shape)") {
    val sales = db.cube("sales")
    db.dimension("m").edit().addMany(Seq("GCB")).commit()
    sales.registerRule(RuleDef(Map("m" -> "GCB"), RuleScope.BaseLevel,
      RuleExpr.Mul(RuleExpr.Ref("LC"),
        RuleExpr.CubeRef("exrates", Seq(RuleExpr.CubeRefPart.AttrOf("region", "cur")))),
      "lc_to_gcb"))
    // leaf read: plain scalar CubeRef evaluation
    assert(sales.get(Seq("de", "GCB")).contains(100.0 * 1.1))
    // aggregated read: ONE baseRuleGrid job — converted per base cell with
    // each leaf's OWN rate, THEN aggregated (≠ converting the aggregate);
    // jp's currency has no stored rate → its cell is empty and contributes
    // nothing (scalar parity: Mul(Some, None) = None)
    val expected = 100.0 * 1.1 + 200.0 * 1.0 + 40.0 * 1.1
    val got = sales.get(Seq("World", "GCB"))
    assert(got.isDefined && math.abs(got.get - expected) < 1e-9,
      s"World GCB: $got vs $expected")
    // the same address under the ALL_LEVELS rule is a different number
    // (rate looked up at the AGGREGATED member) — here an error, since
    // World carries no currency attribute; BASE scope is the correct model
    assert(intercept[RuleError](sales.get(Seq("World", "GC"))).code == "#REF!")
  }

  test("mutating the target cube is visible in the next grid refresh") {
    val exrates = db.cube("exrates")
    val before = grid(Seq("de"), Seq("LC", "GC"))("de").getAs[Double]("GC")
    exrates.set(Seq("EUR"), 1.3)
    try {
      val after = grid(Seq("de"), Seq("LC", "GC"))("de").getAs[Double]("GC")
      assert(after == 100.0 * 1.3 && before == 100.0 * 1.1)
    } finally exrates.set(Seq("EUR"), 1.1)
  }
}
