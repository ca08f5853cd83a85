package graft

import graft.core.Database
import graft.olap.Aggregates
import org.scalatest.funsuite.AnyFunSuite

/** Materialized aggregates + navigator: summary-served reads are
  * bit-identical to base-served ones, coverage routing is by derived-member
  * NAME, and stale summaries are never consulted.
  */
class AggregatesSpec extends AnyFunSuite {
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

  test("summary at quarter grain: parity on every servable address, incl. rule members") {
    val cube = freshModel("aggp")
    // dims: years, months, regions, products, measures — months to quarters
    val summary = Aggregates.materialize(cube, "sales_q",
      Seq(None, Some(1), None, None, None))
    val nav = new Aggregates.Navigator(cube, Seq(summary))
    // quarter-level address routes to the summary…
    val qAddr = Seq("2021", "Q1", "Total", "Total", "Sales")
    assert(nav.cubeFor(qAddr) eq summary)
    assert(nav.get(qAddr) == cube.get(qAddr)) // 123 + 456
    assert(nav.get(qAddr).contains(579.0))
    // …a month-level address falls back to base (below the grain)
    val mAddr = Seq("2021", "Jan", "Total", "Total", "Sales")
    assert(nav.cubeFor(mAddr) eq cube)
    assert(nav.get(mAddr).contains(123.0))
    // Year (above the grain) serves from the summary, weighted correctly
    val yAddr = Seq("2021", "Year", "Total", "Total", "Sales")
    assert(nav.cubeFor(yAddr) eq summary)
    assert(nav.get(yAddr) == cube.get(yAddr))
    // rule-backed member computes on the summary over aggregated operands
    val pAddr = Seq("2021", "Q1", "Total", "Total", "Profit")
    assert(nav.cubeFor(pAddr) eq summary)
    assert(nav.get(pAddr) == cube.get(pAddr)) // 579 − 100
    assert(nav.get(pAddr).contains(479.0))
  }

  test("summary frame is at grain size; base facts are not consulted") {
    val cube = freshModel("aggs")
    val summary = Aggregates.materialize(cube, "sales_q2",
      Seq(None, Some(1), None, None, None))
    // 4 stored cells → 4 grain addresses (months collapse to quarters but
    // the product/measure keys differ, so nothing merges here; a real
    // corpus merges everything sharing a grain cell)
    assert(summary.facts.count() == 4)
    // derived months dimension holds quarters + Year, not months
    val md = summary.dimensions(1)
    assert(md.contains("Q1") && md.contains("Year") && !md.contains("Jan"))
  }

  test("navigator views: quarter grid routes to the summary, month grid to base — same numbers") {
    import graft.olap.{AxisDef, ViewDef}
    val cube = freshModel("aggv")
    val summary = Aggregates.materialize(cube, "sales_qv",
      Seq(None, Some(1), None, None, None))
    val nav = new Aggregates.Navigator(cube, Seq(summary))
    val qDfn = ViewDef(
      filters = Seq("years" -> "2021", "regions" -> "Total", "products" -> "Total"),
      rows = AxisDef(Seq("months" -> Seq("Q1", "Q2", "Year"))),
      cols = AxisDef(Seq("measures" -> Seq("Sales", "Cost", "Profit"))))
    val routed = nav.view(qDfn)
    assert(routed.cube eq summary)
    val got = routed.refresh().collect()
      .map(r => r.getAs[String]("months") -> (r.getAs[Double]("Sales"), r.getAs[Double]("Profit"))).toMap
    val want = new graft.olap.View(cube, qDfn).refresh().collect()
      .map(r => r.getAs[String]("months") -> (r.getAs[Double]("Sales"), r.getAs[Double]("Profit"))).toMap
    assert(got == want && got("Q1") == ((579.0, 479.0)))
    // month-level axis → below the grain → base
    val mDfn = qDfn.copy(rows = AxisDef(Seq("months" -> Seq("Jan", "Feb"))))
    assert(nav.view(mDfn).cube eq cube)
  }

  test("groupingSets: per-grain routing, base fallback below grain, stale → base") {
    val cube = freshModel("aggs")
    val summary = Aggregates.materialize(cube, "sales_gs",
      Seq(None, Some(1), None, None, None)) // months → quarters
    val nav = new Aggregates.Navigator(cube, Seq(summary))
    val grains = Seq(
      // quarter grain: summary-servable
      Seq(Seq("2021"), Seq("Q1", "Q2"), Seq("Total"), Seq("Total"), Seq("Sales")),
      // month grain: below the summary — base serves it
      Seq(Seq("2021"), Seq("Jan", "Feb", "Apr"), Seq("Total"), Seq("Total"), Seq("Sales")))
    val (targets, df) = nav.groupingSets(grains)
    assert(targets(0) eq summary, "quarter grain must be summary-served")
    assert(targets(1) eq cube, "month grain sits below the grain — base serves")
    val rows = df.collect().map(r =>
      (r.getInt(0), r.getString(2)) -> r.getDouble(6)).toMap
    assert(rows((0, "Q1")) == 579.0 && rows((0, "Q2")) == 50.0)
    assert(rows((1, "Jan")) == 123.0 && rows((1, "Feb")) == 456.0 &&
      rows((1, "Apr")) == 50.0)
    // grain count must match the cube's dimensionality
    intercept[IllegalArgumentException] {
      nav.groupingSets(Seq(Seq(Seq("2021"))))
    }
    // a base write stales the summary: BOTH grains now base-served,
    // values reflect the write — per-grain routing never serves stale
    cube.set(Seq("2021", "Jan", "North", "motorcycles", "Sales"), 1123.0)
    val (targets2, df2) = nav.groupingSets(grains)
    assert((targets2(0) eq cube) && (targets2(1) eq cube),
      "stale summary must not serve any grain")
    val rows2 = df2.collect().map(r =>
      (r.getInt(0), r.getString(2)) -> r.getDouble(6)).toMap
    assert(rows2((0, "Q1")) == 1579.0 && rows2((1, "Jan")) == 1123.0)
  }

  test("groupingSets: grains sharing a summary compute in ONE Expand pass (r13 #5)") {
    val cube = freshModel("agg1s")
    val summary = Aggregates.materialize(cube, "sales_gs1",
      Seq(None, Some(1), None, None, None)) // months → quarters
    val nav = new Aggregates.Navigator(cube, Seq(summary))
    // both grains are summary-servable AND closure-free on the summary:
    // Year covers all quarter leaves at unit weight (collapsed), Q1/Q2 are
    // derived-catalog leaves (kept) — the single-pass preconditions
    val grains = Seq(
      Seq(Seq("2021"), Seq("Year"), Seq("Total"), Seq("Total"), Seq("Sales")),
      Seq(Seq("2021"), Seq("Q1", "Q2"), Seq("Total"), Seq("Total"), Seq("Sales")))
    val (targets, df) = nav.groupingSets(grains)
    assert((targets(0) eq summary) && (targets(1) eq summary))
    val rows = df.collect().map(r =>
      (r.getInt(0), r.getString(2)) -> r.getDouble(6)).toMap
    assert(rows == Map((0, "Year") -> 629.0, (1, "Q1") -> 579.0,
      (1, "Q2") -> 50.0), s"wrong grid: $rows")
    // values must equal the base-served cells bit-for-bit
    assert(cube.get(Seq("2021", "Year", "Total", "Total", "Sales")).contains(629.0))
    // plan shape: ONE GROUPING SETS Expand over ONE scan of the summary
    // frame — not one aggregation job per grain
    val plan = df.queryExecution.optimizedPlan
    val expands = plan.collect {
      case e: org.apache.spark.sql.catalyst.plans.logical.Expand => e }
    assert(expands.size == 1, s"expected one Expand, got ${expands.size}")
    assert(plan.collectLeaves().size == 1,
      s"expected one scan of the covering summary, got ${plan.collectLeaves().size}")
  }

  test("a base write staleness-guards every summary") {
    val cube = freshModel("aggw")
    val summary = Aggregates.materialize(cube, "sales_q3",
      Seq(None, Some(1), None, None, None))
    val nav = new Aggregates.Navigator(cube, Seq(summary))
    val qAddr = Seq("2021", "Q1", "Total", "Total", "Sales")
    assert(nav.cubeFor(qAddr) eq summary)
    cube.set(Seq("2021", "Mar", "North", "sedan", "Sales"), 1.0)
    assert(!nav.fresh)
    assert(nav.cubeFor(qAddr) eq cube) // stale summary never consulted
    assert(nav.get(qAddr).contains(580.0))
  }

  test("registered summary: dialect-addressable, round-trips with save/load, reattaches fresh") {
    import graft.olap.OlapQuery
    val db2 = TinyModel.build(spark) // fresh per call — no cross-suite leak
    val base = db2.cube("sales")
    base.set(Seq("2021", "Jan", "North", "motorcycles", "Sales"), 123.0)
    base.set(Seq("2021", "Feb", "North", "sedan", "Sales"), 456.0)
    val summary = Aggregates.materialize(base, "sales_q", Seq(None, Some(1), None, None, None))
    db2.registerCube(summary)
    // the dialect addresses the summary by cube name; derived members resolve
    val got = OlapQuery(db2,
        "SELECT months, value FROM sales_q WHERE '2021', months=('Q1'), regions='Total', products='Total', 'Sales'")
      .collect().map(r => r.getAs[String]("months") -> r.getAs[Number]("value").doubleValue()).toMap
    assert(got == Map("Q1" -> 579.0))
    // save round-trips the summary WITH the model (round 11): meta records
    // (base, grain), the grain-sized frame lands beside the cube frames,
    // and load reattaches via Aggregates.loadFrame — no base re-scan, and
    // the reattached summary is FRESH against the just-loaded base
    val tmp = java.nio.file.Files.createTempDirectory("aggsave").toString
    db2.save(tmp)
    val loaded = Database.load(tmp, spark)
    assert(loaded.cubeExists("sales") && loaded.cubeExists("sales_q"))
    assert(loaded.cube("sales").get(Seq("2021", "Q1", "Total", "Total", "Sales")).contains(579.0))
    val ls = loaded.cube("sales_q")
    assert(Aggregates.metaOf(ls).exists(_.baseName == "sales"))
    val nav = new Aggregates.Navigator(loaded.cube("sales"), Seq(ls))
    assert(nav.fresh)
    assert(nav.cubeFor(Seq("2021", "Q1", "Total", "Total", "Sales")) eq ls)
    assert(nav.get(Seq("2021", "Q1", "Total", "Total", "Sales")).contains(579.0))
    // the reloaded summary is dialect-addressable like the original
    val got2 = OlapQuery(loaded,
        "SELECT months, value FROM sales_q WHERE '2021', months=('Q1'), regions='Total', products='Total', 'Sales'")
      .collect().map(r => r.getAs[String]("months") -> r.getAs[Number]("value").doubleValue()).toMap
    assert(got2 == Map("Q1" -> 579.0))
    // a NON-summary registered cube stays session-scope
    val scratch2 = new graft.core.Cube("scratchreg", base.dimensions, spark, Some(base.facts))
    db2.registerCube(scratch2)
    val tmp2 = java.nio.file.Files.createTempDirectory("aggsave2").toString
    db2.save(tmp2)
    assert(!Database.load(tmp2, spark).cubeExists("scratchreg"))
    // a STALE summary is refused by save — load would promote it to fresh
    base.set(Seq("2021", "Mar", "North", "sedan", "Sales"), 1.0)
    val tmp3 = java.nio.file.Files.createTempDirectory("aggsave3").toString
    db2.save(tmp3)
    assert(!Database.load(tmp3, spark).cubeExists("sales_q"))
  }

  test("db.navigator assembles registered summaries smallest-first, survives load") {
    val db2 = TinyModel.build(spark)
    val base = db2.cube("sales")
    base.set(Seq("2021", "Jan", "North", "motorcycles", "Sales"), 123.0)
    base.set(Seq("2021", "Feb", "North", "sedan", "Sales"), 456.0)
    // fine (quarter) and coarse (year-level) summaries, registered in
    // DELIBERATELY wrong order — the navigator must sort coarse first
    db2.registerCube(Aggregates.materialize(base, "s_fine",
      Seq(None, Some(1), None, None, None)))
    db2.registerCube(Aggregates.materialize(base, "s_coarse",
      Seq(None, Some(2), None, None, None)))
    val nav = db2.navigator("sales")
    assert(nav.summaries.map(_.name) == Seq("s_coarse", "s_fine"))
    val yAddr = Seq("2021", "Year", "Total", "Total", "Sales")
    assert(nav.cubeFor(yAddr).name == "s_coarse") // coarsest covering wins
    val qAddr = Seq("2021", "Q1", "Total", "Total", "Sales")
    assert(nav.cubeFor(qAddr).name == "s_fine")
    assert(nav.get(qAddr).contains(579.0))
    // the loaded database serves a navigator with no manual rebuilding
    val tmp = java.nio.file.Files.createTempDirectory("navsave").toString
    db2.save(tmp)
    val lnav = Database.load(tmp, spark).navigator("sales")
    assert(lnav.summaries.map(_.name) == Seq("s_coarse", "s_fine"))
    assert(lnav.fresh)
    assert(lnav.get(qAddr).contains(579.0))
    assert(lnav.get(yAddr).contains(579.0))
  }

  test("randomized hierarchies: summary parity on every servable member (seeded)") {
    import graft.core.{Cube, Dimension}
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new scala.util.Random(seed)
      val d = new Dimension("g")
      d.edit()
      val leaves = (0 until 6 + rnd.nextInt(6)).map(i => s"l$i")
      leaves.foreach(l => d.add(l))
      val nGroups = 2 + rnd.nextInt(3)
      // round-robin base + random extras: every group non-empty, exact partition
      val assign = leaves.zipWithIndex.map { case (l, i) =>
        l -> (if (i < nGroups) i else rnd.nextInt(nGroups))
      }
      (0 until nGroups).foreach(g =>
        d.add(s"grp$g", assign.filter(_._2 == g).map(_._1)))
      d.add("Root", (0 until nGroups).map(g => s"grp$g"))
      d.commit()
      val md = new Dimension("m"); md.edit().addMany(Seq("v")).commit()
      val cube = new Cube(s"prop$seed", Seq(d, md), spark)
      // integer-valued cells: sums are order-exact in double, so summary-
      // vs-base equality can be asserted bitwise
      leaves.foreach(l => cube.set(Seq(l, "v"), (rnd.nextInt(100) + 1).toDouble))
      val summary = Aggregates.materialize(cube, s"props$seed", Seq(Some(1), None))
      d.members.filter(_.level >= 1).foreach { mm =>
        val a = Seq(mm.name, "v")
        assert(summary.get(a) == cube.get(a), s"seed=$seed member=${mm.name}")
      }
      // random write batch → partial refresh → parity again on every
      // servable member (update, insert-like overwrite, delete mixed in)
      (0 until 3).foreach { _ =>
        cube.set(Seq(leaves(rnd.nextInt(leaves.size)), "v"),
          (rnd.nextInt(100) + 1).toDouble)
      }
      cube.delete(Seq(leaves(rnd.nextInt(leaves.size)), "v"))
      val refreshed = Aggregates.refreshPartial(cube, summary)
        .getOrElse(fail(s"seed=$seed: point writes must partially refresh"))
      d.members.filter(_.level >= 1).foreach { mm =>
        val a = Seq(mm.name, "v")
        assert(refreshed.get(a) == cube.get(a),
          s"seed=$seed post-refresh member=${mm.name}")
      }
    }
  }

  test("nonlinear BASE_LEVEL rule never served from a coarsened summary (r9 advice)") {
    import graft.core.{Cube, Dimension}
    import graft.olap.{RuleDef, RuleExpr, RuleScope}
    // x1: a=2, b=3; x2: a=5, b=7 grouped under G. prod = a·b at BASE level:
    // base-served G = 2·3 + 5·7 = 41; a summary at the G grain would compute
    // (2+5)·(3+7) = 70 — the rule must NOT travel, and the navigator must
    // route prod-addresses to base.
    val d = new Dimension("x")
    d.edit(); d.add("x1"); d.add("x2"); d.add("G", Seq("x1", "x2")); d.commit()
    val md = new Dimension("m")
    md.edit(); md.addMany(Seq("a", "b", "prod")); md.commit()
    val cube = new Cube("nl", Seq(d, md), spark)
    cube.set(Seq("x1", "a"), 2.0); cube.set(Seq("x1", "b"), 3.0)
    cube.set(Seq("x2", "a"), 5.0); cube.set(Seq("x2", "b"), 7.0)
    cube.registerRule(RuleDef(Map("m" -> "prod"), RuleScope.BaseLevel,
      RuleExpr.Mul(RuleExpr.Ref("a"), RuleExpr.Ref("b")), "prod"))
    assert(cube.get(Seq("G", "prod")).contains(41.0))
    val summary = Aggregates.materialize(cube, "nl_g", Seq(Some(1), None))
    // the unsafe rule was skipped, and the skip is on record
    val meta = Aggregates.metaOf(summary).get
    assert(meta.skippedRules == Seq("prod"))
    val nav = new Aggregates.Navigator(cube, Seq(summary))
    // prod at any level answers from BASE — calc-then-aggregate preserved
    assert(nav.cubeFor(Seq("G", "prod")) eq cube)
    assert(nav.get(Seq("G", "prod")).contains(41.0))
    // plain additive members still summary-serve
    assert(nav.cubeFor(Seq("G", "a")) eq summary)
    assert(nav.get(Seq("G", "a")).contains(7.0))
  }

  test("ordinal Shift rule never served from a summary coarsening the shifted dim") {
    import graft.olap.{RuleDef, RuleExpr, RuleScope}
    val cube = freshModel("aggshift")
    cube.dimensions.last.edit().addMany(Seq("Prev")).commit()
    // prev-month Sales via ordinal shift over months — derived quarter
    // catalog renumbers ordinals, so the rule must not travel
    cube.registerRule(RuleDef(Map("measures" -> "Prev"), RuleScope.AllLevels,
      RuleExpr.Shift("months", -1), "prev_m"))
    val summary = Aggregates.materialize(cube, "sales_sh", Seq(None, Some(1), None, None, None))
    assert(Aggregates.metaOf(summary).get.skippedRules == Seq("prev_m"))
    val nav = new Aggregates.Navigator(cube, Seq(summary))
    assert(nav.cubeFor(Seq("2021", "Q1", "Total", "Total", "Prev")) eq cube)
    // non-shift addresses unaffected
    assert(nav.cubeFor(Seq("2021", "Q1", "Total", "Total", "Sales")) eq summary)
  }

  test("multi-summary lattice: smallest covering summary wins, each path exact") {
    val cube = freshModel("agglat")
    // coarse: months → Year (level 2); fine: months → quarters (level 1)
    val coarse = Aggregates.materialize(cube, "sales_y", Seq(None, Some(2), None, None, None))
    val fine = Aggregates.materialize(cube, "sales_qf", Seq(None, Some(1), None, None, None))
    val nav = new Aggregates.Navigator(cube, Seq(coarse, fine))
    // Year: both cover — the first (coarse/smallest) serves
    val yAddr = Seq("2021", "Year", "Total", "Total", "Sales")
    assert(nav.cubeFor(yAddr) eq coarse)
    assert(nav.get(yAddr) == cube.get(yAddr))
    // Q1: only the quarter-grain summary covers
    val qAddr = Seq("2021", "Q1", "Total", "Total", "Sales")
    assert(nav.cubeFor(qAddr) eq fine)
    assert(nav.get(qAddr).contains(579.0))
    // Jan: below both grains — base
    assert(nav.cubeFor(Seq("2021", "Jan", "Total", "Total", "Sales")) eq cube)
  }

  test("write → refreshed() → summary routes again with the new value") {
    val cube = freshModel("aggrf")
    val summary = Aggregates.materialize(cube, "sales_rf", Seq(None, Some(1), None, None, None))
    val nav = new Aggregates.Navigator(cube, Seq(summary))
    val qAddr = Seq("2021", "Q1", "Total", "Total", "Sales")
    assert(nav.get(qAddr).contains(579.0))
    cube.set(Seq("2021", "Mar", "North", "sedan", "Sales"), 21.0)
    assert(!nav.fresh)
    assert(nav.cubeFor(qAddr) eq cube) // stale: base answers meanwhile
    val nav2 = nav.refreshed()
    assert(nav2.fresh && (nav2 ne nav))
    assert(nav2.cubeFor(qAddr).name == "sales_rf")
    assert(nav2.get(qAddr).contains(600.0))
    // refreshed() on a fresh navigator is a no-op
    assert(nav2.refreshed() eq nav2)
  }

  test("partial refresh: update + new cell + delete, frame parity with a full rebuild") {
    val cube = freshModel("aggpr")
    val summary = Aggregates.materialize(cube, "sales_pr", Seq(None, Some(1), None, None, None))
    // update an existing cell, create a brand-new one, delete one
    cube.set(Seq("2021", "Jan", "North", "motorcycles", "Sales"), 200.0) // was 123
    cube.set(Seq("2021", "Jul", "South", "coupe", "Sales"), 77.0)        // new (Q3)
    cube.delete(Seq("2021", "Apr", "South", "sports", "Sales"))          // was 50
    val part = Aggregates.refreshPartial(cube, summary)
    assert(part.isDefined, "point writes must be partially refreshable")
    val p = part.get
    // value parity on every touched path
    assert(p.get(Seq("2021", "Q1", "Total", "Total", "Sales")).contains(656.0)) // 200+456
    assert(p.get(Seq("2021", "Q3", "Total", "Total", "Sales")).contains(77.0))
    assert(p.get(Seq("2021", "Q2", "Total", "Total", "Sales")).isEmpty) // deleted cell gone
    // the bounded touch set took the OVERLAY fast path (no frame rewrite)
    assert(Aggregates.metaOf(p).get.fastLayers == 1)
    // FRAME parity with a full rebuild — bit-identical cells
    val full = Aggregates.rebuild(cube, summary)
    assert(p.facts.collect().map(_.toSeq).toSet == full.facts.collect().map(_.toSeq).toSet)
    // successive fast refreshes stack overlay layers and stay exact
    cube.set(Seq("2021", "Aug", "North", "sedan", "Sales"), 5.0)
    val p2 = Aggregates.refreshPartial(cube, p).get
    assert(Aggregates.metaOf(p2).get.fastLayers == 2)
    assert(p2.get(Seq("2021", "Q3", "Total", "Total", "Sales")).contains(82.0))
    assert(p2.get(Seq("2021", "Q1", "Total", "Total", "Sales")).contains(656.0))
    // a refreshed navigator routes to the partially-refreshed summary
    val nav = new Aggregates.Navigator(cube, Seq(summary)).refreshed()
    assert(nav.fresh)
    assert(nav.get(Seq("2021", "Q1", "Total", "Total", "Sales")).contains(656.0))
  }

  test("write log under concurrent writers: partial refresh misses nothing") {
    val cube = freshModel("aggcw")
    val summary = Aggregates.materialize(cube, "sales_cw", Seq(None, Some(1), None, None, None))
    val months = Seq("Jan", "Feb", "Mar", "Apr", "Mai", "Jun", "Jul", "Aug")
    val threads = months.zipWithIndex.map { case (m, t) =>
      new Thread(() => cube.set(Seq("2021", m, "North", "sedan", "Sales"), 10.0 + t))
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val p = Aggregates.refreshPartial(cube, summary)
      .getOrElse(fail("concurrent point writes must stay partially refreshable"))
    val full = Aggregates.rebuild(cube, summary)
    assert(p.facts.collect().map(_.toSeq).toSet == full.facts.collect().map(_.toSeq).toSet)
    // every quarter reflects its writers: Q1 gets Jan..Mar etc.
    assert(p.get(Seq("2021", "Q1", "North", "Total", "Sales")) ==
      full.get(Seq("2021", "Q1", "North", "Total", "Sales")))
  }

  test("partial refresh declines after bulk rewrites and rule changes (rebuild path)") {
    import graft.olap.{RuleDef, RuleExpr, RuleScope}
    val cube = freshModel("aggprb")
    val summary = Aggregates.materialize(cube, "sales_prb", Seq(None, Some(1), None, None, None))
    cube.replaceFacts(cube.facts) // bulk rewrite: addresses unknowable
    assert(Aggregates.refreshPartial(cube, summary).isEmpty)
    val nav = new Aggregates.Navigator(cube, Seq(summary)).refreshed() // falls back to rebuild
    assert(nav.get(Seq("2021", "Q1", "Total", "Total", "Sales")).contains(579.0))
    // rule-set changes also decline (the summary's rule screen must re-run)
    val s2 = Aggregates.materialize(cube, "sales_prb2", Seq(None, Some(1), None, None, None))
    cube.registerRule(RuleDef(Map("measures" -> "Cost"), RuleScope.AllLevels,
      RuleExpr.Lit(1.0), "cost_override"))
    assert(Aggregates.refreshPartial(cube, s2).isEmpty)
  }

  test("dialect routing: quarter query summary-served, month query base-served, same cells") {
    import graft.olap.OlapQuery
    val db = TinyModel.build(spark)
    val base = db.cube("sales")
    base.set(Seq("2021", "Jan", "North", "motorcycles", "Sales"), 123.0)
    base.set(Seq("2021", "Feb", "North", "sedan", "Sales"), 456.0)
    val summary = Aggregates.materialize(base, "sales_qd", Seq(None, Some(1), None, None, None))
    val nav = new Aggregates.Navigator(base, Seq(summary))
    val qSql = "SELECT months, value FROM sales WHERE '2021', months=('Q1','Q2'), regions='Total', products='Total', 'Sales'"
    assert(OlapQuery.routedTarget(nav, qSql) eq summary)
    val got = OlapQuery.routed(nav, qSql).collect()
      .map(r => r.getAs[String]("months") -> r.getAs[Number]("value").doubleValue()).toMap
    assert(got == Map("Q1" -> 579.0))
    // identical cells as the unrouted dialect
    val direct = OlapQuery(db, qSql).collect()
      .map(r => r.getAs[String]("months") -> r.getAs[Number]("value").doubleValue()).toMap
    assert(got == direct)
    // a month-grain query falls back to base
    val mSql = "SELECT months, value FROM sales WHERE '2021', months=('Jan','Feb'), regions='Total', products='Total', 'Sales'"
    assert(OlapQuery.routedTarget(nav, mSql) eq base)
    assert(OlapQuery.routed(nav, mSql).count() == 2)
    // an attribute field over a COARSENED dim pins it to base
    val aSql = "SELECT months, value FROM sales WHERE '2021', months=('Q1'), regions='Total', products='Total', 'Sales' " // months coarsened
    assert(OlapQuery.routedTarget(nav, aSql) eq summary) // no attribute → summary
    val arSql = "SELECT regions, regions.manager, value FROM sales WHERE '2021', months=('Q1'), regions=('North','South'), products='Total', 'Sales'"
    // regions kept leaf resolution (shared dim object) → attributes resolve,
    // summary still serves
    assert(OlapQuery.routedTarget(nav, arSql) eq summary)
    val withAttr = OlapQuery.routed(nav, arSql).collect()
    // only non-empty cells return — all data sits in North
    assert(withAttr.map(_.getAs[String]("regions.manager")).toSet == Set("Ingmar Ice"))
  }

  test("maintain: batch-driven refresh, empty-batch re-anchor, distinct-cap decline") {
    import org.apache.spark.sql.functions._
    val cube = freshModel("aggmt")
    val summary = Aggregates.materialize(cube, "sales_mt", Seq(None, Some(1), None, None, None))
    val s = spark
    import s.implicits._
    // a "merged batch" frame: the two cells a stream batch landed
    val ids = Seq(
      (cube.dimensions(0).idOf("2021"), cube.dimensions(1).idOf("Mar"),
        cube.dimensions(2).idOf("North"), cube.dimensions(3).idOf("sedan"),
        cube.dimensions(4).idOf("Sales"), 7.0))
    val batch = ids.toDF("d0", "d1", "d2", "d3", "d4", "value")
    // simulate the stream's merge (bulk) then maintain from the batch frame
    cube.set(Seq("2021", "Mar", "North", "sedan", "Sales"), 7.0)
    cube.replaceFacts(cube.facts) // bulk: the write log is reset, like a stream merge
    val m1 = Aggregates.maintain(cube, summary, batch)
      .getOrElse(fail("a bounded batch must be maintainable"))
    assert(m1.get(Seq("2021", "Q1", "Total", "Total", "Sales")).contains(586.0)) // 579+7
    val nav = new Aggregates.Navigator(cube, Seq(m1))
    assert(nav.fresh)
    // an EMPTY batch whose commit bumped the version: re-anchors, stays fresh
    cube.replaceFacts(cube.facts)
    val m2 = Aggregates.maintain(cube, m1, batch.filter(lit(false))).get
    assert(m2 eq m1)
    assert(new Aggregates.Navigator(cube, Seq(m2)).fresh)
    // a batch spraying >cap distinct leaves over a leaf-kept dim declines
    val wide = (0 until 1500).map(i =>
      (i, cube.dimensions(1).idOf("Mar"), cube.dimensions(2).idOf("North"),
        cube.dimensions(3).idOf("sedan"), cube.dimensions(4).idOf("Sales"), 1.0))
      .toDF("d0", "d1", "d2", "d3", "d4", "value")
    assert(Aggregates.maintain(cube, m2, wide).isEmpty)
    // a batch carrying an id outside the catalog of a COARSENED dim declines
    // (no covering grain member) instead of throwing on the stream thread
    val orphan = Seq((cube.dimensions(0).idOf("2021"), 99999,
        cube.dimensions(2).idOf("North"), cube.dimensions(3).idOf("sedan"),
        cube.dimensions(4).idOf("Sales"), 1.0))
      .toDF("d0", "d1", "d2", "d3", "d4", "value")
    assert(Aggregates.maintain(cube, m2, orphan).isEmpty)
  }

  test("rebuild after a dimension edit re-derives the grain (new member aggregates)") {
    val cube = freshModel("aggde")
    val summary = Aggregates.materialize(cube, "sales_de", Seq(None, Some(1), None, None, None))
    // a hierarchy edit invalidates everything address-shaped: partial declines,
    // rebuild re-derives the derived dims against the NEW catalog
    val regions = cube.dimensions(2)
    regions.edit().add("Center").commit()
    regions.edit().add("Total", Seq("Center")).commit() // Center joins Total
    cube.set(Seq("2021", "Jan", "Center", "sedan", "Sales"), 11.0)
    assert(Aggregates.refreshPartial(cube, summary).isEmpty)
    val s2 = Aggregates.rebuild(cube, summary)
    assert(s2.get(Seq("2021", "Q1", "Total", "Total", "Sales")).contains(590.0)) // 579+11
    assert(s2.get(Seq("2021", "Q1", "Center", "Total", "Sales")).contains(11.0))
  }

  test("persist + load round-trip: routed reads identical, no base re-scan needed") {
    val cube = freshModel("aggpst")
    val grain = Seq[Option[Int]](None, Some(1), None, None, None)
    val summary = Aggregates.materialize(cube, "sales_pst", grain)
    Aggregates.persist(summary, "spec_summary_pst", nBuckets = 2)
    val loaded = Aggregates.load(cube, "sales_pst", grain, "spec_summary_pst")
    val nav = new Aggregates.Navigator(cube, Seq(loaded))
    val qAddr = Seq("2021", "Q1", "Total", "Total", "Sales")
    assert(nav.cubeFor(qAddr) eq loaded)
    assert(nav.get(qAddr).contains(579.0))
    // full-grid parity between the in-session and the persisted summary
    val a = summary.facts.collect().map(_.toSeq).toSet
    val b = loaded.facts.collect().map(_.toSeq).toSet
    assert(a == b)
    // persisting a non-summary cube is a loud error
    val e = intercept[IllegalStateException](Aggregates.persist(cube, "nope"))
    assert(e.getMessage.contains("not a materialized summary"))
  }

  test("persisted summary serves a FRESHLY LOADED database (cross-session shape)") {
    val db = TinyModel.build(spark)
    val base = db.cube("sales")
    base.set(Seq("2021", "Jan", "North", "motorcycles", "Sales"), 123.0)
    base.set(Seq("2021", "Feb", "North", "sedan", "Sales"), 456.0)
    val grain = Seq[Option[Int]](None, Some(1), None, None, None)
    val summary = Aggregates.materialize(base, "sales_xs", grain)
    Aggregates.persist(summary, "spec_summary_xs", nBuckets = 2)
    val tmp = java.nio.file.Files.createTempDirectory("aggxs").toString
    db.save(tmp)
    // a NEW session: reload the model, reconstruct the summary from its
    // table — derived ids re-derive deterministically from the loaded
    // catalogs, so the persisted facts resolve without any base scan
    val loaded = Database.load(tmp, spark)
    val base2 = loaded.cube("sales")
    val s2 = Aggregates.load(base2, "sales_xs", grain, "spec_summary_xs")
    val nav = new Aggregates.Navigator(base2, Seq(s2))
    val qAddr = Seq("2021", "Q1", "Total", "Total", "Sales")
    assert(nav.cubeFor(qAddr) eq s2)
    assert(nav.get(qAddr).contains(579.0))
    assert(nav.get(qAddr) == base2.get(qAddr))
  }

  test("partial refresh at 1e6 facts reads a fraction of what a rebuild reads") {
    import graft.core.{Cube, Dimension}
    import org.apache.spark.sql.functions._
    val base0 = graft.tpch.HugeModel.get(spark)
    // re-dimension dim0 with 10 mid-level groups so a grain exists between
    // leaf and All; creation order pins leaf ids 0..99 ↔ the (shifted) facts
    val d0 = new Dimension("dim0")
    d0.edit()
    (0 until 100).foreach(m => d0.add(s"m$m"))
    (0 until 10).foreach(g => d0.add(s"g$g", (0 until 10).map(m => s"m${g * 10 + m}")))
    d0.add("All", (0 until 10).map(g => s"g$g"))
    d0.commit()
    val facts = base0.facts.withColumn("d0", (col("d0") - 1).cast("int"))
    val cube = new Cube("hugeg", d0 +: base0.dimensions.tail, spark,
      Some(facts.localCheckpoint(true)))
    val summary = Aggregates.materialize(cube, "huge_g1",
      Some(1) +: Seq.fill(7)(Option.empty[Int]))

    // the partial win on an UNLAYOUTED fact frame is the aggregation: the
    // recompute's grid shuffles only the rows surviving the leaf filters
    // (a handful) where a rebuild shuffles the whole pre-aggregated fact
    // set — so the claim is measured on SHUFFLE records. (Scan-side row
    // pruning additionally applies when the fact layout supports it —
    // bucketed/partitioned/sorted backing; a cache-backed frame like this
    // one always deserializes every row before the filter.)
    val shuffled = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          shuffled.addAndGet(te.taskMetrics.shuffleWriteMetrics.recordsWritten)
    }
    def recordsDuring[T](f: => T): (T, Long) = {
      spark.sparkContext.addSparkListener(listener)
      shuffled.set(0)
      try { val r = f; Thread.sleep(500); (r, shuffled.get()) }
      finally spark.sparkContext.removeSparkListener(listener)
    }

    val addr = Seq("m5") ++ Seq.fill(7)("m1")
    val old = cube.get(addr).getOrElse(0.0)
    cube.set(addr, old + 123.0)
    val (p, readPartial) = recordsDuring(
      Aggregates.refreshPartial(cube, summary).getOrElse(fail("partial must be available")))
    val (full, readFull) = recordsDuring(Aggregates.rebuild(cube, summary))
    // parity at the touched group, an untouched group, and the grand total
    val g0Addr = Seq("g0") ++ Seq.fill(7)("All")
    val g9Addr = Seq("g9") ++ Seq.fill(7)("All")
    val topAddr = Seq("All") ++ Seq.fill(7)("All")
    Seq(g0Addr, g9Addr, topAddr).foreach { a =>
      assert(p.get(a) == full.get(a), s"partial≠rebuild at $a")
    }
    assert(p.get(topAddr) == cube.get(topAddr)) // and both equal base truth
    // the scale claim: the rebuild re-shuffles the ~1e6-address grid while
    // the partial refresh shuffles only the touched slice's survivors;
    // generous 10× margin over the measured ~1e4× ratio keeps this stable
    assert(readPartial * 10 < readFull,
      s"partial shuffled $readPartial records vs rebuild $readFull — not a partial recompute")
  }

  test("degenerate dimension summaries: collapse-to-All and kept-at-leaf grains") {
    // the >2M-member shape that most NEEDS summaries: the degenerate dim
    // either collapses to its all-member (a derived one-member catalog) or
    // keeps raw keys at full resolution via the leaf-all grid sentinel
    val db = new Database("degsumdb", spark)
    val cust = db.addDegenerateDimension("customer", "C#")
    val months = db.addDimension("months")
    months.edit().addMany(Seq("Jan", "Feb", "Mar"))
      .add("Q1", Seq("Jan", "Feb", "Mar")).commit()
    val cube = db.addCube("sales", Seq(cust, months))
    cube.set(Seq("C#1", "Jan"), 10.0)
    cube.set(Seq("C#1", "Feb"), 20.0)
    cube.set(Seq("C#2", "Jan"), 5.0)

    // collapse the unbounded dim to its all-member
    val sAll = Aggregates.materialize(cube, "s_all", Seq(Some(1), None))
    assert(sAll.facts.count() == 2) // (All,Jan)=15, (All,Feb)=20
    val nav = new Aggregates.Navigator(cube, Seq(sAll))
    assert(nav.cubeFor(Seq("All", "Q1")) eq sAll)
    assert(nav.get(Seq("All", "Q1")) == cube.get(Seq("All", "Q1")))
    assert(nav.get(Seq("All", "Q1")).contains(35.0))
    assert(nav.get(Seq("All", "Jan")).contains(15.0)) // month leaf kept
    // raw keys are below the grain: base fallback
    assert(nav.cubeFor(Seq("C#1", "Q1")) eq cube)

    // keep the raw keys, coarsen months to quarters
    val sKeep = Aggregates.materialize(cube, "s_keep", Seq(None, Some(1)))
    assert(sKeep.facts.count() == 2) // (C#1,Q1)=30, (C#2,Q1)=5
    val nav2 = new Aggregates.Navigator(cube, Seq(sKeep))
    assert(nav2.cubeFor(Seq("C#1", "Q1")) eq sKeep)
    assert(nav2.get(Seq("C#1", "Q1")).contains(30.0))
    // the implicit degenerate All still rolls up — on the summary
    assert(nav2.get(Seq("All", "Q1")).contains(35.0))
    assert(nav2.cubeFor(Seq("C#1", "Jan")) eq cube) // below the months grain

    // partial refresh covers raw-key writes on BOTH grains
    cube.set(Seq("C#2", "Feb"), 7.0)
    val rAll = Aggregates.refreshPartial(cube, sAll)
      .getOrElse(fail("point write must stay partially refreshable"))
    assert(rAll.get(Seq("All", "Q1")).contains(42.0))
    val rKeep = Aggregates.refreshPartial(cube, sKeep)
      .getOrElse(fail("point write must stay partially refreshable"))
    assert(rKeep.get(Seq("C#2", "Q1")).contains(12.0))
    val full = Aggregates.rebuild(cube, sKeep)
    assert(rKeep.facts.collect().map(_.toSeq).toSet ==
      full.facts.collect().map(_.toSeq).toSet)

    // only the all-member exists above the raw keys
    val e = intercept[IllegalArgumentException](
      Aggregates.materialize(cube, "bad", Seq(Some(2), None)))
    assert(e.getMessage.contains("all-member"))
  }

  test("maintain keeps a degenerate-collapsed summary fresh through batch merges") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val db = new Database("degmaintdb", spark)
    val cust = db.addDegenerateDimension("customer", "C#")
    val months = db.addDimension("months")
    months.edit().addMany(Seq("Jan", "Feb", "Mar"))
      .add("Q1", Seq("Jan", "Feb", "Mar")).commit()
    val cube = db.addCube("sales", Seq(cust, months))
    cube.set(Seq("C#1", "Jan"), 10.0)
    val summary = Aggregates.materialize(cube, "dm_all", Seq(Some(1), None))
    // a bulk merge lands (C#2, Feb)=7 — simulate the post-merge state and
    // hand maintain the batch's resolved cell frame
    val schema = StructType(Seq(StructField("d0", IntegerType),
      StructField("d1", IntegerType), StructField("value", DoubleType)))
    val febId = months.idOf("Feb")
    val batch = spark.createDataFrame(
      java.util.List.of(Row(2, febId, 7.0)), schema)
    cube.replaceFacts(cube.facts.unionByName(batch))
    val m = Aggregates.maintain(cube, summary, batch)
      .getOrElse(fail("a catalog-coverable batch must maintain"))
    // the functional cover mapped the raw key to the all-member cell
    assert(m.get(Seq("All", "Q1")).contains(17.0))
    assert(new Aggregates.Navigator(cube, Seq(m)).fresh)
  }

  test("a multi-parent level is rejected as a grain (double-covered leaves)") {
    val db = new Database("aggbad", spark)
    val d = db.addDimension("p")
    d.edit()
    d.add("brandA", Seq("p1", "p2"))
    d.add("typeX", Seq("p1", "p2")) // every leaf covered twice at level 1
    d.commit()
    val m = db.addDimension("m"); m.edit().addMany(Seq("v")).commit()
    val c = db.addCube("cbad", Seq(d, m))
    c.set(Seq("p1", "v"), 1.0)
    val e = intercept[IllegalArgumentException](
      Aggregates.materialize(c, "bad", Seq(Some(1), None)))
    assert(e.getMessage.contains("partition"))
  }
}
