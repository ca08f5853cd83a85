package graft

import graft.olap._
import org.scalatest.funsuite.AnyFunSuite

class RuleParserSpec extends AnyFunSuite {
  import RuleExpr._
  lazy val spark = TestSpark.spark

  test("grammar round-trips the canonical expressions") {
    assert(RuleParser.parse("[Profit] / [Sales]") == Div(Ref("Profit"), Ref("Sales")))
    assert(RuleParser.parse("[Sales] - [months@-1]") == Sub(Ref("Sales"), Shift("months", -1)))
    assert(RuleParser.parse("([gross] - [disc_amt]) / [gross]") ==
      Div(Sub(Ref("gross"), Ref("disc_amt")), Ref("gross")))
    assert(RuleParser.parse("abs(-2.5) + [measures:Cost] * 0.4") ==
      Add(Fn("abs", Neg(Lit(2.5))), Mul(Ref("measures:Cost"), Lit(0.4))))
    intercept[IllegalArgumentException](RuleParser.parse("[Sales] +"))
    intercept[IllegalArgumentException](RuleParser.parse("foo([Sales])"))
  }

  test("parsed rule behaves identically to the hand-built AST") {
    val db = TinyModel.build(spark)
    val cube = db.addCube("prules", db.cube("sales").dimensions)
    cube.registerRule(RuleDef(
      trigger = Map("measures" -> "Profit in %"), scope = RuleScope.AllLevels,
      expr = RuleParser.parse("[Profit] / [Sales]"), name = "pp_parsed"))
    cube.set(Seq("2021", "Jan", "North", "motorcycles", "Sales"), 123.0)
    cube.set(Seq("2021", "Jan", "North", "motorcycles", "Cost"), 100.0)
    val got = cube.get(Seq("2021", "Jan", "North", "motorcycles", "Profit in %"))
    assert(got.exists(v => math.abs(v - 23.0 / 123.0) < 1e-12))
  }

  test("parsed expressions persist and reload through JSON") {
    val e = RuleParser.parse("round([Sales] * 1.15) - [months@-1]")
    assert(Rules.exprFromJson(Rules.exprToJson(e)) == e)
  }
}
