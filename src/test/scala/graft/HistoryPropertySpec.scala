package graft

import graft.core._
import graft.functions.GraftFunctions
import graft.pipeline.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class HistoryPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("history: undo/redo over point writes and area ops") {
    val db = TinyModel.build(spark)
    val cube = db.addCube("hsales", db.cube("sales").dimensions)
    cube.enableHistory()
    val addr = Seq("2021", "Jan", "North", "sedan", "Sales")
    cube.set(addr, 100.0)
    cube.set(addr, 200.0)
    assert(cube.get(addr).contains(200.0))
    assert(cube.history.undo())
    assert(cube.get(addr).contains(100.0))
    assert(cube.history.undo())
    assert(cube.get(addr).isEmpty)
    assert(cube.history.redo())
    assert(cube.get(addr).contains(100.0))
    // redo the second write too (reference's redo is a stub — ours works)
    assert(cube.history.redo())
    assert(cube.get(addr).contains(200.0))
    // new edit truncates the redo tail
    cube.history.undo()
    cube.set(addr, 999.0)
    assert(!cube.history.canRedo)
    assert(cube.get(addr).contains(999.0))
    // bulk op undo: clear an area, then undo restores it
    cube.area("years" -> Seq("2021")).clear()
    assert(cube.get(addr).isEmpty)
    assert(cube.history.undo())
    assert(cube.get(addr).contains(999.0))
    // time travel to initial
    cube.history.goTo(0)
    assert(cube.get(addr).isEmpty)
  }

  test("cell comments attach per address") {
    val db = TinyModel.build(spark)
    val cube = db.cube("sales")
    val addr = Seq("2021", "Feb", "South", "van", "Cost")
    cube.addComment(addr, "check this figure", "alice")
    cube.addComment(addr, "confirmed", "bob")
    val got = cube.commentsAt(addr)
    assert(got.map(_.text) == Seq("check this figure", "confirmed"))
    assert(got.map(_.user) == Seq("alice", "bob"))
    assert(cube.commentsAt(Seq("2021", "Jan", "North", "sedan", "Sales")).isEmpty)
  }

  test("codegen dot product equals higher-order-function dot product") {
    import spark.implicits._
    val rnd = new Random(7)
    val rows = Seq.tabulate(50)(i =>
      (i.toLong, Array.fill(64)(rnd.nextInt(2001) - 1000L), Array.fill(64)(rnd.nextInt(2001) - 1000L)))
    val df = rows.toDF("id", "a", "b")
    val got = df.select(col("id"), GraftFunctions.dot_q(col("a"), col("b")).as("d")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ref = df.select(col("id"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0L), (acc, v) => acc + v).as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == ref)
    // null propagation
    val withNull = spark.sql("SELECT CAST(NULL AS ARRAY<BIGINT>) AS a, array(1L,2L) AS b")
    assert(withNull.select(GraftFunctions.dot_q(col("a"), col("b"))).collect().head.isNullAt(0))
  }

  /** Property-style randomized differential tests (SURVEY §5: rollup(sum) ≡
    * sum(leaves), weight linearity, multi-parent consistency) against a
    * brute-force in-driver evaluator.
    */
  test("property: random weighted multi-parent hierarchies roll up exactly") {
    val rnd = new Random(42)
    (1 to 5).foreach { trial =>
      // random DAG: 8 leaves, 4 mid nodes over random leaf subsets, 1 root
      val d = new Dimension(s"pdim$trial")
      d.edit()
      val leaves = (0 until 8).map(i => s"L$i")
      leaves.foreach(l => d.add(l))
      val mids = (0 until 4).map { m =>
        val kids = leaves.filter(_ => rnd.nextBoolean())
        val ws = kids.map(_ => (rnd.nextInt(5) - 2).toDouble) // weights in [-2,2]
        d.add(s"M$m", if (kids.isEmpty) Seq(leaves(m)) else kids,
          if (kids.isEmpty) Seq(1.0) else ws)
        s"M$m"
      }
      val rootWs = mids.map(_ => (rnd.nextInt(3) + 1).toDouble)
      d.add("ROOT", mids, rootWs)
      d.commit()

      val other = new Dimension(s"odim$trial")
      other.edit(); other.add("ALL", Seq("x", "y")); other.commit()

      val cube = new Cube(s"pcube$trial", Seq(d, other), spark)
      val values = leaves.flatMap(l => Seq("x", "y").map(o =>
        (l, o, rnd.nextInt(100).toDouble))).filter(_ => rnd.nextBoolean())
      values.foreach { case (l, o, v) => cube.set(Seq(l, o), v) }

      // brute force: effective weight of leaf under ROOT = Σ paths Π weights
      def memberW(node: String): Map[String, Double] = {
        val md = d(node)
        if (md.children.isEmpty) Map(node -> 1.0)
        else md.children.map(d.memberById).map { c =>
          val w = c.parentWeights.getOrElse(md.id, 1.0)
          memberW(c.name).map { case (leaf, lw) => leaf -> w * lw }
        }.foldLeft(Map.empty[String, Double]) { (acc, m) =>
          m.foldLeft(acc) { case (a, (k, v)) => a.updated(k, a.getOrElse(k, 0.0) + v) }
        }
      }
      Seq("ROOT", mids.head, mids.last).foreach { node =>
        val w = memberW(node)
        val expected = values.map { case (l, _, v) => w.getOrElse(l, 0.0) * v }.sum
        val got = cube.get(Seq(node, "ALL")).getOrElse(0.0)
        assert(math.abs(got - expected) < 1e-9,
          s"trial $trial node $node: engine $got vs brute $expected")
      }
    }
  }
}
