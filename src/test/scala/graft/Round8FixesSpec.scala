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
