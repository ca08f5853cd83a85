package graft

import graft.tpch.HugeModel
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Self-verifying assertions on the reference's `huge` benchmark model
  * (value-1.0 cells ⇒ any aggregate equals its contributing row count).
  */
class HugeModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("top cell equals total row count; slice cells equal filter counts") {
    val cube = HugeModel.get(spark)
    assert(cube.get(Seq.fill(8)("All")).contains(HugeModel.Rows.toDouble))
    // one-dim slice: (m5, All×7) must equal the number of rows with d0 = m5
    val m5Id = cube.dimensions(0).idOf("m5")
    val expected = cube.facts.filter(col("d0") === m5Id)
      .agg(sum("value")).head.getDouble(0)
    assert(cube.get(Seq("m5") ++ Seq.fill(7)("All")).contains(expected))
    // two-dim slice
    val m7Id = cube.dimensions(1).idOf("m7")
    val expected2 = cube.facts.filter(col("d0") === m5Id && col("d1") === m7Id)
      .agg(sum("value")).head.getDouble(0)
    assert(cube.get(Seq("m5", "m7") ++ Seq.fill(6)("All")).contains(expected2))
  }
}
