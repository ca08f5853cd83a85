package graft

import org.scalatest.funsuite.AnyFunSuite

class SqlViewsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("registerTempViews exposes the model to spark.sql rollup queries") {
    val db = TinyModel.build(spark)
    val cube = db.cube("sales")
    cube.set(Seq("2021", "Jan", "North", "motorcycles", "Sales"), 123.0)
    cube.set(Seq("2021", "Jan", "North", "sedan", "Sales"), 456.0)
    cube.compact()
    db.registerTempViews()
    // the 579.0 fixture, as plain Spark SQL over facts + closure tables
    val total = spark.sql(
      """SELECT SUM(f.value * pc.weight * mc.weight) AS v
         FROM sales_facts f
         JOIN products_closure pc ON f.d3 = pc.leaf
         JOIN products_members pm ON pc.anc = pm.id AND pm.name = 'Total'
         JOIN months_closure mc ON f.d1 = mc.leaf
         JOIN months_members mm ON mc.anc = mm.id AND mm.name = 'Year'
         JOIN measures_members me ON f.d4 = me.id AND me.name = 'Sales'
      """).collect().head.getDouble(0)
    assert(total == 579.0)
  }
}
