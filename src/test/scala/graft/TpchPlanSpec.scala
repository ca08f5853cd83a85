package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.scalatest.funsuite.AnyFunSuite

/** Plan-property pins for the TPC-H battery: each gate's scaladoc claims a
  * specific plan shape (single scan, pushdown, join strategy); this spec
  * keeps those claims TRUE as the code evolves — a regression here means
  * the documented 100 TB story no longer matches the plan Spark builds.
  */
class TpchPlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String) =
    SparkEntry.queries(name)(spark, dir).queryExecution.sparkPlan

  private def scansOf(name: String, table: String): Seq[FileSourceScanExec] =
    plan(name).collect {
      case s: FileSourceScanExec
          if s.metadata.get("Location").exists(_.contains(table)) => s
    }

  test("q15/q11/q2: the correlated aggregate plans exactly ONE fact scan") {
    for (q <- Seq("q15_top_supplier", "q11_important_stock", "q2_min_cost_supplier"))
      assert(scansOf(q, "lineitem").size == 1,
        s"$q must window over ONE lineitem scan, not re-aggregate a second")
  }

  test("q19: each side's OR-of-ANDs disjunction pushes to its parquet scan") {
    val li = scansOf("q19_discounted_revenue", "lineitem")
    val pt = scansOf("q19_discounted_revenue", "part.parquet")
    assert(li.exists(_.metadata.getOrElse("PushedFilters", "")
        .matches(".*Or\\(.*l_quantity.*")),
      "quantity windows must push to the lineitem scan")
    assert(pt.exists(_.metadata.getOrElse("PushedFilters", "")
        .matches(".*Or\\(.*p_brand.*")),
      "brand/size windows must push to the part scan")
  }

  test("q6: every predicate reaches the single scan's pushed filters") {
    val s = scansOf("q6_forecast_revenue", "lineitem")
    assert(s.size == 1)
    val pushed = s.head.metadata.getOrElse("PushedFilters", "")
    for (c <- Seq("l_shipdate", "l_discount", "l_quantity"))
      assert(pushed.contains(c), s"$c must be pushed; got $pushed")
  }

  test("q4 plans a LEFT SEMI and q21 a SEMI + ANTI, with no nested loops") {
    val p4 = plan("q4_order_priority").toString
    assert(p4.contains("LeftSemi"), s"q4 must de-correlate EXISTS:\n$p4")
    val p21 = plan("q21_waiting_supplier").toString
    assert(p21.contains("LeftSemi") && p21.contains("LeftAnti"),
      s"q21 must de-correlate both subqueries:\n$p21")
    for ((n, p) <- Seq("q4" -> p4, "q21" -> p21))
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"$n leaked a quadratic join:\n$p")
  }

  test("q13: the priority filter stays INSIDE the outer join (zero-order customers survive)") {
    val df = SparkEntry.queries("q13_order_distribution")(spark, dir)
    val nCust = spark.read.parquet(s"$dir/customer.parquet").count()
    val total = df.agg(org.apache.spark.sql.functions.sum("custdist")).head.getLong(0)
    assert(total == nCust, "every customer must appear in exactly one histogram bucket")
  }
}
