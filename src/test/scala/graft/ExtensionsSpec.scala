package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {

  /** Run `f` with a session whose functions come ONLY from the
    * [[graft.functions.GraftExtensions]] injectFunction path. `getOrCreate`
    * returns the existing default session (skipping extensions) unless the
    * default/active slots are cleared first, so clear them, build fresh
    * over the shared SparkContext, and restore the memoized test session
    * afterward. No `GraftFunctions.register` fallback anywhere in here —
    * if injection broke, every call in `f` would fail to resolve.
    */
  private def withInjectedSession[T](f: SparkSession => T): T = {
    val base = TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .withExtensions(new graft.functions.GraftExtensions)
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
      assert(s ne base, "must be a genuinely new session, not the memoized one")
      f(s)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("graft_dot_q is SQL-callable via extension injection alone") {
    withInjectedSession { s =>
      val got = s.sql("SELECT graft_dot_q(array(1L,2L,3L), array(4L,5L,6L)) AS d")
        .collect().head.getLong(0)
      assert(got == 4 + 10 + 18)
    }
  }

  test("graft_dot_q also resolves through the register() path on an existing session") {
    val s = TestSpark.spark.newSession()
    graft.functions.GraftFunctions.register(s)
    val got = s.sql("SELECT graft_dot_q(array(1L,2L,3L), array(4L,5L,6L)) AS d")
      .collect().head.getLong(0)
    assert(got == 4 + 10 + 18)
  }

  test("graft_sorted_intersect merge walk equals array_intersect size") {
    withInjectedSession { s =>
      val got = s.sql(
        "SELECT graft_sorted_intersect(array(1L,3L,5L,9L), array(2L,3L,5L,8L,9L)) AS n")
        .collect().head.getLong(0)
      assert(got == 3) // {3, 5, 9}
      // property: equals size(array_intersect) on random sorted distinct arrays
      val rnd = new scala.util.Random(7)
      (1 to 20).foreach { _ =>
        val a = Seq.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong).distinct.sorted
        val b = Seq.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong).distinct.sorted
        val expect = a.toSet.intersect(b.toSet).size
        def lit(xs: Seq[Long]) =
          if (xs.isEmpty) "CAST(array() AS ARRAY<BIGINT>)" else xs.mkString("array(", "L,", "L)")
        val n = s.sql(s"SELECT graft_sorted_intersect(${lit(a)}, ${lit(b)}) AS n")
          .collect().head.getLong(0)
        assert(n == expect, s"a=$a b=$b")
      }
    }
  }

  test("graft_normalize_text is SQL-callable; flags must be literals") {
    withInjectedSession { s =>
      val r = s.sql(
        "SELECT graft_normalize_text('Café', true, true) AS a, " +
          "graft_normalize_text('Café') AS b")
        .collect().head
      assert(r.getString(0) == "cafe")
      assert(r.getString(1) == "Café", "1-arg form is NFC only")
      val err = intercept[Exception] {
        s.sql("SELECT graft_normalize_text('x', 1 = 1 AND rand() > -1, false)")
          .collect()
      }
      assert(err.getMessage.contains("literal boolean"))
    }
  }

  test("graft_zvalue and graft_quality are SQL-callable; bit width must be literal") {
    withInjectedSession { s =>
      // bit i of x -> position 2i, bit i of y -> 2i+1 (matches Layout.zValue)
      val z = s.sql("SELECT graft_zvalue(3L, 3L, 2) AS z").collect().head.getLong(0)
      assert(z == 15L)
      val q = s.sql("SELECT graft_quality('the cat sat on the mat.') AS q")
        .collect().head.getDouble(0)
      val expect = graft.pipeline.TextAnalysis
        .qualityColumns(org.apache.spark.sql.functions.lit("the cat sat on the mat."))
        .toMap.apply("quality")
      val viaColumn = s.range(1).select(expect.as("q")).collect().head.getDouble(0)
      assert(q == viaColumn, "SQL face and Column face must agree bit-for-bit")
      val err = intercept[Exception] {
        s.sql("SELECT graft_zvalue(1L, 2L, CAST(rand() * 4 AS INT))").collect()
      }
      assert(err.getMessage.contains("literal integer bit width"))
    }
  }

  test("DESCRIBE FUNCTION reports the right implementing class for zvalue/quality") {
    withInjectedSession { s =>
      val dz = s.sql("DESCRIBE FUNCTION EXTENDED graft_zvalue")
        .collect().map(_.getString(0)).mkString("\n")
      assert(dz.contains("GraftFunctions"),
        s"graft_zvalue info should name the builder object, got:\n$dz")
      assert(!dz.contains("LongDotProduct"),
        "graft_zvalue must not claim LongDotProduct as its class")
      val dq = s.sql("DESCRIBE FUNCTION EXTENDED graft_quality")
        .collect().map(_.getString(0)).mkString("\n")
      assert(dq.contains("GraftFunctions") && !dq.contains("LongDotProduct"))
    }
  }
}
