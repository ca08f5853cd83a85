package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {
  test("graft_dot_q is SQL-callable in a session built with GraftExtensions") {
    // separate session wiring the extension (shares the JVM's SparkContext)
    TestSpark.spark // ensure the context exists with test configs
    val s = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate().newSession()
    graft.functions.GraftFunctions.register(s) // registry path for existing sessions
    val got = s.sql("SELECT graft_dot_q(array(1L,2L,3L), array(4L,5L,6L)) AS d")
      .collect().head.getLong(0)
    assert(got == 4 + 10 + 18)
  }
}
