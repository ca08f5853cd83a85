package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions installer: makes the graft native expressions
  * available to plain SQL in any session built with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions` — the standard
  * extension wiring for a library shipping custom Catalyst expressions.
  *
  * {{{
  *   SELECT graft_dot_q(a, b) FROM vectors
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_dot_q"),
      new ExpressionInfo(classOf[LongDotProduct].getName, "graft_dot_q"),
      (exprs: Seq[Expression]) => LongDotProduct(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_sorted_intersect"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "graft_sorted_intersect"),
      (exprs: Seq[Expression]) => SortedIntersectCount(exprs(0), exprs(1))))
    // zvalue/quality are composite Column trees (no single Expression
    // class), so DESCRIBE FUNCTION points at the builder object — not at
    // an unrelated expression class.
    e.injectFunction((
      FunctionIdentifier("graft_zvalue"),
      new ExpressionInfo(GraftFunctions.getClass.getName, null, "graft_zvalue",
        "graft_zvalue(col, ..., bits) - Morton bit-interleave of the columns at a literal bit width.", ""),
      (exprs: Seq[Expression]) => GraftFunctions.zvalueFromExprs(exprs)))
    e.injectFunction((
      FunctionIdentifier("graft_quality"),
      new ExpressionInfo(GraftFunctions.getClass.getName, null, "graft_quality",
        "graft_quality(text) - heuristic document quality score in [0,1].", ""),
      (exprs: Seq[Expression]) => GraftFunctions.qualityFromExprs(exprs)))
    // graft_normalize_text(s [, strip_accents, to_lower]) — the flag args
    // must be literal booleans (they select the codegen'd normalization
    // variant; a per-row flag would defeat constant folding)
    e.injectFunction((
      FunctionIdentifier("graft_normalize_text"),
      new ExpressionInfo(classOf[NormalizeText].getName, "graft_normalize_text"),
      (exprs: Seq[Expression]) => {
        def flag(i: Int): Boolean = exprs.lift(i) match {
          case None => false
          case Some(org.apache.spark.sql.catalyst.expressions.Literal(v: Boolean, _)) => v
          case Some(other) => throw new IllegalArgumentException(
            s"graft_normalize_text flag args must be literal booleans, got $other")
        }
        NormalizeText(exprs(0), flag(1), flag(2))
      }))
  }
}
