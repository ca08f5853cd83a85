package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: exact integer dot product of two
  * `Array[Long]` columns with whole-stage codegen.
  *
  * Exists because Spark's higher-order functions (`aggregate(zip_with(...))`)
  * evaluate their lambdas interpreted, element by element — a real cost in
  * the ANN hot loop where every (query, candidate) pair needs a 64-element
  * dot. `doGenCode` emits a tight primitive loop instead (the builder-prompt
  * preference order: custom `Expression` over UDF).
  */
case class LongDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot_q expects two ARRAY<BIGINT>, got ${left.dataType} and ${right.dataType}")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_dot_q"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDotProduct =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {
  /** Column-level API for the codegen'd dot product. */
  def dot_q(a: Column, b: Column): Column =
    Bridge.column(LongDotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** `graft_zvalue(col, ..., bits)`: the Morton interleave of
    * [[graft.pipeline.Layout.zValue]], SQL-callable — the bit width must
    * be a literal (it selects how far the shift/mask terms unroll at plan
    * build; a per-row width would defeat the whole codegen'd shape).
    */
  private[functions] def zvalueFromExprs(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    require(exprs.size >= 2,
      "graft_zvalue(col, ..., bits) needs at least one column and the bit width")
    val bits = exprs.last match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
      case other => throw new IllegalArgumentException(
        s"graft_zvalue's last arg must be a literal integer bit width, got $other")
    }
    Bridge.sqlExpression(
      graft.pipeline.Layout.zValue(exprs.init.map(Bridge.column), bits))
  }

  /** `graft_quality(text)`: the scalar quality score of
    * [[graft.pipeline.TextAnalysis.qualityColumns]], SQL-callable.
    */
  private[functions] def qualityFromExprs(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    require(exprs.size == 1, "graft_quality(text) takes exactly one argument")
    Bridge.sqlExpression(graft.pipeline.TextAnalysis
      .qualityColumns(Bridge.column(exprs.head)).toMap.apply("quality"))
  }

  /** Register the graft expressions for SQL use in an existing session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot_q", exprs => LongDotProduct(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_sorted_intersect", exprs => SortedIntersectCount(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_zvalue", zvalueFromExprs, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_quality", qualityFromExprs, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_normalize_text", exprs => {
        def flag(i: Int): Boolean = exprs.lift(i) match {
          case None => false
          case Some(org.apache.spark.sql.catalyst.expressions.Literal(v: Boolean, _)) => v
          case Some(other) => throw new IllegalArgumentException(
            s"graft_normalize_text flag args must be literal booleans, got $other")
        }
        NormalizeText(exprs(0), flag(1), flag(2))
      }, "built-in")
  }
}
