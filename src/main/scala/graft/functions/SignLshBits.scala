package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Sign-LSH signature: one bit per hyperplane — bit p set iff
  * `dot(vec, plane_p) > 0`. All planes of one hash table are evaluated in a
  * single codegen'd loop over a reference-object `double[planes][dim]`
  * matrix, instead of nPlanes separate interpreted higher-order-function
  * dot products (which dominated the ANN bucketing cost).
  */
case class SignLshBits(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {

  require(planes.nonEmpty && planes.length <= 64, "1..64 hyperplanes per table")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_sign_lsh"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_sign_lsh expects ARRAY<FLOAT|DOUBLE>, got $dt")
  }

  // resolved lazily — child.dataType is unavailable at construction
  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    var bits = 0L
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      val n = math.min(dim, plane.length)
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += (if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)) * plane(i)
        i += 1
      }
      if (acc > 0) bits |= (1L << p)
      p += 1
    }
    bits
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    val getter = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, c => {
      val p = ctx.freshName("p"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc"); val bits = ctx.freshName("bits")
      val n = ctx.freshName("n"); val plane = ctx.freshName("plane")
      s"""
         |long $bits = 0L;
         |for (int $p = 0; $p < $planesRef.length; $p++) {
         |  double[] $plane = $planesRef[$p];
         |  int $n = java.lang.Math.min($c.numElements(), $plane.length);
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += (double) $c.$getter($i) * $plane[$i];
         |  }
         |  if ($acc > 0) $bits |= (1L << $p);
         |}
         |${ev.value} = $bits;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SignLshBits =
    copy(child = newChild)
}

object SignLshBits {
  def apply(vec: Column, planes: Array[Array[Double]]): Column =
    Bridge.column(SignLshBits(Bridge.expression(vec), planes))
}
