package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** The 64-bit SimHash of ONE document's distinct-word-hash array, as a
  * codegen'd scalar projection: bit `p` set iff the ±1 vote sum over the
  * hashes' bit `p` is positive — identical to what [[SimHashBits]]
  * aggregates for the same hash set (SimHashSignatureParitySpec pins it).
  *
  * Exists for the same reason as [[MinHashSignature]]: a one-row-per-
  * document corpus paid TWO shuffles for a per-row value — `explode →
  * distinct` (word strings) then `groupBy(doc)` — where the per-doc
  * distinct is `array_distinct` in place and the vote sum never needs to
  * leave the row. [[SimHashBits]] remains the right shape when the input
  * is already exploded to (group, hash) grain.
  *
  * Null contract: null for a null or empty/all-null-element array,
  * matching the aggregate's all-null-group null (an all-zero signature
  * would read as hamming-0 "identical" to another empty doc).
  */
case class SimHashSignature(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash_sig expects ARRAY<BIGINT>, got $dt")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash_sig"

  override def nullSafeEval(arr: Any): Any = {
    val a = arr.asInstanceOf[ArrayData]
    val n = a.numElements()
    val votes = new Array[Long](64)
    var any = false
    var j = 0
    while (j < n) {
      if (!a.isNullAt(j)) {
        any = true
        val h = a.getLong(j)
        var p = 0
        while (p < 64) { votes(p) += ((h >>> p) & 1L) * 2 - 1; p += 1 }
      }
      j += 1
    }
    if (!any) null
    else {
      var bits = 0L
      var p = 0
      while (p < 64) { if (votes(p) > 0) bits |= (1L << p); p += 1 }
      java.lang.Long.valueOf(bits)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n"); val j = ctx.freshName("j")
      val p = ctx.freshName("p"); val h = ctx.freshName("h")
      val votes = ctx.freshName("votes"); val any = ctx.freshName("any")
      val bits = ctx.freshName("bits")
      s"""
         |final int $n = $arr.numElements();
         |final long[] $votes = new long[64];
         |boolean $any = false;
         |for (int $j = 0; $j < $n; $j++) {
         |  if (!$arr.isNullAt($j)) {
         |    $any = true;
         |    final long $h = $arr.getLong($j);
         |    for (int $p = 0; $p < 64; $p++) {
         |      $votes[$p] += (($h >>> $p) & 1L) * 2 - 1;
         |    }
         |  }
         |}
         |if (!$any) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $bits = 0L;
         |  for (int $p = 0; $p < 64; $p++) {
         |    if ($votes[$p] > 0) $bits |= (1L << $p);
         |  }
         |  ${ev.value} = $bits;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashSignature =
    copy(child = newChild)
}

object SimHashSignature {
  /** Column face: 64-bit SimHash of an ARRAY<BIGINT> hash column. */
  def apply(hashes: Column): Column =
    Bridge.column(SimHashSignature(Bridge.expression(hashes)))
}
