package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization as a native codegen'd expression — the
  * pre-dedup canonicalization step every real corpus pipeline runs before
  * fingerprinting (NFC so "é" composed and "e"+"́" decomposed hash alike;
  * optional accent folding and case folding so near-dup candidates are not
  * split by diacritic/case noise). Spark has no builtin for NFC or accent
  * stripping, and a Scala UDF would fall out of whole-stage codegen and
  * box every row — this stays a scan-shaped column, null handling free.
  *
  * Semantics (engine-portable, oracle-checked against DuckDB):
  * `nfc_normalize` ≙ java.text.Normalizer NFC; `strip_accents` ≙ NFD →
  * drop combining marks (\p{Mn}) → NFC; `lower` ≙ Locale.ROOT lowercase —
  * applied in that order, matching
  * `lower(strip_accents(nfc_normalize(x)))`.
  */
case class NormalizeText(child: Expression, stripAccents: Boolean,
    toLower: Boolean) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_normalize_text expects STRING, got $dt")
  }
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_normalize_text"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(TextNorm.normalize(
      input.asInstanceOf[UTF8String].toString, stripAccents, toLower))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.TextNorm.normalize($c.toString(), $stripAccents, $toLower));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {
  def apply(c: Column, stripAccents: Boolean = false,
      toLower: Boolean = false): Column =
    Bridge.column(NormalizeText(Bridge.expression(c), stripAccents, toLower))
}

/** Plain object (static forwarders) so generated code can call it without
  * a reference object — the normalization itself is JDK-only. */
object TextNorm {
  private val Marks = java.util.regex.Pattern.compile("\\p{Mn}+")
  def normalize(s: String, stripAccents: Boolean, toLower: Boolean): String = {
    import java.text.Normalizer
    var r =
      if (stripAccents)
        Normalizer.normalize(
          Marks.matcher(Normalizer.normalize(s, Normalizer.Form.NFD)).replaceAll(""),
          Normalizer.Form.NFC)
      else Normalizer.normalize(s, Normalizer.Form.NFC)
    if (toLower) r = r.toLowerCase(java.util.Locale.ROOT)
    r
  }
}
