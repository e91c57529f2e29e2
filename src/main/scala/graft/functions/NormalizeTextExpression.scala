package graft.functions

import java.text.Normalizer
import java.util.Locale
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared implementation for [[NormalizeText]]'s interpreted and codegen
  * paths: Unicode-canonicalize, strip accents, casefold, collapse
  * whitespace — ONE pass over the string per stage, compiled patterns
  * cached statically.
  */
object NormalizeTextUtil {
  // \p{Mn} = nonspacing combining marks; stripping them after NFD is the
  // utf8proc STRIPMARK algorithm DuckDB's strip_accents implements, so
  // the oracle can replicate this stage verbatim.
  private val marks = Pattern.compile("\\p{Mn}")
  private val ws = Pattern.compile("\\s+")

  def normalize(s: UTF8String): UTF8String = {
    // NFC first so inputs arriving decomposed and composed normalize
    // identically; NFD exposes the marks; a final NFC re-composes what
    // stripping left (Hangul syllables, unaffected scripts) so the
    // output is in the canonical form downstream ops expect.
    val nfc = Normalizer.normalize(s.toString, Normalizer.Form.NFC)
    val stripped = marks.matcher(
      Normalizer.normalize(nfc, Normalizer.Form.NFD)).replaceAll("")
    val recomposed = Normalizer.normalize(stripped, Normalizer.Form.NFC)
    // Locale.ROOT: locale-sensitive lowercasing (tr dotless-i) would
    // make the output depend on the executor's default locale.
    val lowered = recomposed.toLowerCase(Locale.ROOT)
    UTF8String.fromString(ws.matcher(lowered).replaceAll(" ").strip())
  }
}

/** `graft_normalize_text(text)` — the standard text-canonicalization
  * stage of a crawl-curation pipeline (the cleanup CCNet/C4-class
  * pipelines run before dedup so `Café`, `café`, and `café`
  * fingerprint identically): NFC -> accent strip (NFD + remove
  * nonspacing marks, the utf8proc STRIPMARK rule) -> NFC -> ROOT-locale
  * lowercase -> whitespace collapse + trim.
  *
  * A native expression because this runs over every byte of a 100 TB
  * corpus: one codegen'd call per row with statically compiled
  * patterns, inside whole-stage codegen — the composable-Column
  * equivalent would chain four regexp_replace/lower calls, each
  * materializing an intermediate UTF8String per row.
  */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def prettyName: String = "graft_normalize_text"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName input must be STRING")

  override protected def nullSafeEval(input: Any): Any =
    NormalizeTextUtil.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NormalizeTextUtil.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}
