package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime helpers for the Unicode normalization expressions — static
  * methods the generated code calls directly (the [[RgbUtil]] pattern:
  * no ScalaUDF wrapper, no boxing, stays inside whole-stage codegen).
  */
object TextNormUtil {
  /** Unicode NFC (canonical composition) — the normalization a corpus
    * pipeline applies before ANY hashing/dedup pass: "é" as U+00E9 and
    * as e+U+0301 are the same text to a reader but different bytes to
    * sha2/minhash, so un-normalized corpora leak duplicates past every
    * hash-based family. */
  def nfc(s: UTF8String): UTF8String =
    if (s == null) null
    else UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFC))

  /** Accent folding: NFD then drop combining marks (category Mn) — the
    * search-normalization fold (DuckDB's `strip_accents`, Postgres
    * unaccent). "héllo" → "hello"; base characters untouched.
    *
    * Iterates by CODE POINT, not UTF-16 char (round-12 ADVICE): a
    * supplementary-plane combining mark (e.g. U+1D165-1D169, the
    * musical symbol marks) is two surrogate chars whose per-char
    * `Character.getType` is SURROGATE — a char-wise loop would keep it,
    * diverging from DuckDB's utf8proc-based strip_accents. */
  def stripAccents(s: UTF8String): UTF8String = {
    if (s == null) return null
    val d = java.text.Normalizer.normalize(s.toString,
      java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    var i = 0
    while (i < d.length) {
      val cp = d.codePointAt(i)
      if (Character.getType(cp) != Character.NON_SPACING_MARK)
        sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }
}

/** `nfc_normalize(str)` as a native Catalyst expression (codegen via a
  * static call — SURVEY.md §2.8 ladder rung b). */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(s: Any): Any =
    TextNormUtil.nfc(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNormUtil.nfc($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `strip_accents(str)` as a native Catalyst expression. */
case class StripAccents(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(s: Any): Any =
    TextNormUtil.stripAccents(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNormUtil.stripAccents($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-level API. */
object TextNormFunctions {
  import org.apache.spark.sql.graftshim.Shim.{column, expression}
  def nfcNormalize(c: Column): Column = column(NfcNormalize(expression(c)))
  def stripAccents(c: Column): Column = column(StripAccents(expression(c)))
}
