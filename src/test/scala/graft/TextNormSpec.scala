package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextNormFunctions, TextNormUtil}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization expressions (q146) — the TRANSFORM regime the
  * ASCII fixture gate cannot exercise: combining sequences compose
  * under NFC, accents fold under strip, CJK and base characters pass
  * through, and the expressions survive both codegen paths.
  */
class TextNormSpec extends SparkSpec {
  import spark.implicits._

  private def u(s: String) = UTF8String.fromString(s)

  test("NFC composes combining sequences; composed text is a fixpoint") {
    // "e" + COMBINING ACUTE (U+0301) → U+00E9
    assert(TextNormUtil.nfc(u("é")).toString == "é")
    assert(TextNormUtil.nfc(u("é")).toString == "é")
    // the dedup leak this fixes: both spellings hash identically after NFC
    val d = Seq("café", "café").toDF("text")
    val hashes = d.select(sha2(TextNormFunctions.nfcNormalize(col("text"))
      .cast("binary"), 256)).collect().map(_.getString(0)).toSet
    assert(hashes.size == 1, "NFC must collapse composed/decomposed spellings")
  }

  test("stripAccents folds marks, keeps base chars and CJK intact") {
    assert(TextNormUtil.stripAccents(u("héllo Wörld")).toString
      == "hello World")
    assert(TextNormUtil.stripAccents(u("façade naïve")).toString
      == "facade naive")
    assert(TextNormUtil.stripAccents(u("資料工程師 abc")).toString
      == "資料工程師 abc")
    assert(TextNormUtil.stripAccents(null) == null)
  }

  test("stripAccents drops supplementary-plane combining marks (code-point walk)") {
    // U+1D167 MUSICAL SYMBOL COMBINING TREMOLO-1 is category Mn but
    // encodes as a surrogate pair — a UTF-16 char-wise loop sees two
    // SURROGATE chars and keeps it (round-12 ADVICE). Sanity-pin the
    // category so a JDK Unicode-table change can't silently void the test.
    assert(Character.getType(0x1D167) == Character.NON_SPACING_MARK)
    assert(TextNormUtil.stripAccents(u("a𝅧b")).toString == "ab")
    // a non-mark supplementary char (U+1F600, So) must survive untouched
    assert(TextNormUtil.stripAccents(u("x😀y")).toString
      == "x😀y")
  }

  test("expressions match across codegen on/off and keep null semantics") {
    val d = Seq(Some("café"), Some("plain"), None).toDF("text")
    def run() = d.select(
        TextNormFunctions.nfcNormalize(col("text")).as("n"),
        TextNormFunctions.stripAccents(col("text")).as("s"))
      .collect().map(r => (Option(r.getString(0)), Option(r.getString(1)))).toSeq
    val on = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(run() == on)
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    assert(on == Seq(
      (Some("caf\u00e9"), Some("cafe")),
      (Some("plain"), Some("plain")),
      (None, None)))
  }
}
