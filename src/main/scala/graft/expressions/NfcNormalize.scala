package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Unicode NFC normalization (canonical composition) as a native codegen
 * expression — the preprocessing step every content-hash dedup needs
 * BEFORE hashing: "café" arrives both precomposed (U+00E9) and
 * decomposed (e + U+0301) in any real crawl, the two byte sequences
 * hash differently, and an un-normalized exact dedup silently keeps
 * both. NFC is the deterministic canonical form (idempotent, preserves
 * visual identity; compatibility folding like ligature expansion is
 * NFKC's job and deliberately NOT done here — it loses information).
 *
 * Already-normalized input (the overwhelmingly common case — all ASCII
 * is NFC by construction) takes a verify-only fast path and returns the
 * original UTF8String without re-encoding.
 */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = NfcNormalize.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $cls.compute($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {

  /** Shared by interpreted eval and generated code. */
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
