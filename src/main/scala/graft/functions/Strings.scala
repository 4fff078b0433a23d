package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.functions._

/** Column wrappers over graft's native string kernels. */
object Strings {

  /** Unicode NFC canonical composition — see
   * [[graft.expressions.NfcNormalize]]. */
  def nfcNormalize(text: Column): Column =
    GraftBridge.column(graft.expressions.NfcNormalize(
      GraftBridge.expression(text)))

  /** The canonical text-normalization recipe run BEFORE content
   * hashing / exact dedup: NFC composition (precomposed ≡ decomposed
   * accents), Unicode lowercase, whitespace runs collapsed to one
   * space, edges trimmed. Deterministic and idempotent — two crawls of
   * the same page normalize to the same bytes, which is the entire
   * point (an un-normalized exact dedup keeps "café" twice). */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(lower(nfcNormalize(text)), "\\s+", " "))
}
