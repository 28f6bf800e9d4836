package graft.core

import java.text.Normalizer

/** Column/header name sanitization with byte-for-byte parity to the
  * reference's `sinitize_text` (sic) — see
  * `/root/reference/src/ex8_producer/utils/functions.py:5-20` — plus the
  * `.lower()` the reference applies at the call site
  * (`/root/reference/src/ex8_producer/app.py:129`).
  *
  * This is a plan-build-time rename (applied to `df.columns`), NOT a UDF on
  * data — renames are free at any scale. The one query that applies the same
  * transform *as data* (q50_string_sanitize) routes through [[sanitizeUdf]].
  *
  * Python-semantics notes (matched deliberately):
  *   - `re.sub(r'[^\w\s]', '', ...)` with Python str semantics: `\w` is
  *     unicode alphanumeric + underscore but NOT combining marks (category
  *     Mn), which is exactly how NFKD + this regex strips accents
  *     ("Instituição" → NFKD → "Instituic<cedilla>a<tilde>o" → "Instituicao").
  *     Java's `(?U)\w` WOULD match Mn, so we use an explicit class
  *     `[\p{L}\p{N}_]` (Python `isalnum` ≈ L* ∪ N*) + White_Space.
  *   - `re.match(r'^\d', ...)`: `\d` is Nd — `Character.isDigit`.
  *   - `.strip("_").strip()`: after `\s+ → _` no whitespace remains, so the
  *     trailing `.strip()` is a no-op; we keep it anyway for parity.
  */
object Naming {
  private val nonWordNonSpace = "[^\\p{L}\\p{N}_\\p{IsWhite_Space}]".r
  private val spaces = "[\\p{IsWhite_Space}]+".r
  private val underscores = "_+".r

  /** Reference `sinitize_text` parity (without the call-site `.lower()`). */
  def sanitize(text: String): String = {
    var t = Normalizer.normalize(text, Normalizer.Form.NFKD)
    t = nonWordNonSpace.replaceAllIn(t, "")
    t = spaces.replaceAllIn(t, "_")
    t = underscores.replaceAllIn(t, "_")
    t = t.replaceAll("^_+|_+$", "").strip()
    if (t.nonEmpty && Character.isDigit(t.charAt(0))) "col_" + t else t
  }

  /** sanitize + lower — the full header transform the reference applies. */
  def sanitizeLower(text: String): String =
    sanitize(text).toLowerCase(java.util.Locale.ROOT)
}
