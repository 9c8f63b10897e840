package graft

/** One JSON string-escape implementation for every hand-emitted JSON
  * artifact (Bench's error fields, Verify's oracle_sql.json/errors.json):
  * backslash, quote, and ALL control chars (<0x20) — a tab or CR in
  * builder-authored SQL would otherwise break the driver's json.load. */
object JsonEscape {
  /** Escaped content WITHOUT surrounding quotes. */
  def apply(s: String): String = s.flatMap {
    case '"'          => "\\\""
    case '\\'         => "\\\\"
    case '\n'         => "\\n"
    case '\r'         => "\\r"
    case '\t'         => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c            => c.toString
  }

  /** Escaped AND quoted. */
  def quote(s: String): String = "\"" + apply(s) + "\""

  /** Locale-ROOT fixed-point number for hand-emitted JSON: the f""
    * interpolator is locale-sensitive, and under a comma-decimal default
    * locale (de_DE etc.) it prints `12,345` — invalid JSON that the
    * parent's digit regex would silently mis-parse as `12`. */
  def num(x: Double, scale: Int): String =
    // %f formats non-finite doubles as the bare tokens NaN/Infinity —
    // invalid JSON from the helper that exists to emit valid JSON. `null`
    // keeps the artifact parseable and makes the bad metric VISIBLE
    // downstream instead of fabricating a plausible number.
    if (java.lang.Double.isFinite(x))
      String.format(java.util.Locale.ROOT, s"%.${scale}f", Double.box(x))
    else "null"
}
