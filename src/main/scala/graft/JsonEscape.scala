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
}
