package graft

/** Minimal JSON string escaping shared by the driver-contract mains
  * (Verify's oracle_sql.json, Bench's one-line report). Escapes
  * backslash, quote, and ALL control chars (<0x20) — a newline or tab in
  * an exception message or builder-authored SQL would otherwise break the
  * driver's json.load and silently zero the round's results. Surrogates
  * (paired or not) are \u-escaped too: Bench truncates error messages
  * with take(n), which can split an astral character and leave a lone
  * surrogate — passed through raw that is invalid UTF-8 on the one line
  * a machine parses, while the escaped form is always valid JSON (a
  * well-formed pair escapes to the same astral char, a lone half to the
  * replacement-tolerant \uDxxx that strict parsers accept as an escape). */
object JsonUtil {
  def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' || (c >= '\ud800' && c <= '\udfff') =>
      f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
