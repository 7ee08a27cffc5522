package graft

/** Minimal JSON string escaping shared by the driver-contract mains
  * (Verify's oracle_sql.json, Bench's one-line report). Escapes
  * backslash, quote, and ALL control chars (<0x20) — a newline or tab in
  * an exception message or builder-authored SQL would otherwise break the
  * driver's json.load and silently zero the round's results. */
object JsonUtil {
  def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
