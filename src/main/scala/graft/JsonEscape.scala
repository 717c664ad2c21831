package graft

/** JSON string escaping shared by the harness artifact writers (Verify's
  * oracle/failure dumps, Bench's result line): backslash, quote, and ALL
  * control chars (<0x20) — a tab or CR in builder-authored SQL or an error
  * message would otherwise make the driver's json.load fail and silently
  * zero a round's artifact.
  */
private[graft] object JsonEscape {
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
