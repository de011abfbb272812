package graft

/** Shared JSON string escaping for the hand-rolled JSON the mains emit
  * (no JSON library dependency): backslash, quote, and ALL control chars
  * (<0x20) — a tab or CR in builder-authored SQL would otherwise break
  * the driver's json.load and silently zero a round's correctness.
  */
object JsonUtil {
  def escape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  def str(s: String): String = "\"" + escape(s) + "\""
}
