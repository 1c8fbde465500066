package graft.tools

/** The one JSON string escaper both artifact writers share (Verify's
  * oracle_sql/pinned dumps, Bench's stdout + BENCH_FULL lines).
  * Escapes backslash, quote, and ALL control chars (<0x20): a tab or
  * CR in builder-authored SQL — or a Spark error message in a failed
  * pinned verdict — would otherwise make the driver's json.load fail
  * and silently zero the round's artifact.
  */
object Jsons {
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
