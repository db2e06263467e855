package graft

/** THE JSON string-escape policy for every free-text value this library
  * prints into a machine-parsed JSON line (Verify's oracle_sql.json,
  * Bench's bench_out.json). One definition: backslash, quote, and ALL
  * control chars (<0x20) — a tab or CR in builder-authored SQL or an
  * environment-controlled path would otherwise corrupt the one line the
  * harness parses. Two emitters sharing an escaper cannot drift.
  */
private[graft] object JsonText {
  def escape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  def quote(s: String): String = "\"" + escape(s) + "\""
}
