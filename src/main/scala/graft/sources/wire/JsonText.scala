package graft.sources.wire

/** The one JSON string escaper for every wire decoder's text
  * projection. Three decoders previously carried private copies that
  * drifted (LogMiner's lacked control-character escaping, which RFC
  * 8259 requires); this is the single shared implementation.
  */
private[wire] object JsonText {

  /** Render `s` as a JSON string literal (quotes, backslashes, and all
    * control characters below 0x20 escaped).
    */
  def jsonString(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').result()
  }
}
