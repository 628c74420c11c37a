package graft.server

/** Minimal recursive-descent JSON parser — just enough to pull a string
  * field out of a request-body object (the reference's HTTP body shape is
  * `{"sql": "...", "flightsql": bool}`, `src/server/http/router.rs:93-111`).
  * Zero dependencies; strings are unescaped in a single left-to-right pass
  * (including `\uXXXX`), so escape sequences cannot corrupt each other the
  * way chained `String.replace` calls do.
  */
private[graft] object MiniJson {

  /** Full parse of one JSON object: nested objects come back as
    * `Map[String, Any]`, arrays as `Seq[Any]`, strings/booleans/nulls as
    * themselves, numbers as `Double`. Used by the Delta log reader, whose
    * commit files are one action object per line.
    */
  def parseObject(s: String): Option[Map[String, Any]] =
    try {
      val p = new Parser(s)
      p.ws()
      val fields = p.obj()
      p.ws()
      if (p.pos != s.length) None else Some(fields)
    } catch { case _: ParseError => None }

  /** Top-level object's string field `key`, if the body parses as a JSON
    * object and carries that field as a string.
    */
  def objectField(s: String, key: String): Option[String] =
    try {
      val p = new Parser(s)
      p.ws()
      val fields = p.obj()
      p.ws()
      if (p.pos != s.length) None else fields.get(key).collect { case v: String => v }
    } catch { case _: ParseError => None }

  private final class ParseError extends RuntimeException

  private final class Parser(s: String) {
    var pos = 0

    private def fail(): Nothing = throw new ParseError
    private def peek: Char = if (pos < s.length) s.charAt(pos) else fail()
    private def next(): Char = { val c = peek; pos += 1; c }
    private def expect(c: Char): Unit = if (next() != c) fail()

    def ws(): Unit =
      while (pos < s.length && Character.isWhitespace(s.charAt(pos))) pos += 1

    /** Parse an object; only top-level string values are materialized —
      * nested values are validated and skipped.
      */
    def obj(): Map[String, Any] = {
      expect('{'); ws()
      if (peek == '}') { pos += 1; return Map.empty }
      val b = Map.newBuilder[String, Any]
      var done = false
      while (!done) {
        ws()
        val k = string()
        ws(); expect(':'); ws()
        b += k -> value()
        ws()
        next() match {
          case ',' => ()
          case '}' => done = true
          case _ => fail()
        }
      }
      b.result()
    }

    def value(): Any = peek match {
      case '"' => string()
      case '{' => obj()
      case '[' => arr()
      case 't' => lit("true", java.lang.Boolean.TRUE)
      case 'f' => lit("false", java.lang.Boolean.FALSE)
      case 'n' => lit("null", null)
      case _ => number()
    }

    private def arr(): Seq[Any] = {
      expect('['); ws()
      if (peek == ']') { pos += 1; return Seq.empty }
      val b = Seq.newBuilder[Any]
      var done = false
      while (!done) {
        ws()
        b += value()
        ws()
        next() match {
          case ',' => ()
          case ']' => done = true
          case _ => fail()
        }
      }
      b.result()
    }

    private def lit(word: String, v: Any): Any =
      if (s.regionMatches(pos, word, 0, word.length)) { pos += word.length; v }
      else fail()

    private def number(): Double = {
      val start = pos
      if (peek == '-') pos += 1
      while (pos < s.length && "0123456789.eE+-".indexOf(s.charAt(pos)) >= 0) pos += 1
      if (pos == start) fail()
      try s.substring(start, pos).toDouble catch { case _: NumberFormatException => fail() }
    }

    /** JSON string with all escapes handled in one pass. */
    def string(): String = {
      expect('"')
      val sb = new StringBuilder
      var done = false
      while (!done) {
        next() match {
          case '"' => done = true
          case '\\' =>
            next() match {
              case '"' => sb.append('"')
              case '\\' => sb.append('\\')
              case '/' => sb.append('/')
              case 'b' => sb.append('\b')
              case 'f' => sb.append('\f')
              case 'n' => sb.append('\n')
              case 'r' => sb.append('\r')
              case 't' => sb.append('\t')
              case 'u' =>
                if (pos + 4 > s.length) fail()
                val hex = s.substring(pos, pos + 4)
                pos += 4
                try sb.append(Integer.parseInt(hex, 16).toChar)
                catch { case _: NumberFormatException => fail() }
              case _ => fail()
            }
          case c => sb.append(c)
        }
      }
      sb.result()
    }
  }
}
