package graft.graph

/** Composite (list / map) property literals for the Cypher surfaces.
  *
  * This engine stores properties as `map<string,string>`, so a
  * list- or map-valued literal — `{tags: ['a','b']}`, Neo4j-legal in
  * pattern maps — round-trips through ONE canonical serialization:
  * JSON text with strings escaped, numbers verbatim, map keys sorted,
  * no whitespace. CypherWrite stores the canonical text; CypherLite
  * and CypherWrite MATCH constraints compare stored text against the
  * canonically-rendered pattern literal, which makes list equality
  * order-sensitive and map equality order-insensitive — Neo4j's own
  * semantics for the two types. The Cypher literal grammar here has
  * no string escapes, so values cannot contain single quotes
  * (rejected upstream, same rule as scalar literals).
  */
private[graph] object PropLiterals {

  /** Does this literal text start a composite (list/map) value? */
  def isComposite(s: String): Boolean = {
    val t = s.trim
    t.startsWith("[") || t.startsWith("{")
  }

  /** Top-level ELEMENTS of a Cypher list literal as stored-form string
    * values (strings unquoted, numbers verbatim, nested composites
    * canonical JSON) — the FOREACH explode shape (r13). */
  def elements(text: String): Seq[String] = {
    val t = text.trim
    require(t.startsWith("[") && t.endsWith("]"), s"not a list literal: $text")
    val inner = t.substring(1, t.length - 1)
    val parts = scala.collection.mutable.Buffer.empty[String]
    var depth = 0; var inStr = false; var start = 0
    for (i <- inner.indices) inner.charAt(i) match {
      case '\'' => inStr = !inStr
      case '[' | '{' if !inStr => depth += 1
      case ']' | '}' if !inStr => depth -= 1
      case ',' if !inStr && depth == 0 =>
        parts += inner.substring(start, i); start = i + 1
      case _ =>
    }
    parts += inner.substring(start)
    parts.toSeq.map(_.trim).filter(_.nonEmpty).map {
      case q if q.startsWith("'") && q.endsWith("'") && q.length >= 2 =>
        q.substring(1, q.length - 1)
      case c if isComposite(c) => canonical(c)
      case n => n
    }
  }

  /** Canonical JSON text for a Cypher list/map literal. Loud
    * IllegalArgumentException on malformed input. */
  def canonical(text: String): String = {
    val p = new P(text.trim)
    val out = p.value()
    p.ws()
    require(p.rest.isEmpty, s"trailing content in composite literal: $text")
    out
  }

  private final class P(var rest: String) {
    def ws(): Unit = { rest = rest.dropWhile(c => c == ' ' || c == '\t') }

    private val KeyRe = """^(\w+)\s*:""".r
    private val NumRe = """^-?\d+(\.\d+)?""".r

    def value(): String = {
      ws()
      if (rest.startsWith("'")) {
        val end = rest.indexOf('\'', 1)
        require(end > 0, "unterminated string in composite literal")
        val s = rest.substring(1, end)
        rest = rest.substring(end + 1)
        jsonStr(s)
      } else if (rest.startsWith("[")) {
        rest = rest.substring(1)
        val items = scala.collection.mutable.Buffer.empty[String]
        ws()
        if (rest.startsWith("]")) rest = rest.substring(1)
        else {
          var done = false
          while (!done) {
            items += value(); ws()
            if (rest.startsWith(",")) rest = rest.substring(1)
            else if (rest.startsWith("]")) { rest = rest.substring(1); done = true }
            else throw new IllegalArgumentException(
              s"bad list literal near: $rest")
          }
        }
        items.mkString("[", ",", "]")
      } else if (rest.startsWith("{")) {
        rest = rest.substring(1)
        val entries = scala.collection.mutable.Buffer.empty[(String, String)]
        ws()
        if (rest.startsWith("}")) rest = rest.substring(1)
        else {
          var done = false
          while (!done) {
            ws()
            val m = KeyRe.findFirstMatchIn(rest).getOrElse(
              throw new IllegalArgumentException(s"bad map key near: $rest"))
            rest = rest.substring(m.end)
            entries += (m.group(1) -> value())
            ws()
            if (rest.startsWith(",")) rest = rest.substring(1)
            else if (rest.startsWith("}")) { rest = rest.substring(1); done = true }
            else throw new IllegalArgumentException(
              s"bad map literal near: $rest")
          }
        }
        entries.sortBy(_._1)
          .map { case (k, v) => jsonStr(k) + ":" + v }
          .mkString("{", ",", "}")
      } else {
        val m = NumRe.findFirstIn(rest).getOrElse(
          throw new IllegalArgumentException(s"bad literal near: $rest"))
        rest = rest.substring(m.length)
        m
      }
    }

    private def jsonStr(s: String): String =
      "\"" + s.flatMap {
        case '"'  => "\\\""
        case '\\' => "\\\\"
        case c    => c.toString
      } + "\""
  }
}
