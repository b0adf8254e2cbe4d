package graft.graph

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cypher WRITE surface: `MERGE` / `MATCH` / `ON CREATE SET` /
  * `ON MATCH SET` / `SET` / `DELETE` / `DETACH DELETE` / `REMOVE`
  * statements against the (nodes, edges) frame pair — the reference's
  * own ETL idiom (events.py:75-257 is a library of exactly these
  * statements, run once per span against Neo4j), plus the write verbs
  * a production user of such a graph reaches for next (retention
  * trimming, property scrubbing).
  *
  * Spark-first semantics: a statement compiles to a KEYED BATCH UPSERT
  * over a PARAMETER FRAME — one row per `$param` binding set, the
  * whole batch applied in one pass of joins/aggregations. The
  * reference's per-event `session.run(cypher, **params)` loop is the
  * scale anti-pattern this replaces (SysmonGraph's batch build is the
  * native equivalent; this surface exists so reference-shaped MERGE
  * text runs verbatim). A literal statement with no `$params` is just
  * a one-row batch.
  *
  * Supported clause sequence (whitespace-insensitive, case-insensitive
  * keywords):
  *   - `MERGE (v:Label {k: $p|'lit'|num, …})` — node upsert; the FIRST
  *     map entry is the node's identity (its value becomes `id`); all
  *     entries land in `props`.
  *   - `MATCH (v:Label {…})` — bind an EXISTING node; parameter rows
  *     whose match misses contribute nothing downstream (Cypher's
  *     inner-match semantics). Map entries beyond the identity entry
  *     are genuine match CONSTRAINTS — equality against the node's
  *     stored props, enforced per parameter row.
  *   - `MERGE (a)-[r:TYPE {…}]->(b)` — edge upsert keyed on
  *     (etype, src, dst); endpoints must be variables bound above.
  *   - `MATCH (v:Label)` (mapless, r12) — bind the whole label scan,
  *     or with `WHERE` the narrowed scan; SET-SCOPED: SET/REMOVE/
  *     DELETE apply to every matched node (the triage idiom
  *     `MATCH (p:Process) WHERE p.image CONTAINS 'x' SET p.flag = '1'`).
  *     A mapless variable cannot anchor an edge clause (no per-row
  *     identity), and MERGE/CREATE reject mapless patterns.
  *   - `WHERE <pred>` (r12) — immediately after a MATCH clause (node
  *     or edge): the FULL CypherLite predicate grammar (CONTAINS /
  *     STARTS WITH / ENDS WITH / arithmetic / exists-patterns / label
  *     tests), evaluated by ONE scoped read-run against the frames as
  *     of the clause (edges pre-batch — the map-constraint
  *     convention), then gating per-row candidates by id/key semi-
  *     join. Literals only (no `$params`: the gate is per statement,
  *     not per parameter row) and only that clause's own variables.
  *   - `MATCH (a)-[r:TYPE {…}]->(b)` — bind EXISTING edges (for
  *     `SET r.x`, `DELETE r`); map entries are per-row match
  *     CONSTRAINTS against the stored edge props (equality, evaluated
  *     against the pre-batch graph like created-vs-matched).
  *   - `ON CREATE SET` / `ON MATCH SET` / `SET` with comma-separated
  *     `v.prop = $p | 'lit' | num | coalesce($p, v.prop)` items — the
  *     last form is the reference's keep-old-when-param-null idiom and
  *     compiles to exactly that (a null param never erases a stored
  *     prop). `v += {map}` (all three verbs) expands to one item per
  *     entry — null params contribute nothing (the house null-never-
  *     erases convention; Neo4j's null-removes-key needs REMOVE).
  *   - `SET v:Label` (plain SET only) — add a label: the frame model
  *     keys nodes by (label, id), so the missing (Label, id) row is
  *     inserted with a snapshot of the source row's props; label rows
  *     are not property-synchronized afterwards (documented
  *     divergence from Neo4j's one-node-many-labels storage).
  *   - `REMOVE v.prop, r.prop, …` — drop properties (the row stays);
  *     `REMOVE v:Label` — drop that label's row, refusing loudly when
  *     it is an id's LAST row (this model cannot represent Neo4j's
  *     label-less node).
  *   - `DELETE r` — delete bound edges; `DELETE v` — delete bound
  *     nodes, REFUSING (like Neo4j) when incident edges remain;
  *     `DETACH DELETE v` — delete bound nodes and cascade-delete all
  *     their incident edges. Edge deletes in the same statement apply
  *     first, so `MATCH …-[r]-… DELETE r, v` works. Incident edges are
  *     matched by endpoint id (this graph's edge frames don't carry
  *     endpoint labels — same id-only convention as the upsert path).
  *   - `WITH …` — scope carry; variables stay bound here, so it parses
  *     and is ignored.
  *
  * Keyword scanning is quote-aware: a property value like
  * `{note: 'set by triage'}` does not split the statement mid-literal.
  *
  * Batch semantics: rows apply in parameter-frame ROW ORDER per key
  * (last non-null wins per prop — matching the reference's sequential
  * event application); re-running a statement is idempotent when its
  * SET values are. One deliberate divergence from row-at-a-time
  * execution: created-vs-matched is decided against the PRE-batch
  * graph, so when one batch both creates a key and "re-merges" it,
  * every row's ON CREATE entries fold into the creation and ON MATCH
  * entries of later rows do not fire (a second `merge` call applies
  * them). Map override relies on the session's
  * `spark.sql.mapKeyDedupPolicy = LAST_WIN` (GraftSession sets it; the
  * same dependency SysmonGraph documents).
  *
  * Scale shape: per node/edge variable, one groupBy over the parameter
  * batch + one outer join against the graph frame — never a per-row
  * round-trip; 10⁹-row parameter frames shuffle like any other keyed
  * upsert.
  */
object CypherWrite {

  // ---------------------------------------------------------------- AST

  private sealed trait Value
  private final case class Param(name: String) extends Value
  private final case class Lit(s: String) extends Value

  private final case class SetItem(v: String, prop: String, value: Value,
                                   keepOldOnNull: Boolean)
  private final case class NodeClause(v: String, label: String,
                                      props: Seq[(String, Value)], create: Boolean,
                                      mustCreate: Boolean = false,
                                      where: Option[String] = None)
  private final case class EdgeClause(rv: Option[String], etype: String,
                                      a: String, b: String,
                                      props: Seq[(String, Value)], create: Boolean,
                                      mustCreate: Boolean = false,
                                      where: Option[String] = None)
  private final case class RemoveItem(v: String, prop: String)
  private final case class DeleteItem(v: String, detach: Boolean)
  private final case class LabelItem(v: String, label: String)
  private final case class Stmt(nodes: Seq[NodeClause], edges: Seq[EdgeClause],
                                onCreate: Seq[SetItem], onMatch: Seq[SetItem],
                                always: Seq[SetItem], removes: Seq[RemoveItem],
                                deletes: Seq[DeleteItem],
                                labelAdds: Seq[LabelItem], labelRemoves: Seq[LabelItem])

  // ---------------------------------------------------------------- parse

  // map bodies may contain list literals and nested maps to depth 4
  // total (the regex bound — PropLiterals.canonical itself recurses
  // unbounded; deeper literals fail the clause match loudly); quote
  // alternations keep '}' / ']' inside strings from closing early
  private val InnerMap: String = {
    def lvl(n: Int): String =
      if (n == 0) """\{(?:[^{}']|'[^']*')*\}"""
      else s"""\\{(?:[^{}']|'[^']*'|${lvl(n - 1)})*\\}"""
    lvl(2)
  }
  private val ListLit = """\[(?:[^\]']|'[^']*')*\]"""
  private val MapBody = s"""(?:[^{}']|'[^']*'|$InnerMap)*"""
  private val NodePatRe =
    (s"""\\(\\s*(\\w+)\\s*:\\s*(\\w+)\\s*\\{($MapBody)\\}\\s*\\)""").r
  // mapless node pattern — legal on MATCH only (no identity to upsert
  // by); binds the LABEL SCAN, optionally narrowed by a WHERE clause
  private val NodeBareRe = """\(\s*(\w+)\s*:\s*(\w+)\s*\)""".r
  private val EdgePatRe =
    (s"""\\(\\s*(\\w+)\\s*\\)\\s*-\\s*\\[\\s*(\\w+)?\\s*:\\s*(\\w+)\\s*(\\{$MapBody\\})?\\s*\\]\\s*->\\s*\\(\\s*(\\w+)\\s*\\)""").r
  private val MapEntryRe =
    (s"""(\\w+)\\s*:\\s*(\\$$\\w+|'[^']*'|-?\\d+(?:\\.\\d+)?|$ListLit|$InnerMap)""").r
  private val SetItemRe =
    """(\w+)\.(\w+)\s*=\s*(?:coalesce\(\s*(\$\w+)\s*,\s*\1\.\2\s*\)|(\$\w+|'[^']*'|-?\d+(?:\.\d+)?))""".r

  private def parseValue(s: String): Value = s.trim match {
    case p if p.startsWith("$") => Param(p.substring(1))
    case q if q.startsWith("'") && q.endsWith("'") => Lit(q.substring(1, q.length - 1))
    case c if PropLiterals.isComposite(c) => Lit(PropLiterals.canonical(c))
    case n => Lit(n)
  }

  private def parseMap(body0: String): Seq[(String, Value)] = {
    // strip only a matched OUTER brace pair (edge maps arrive braced,
    // node bodies braceless) — a bare stripSuffix would eat a nested
    // map value's closing brace
    val t = body0.trim
    val body =
      if (t.startsWith("{") && t.endsWith("}")) t.substring(1, t.length - 1)
      else t
    val entries = MapEntryRe.findAllMatchIn(body).map { m =>
      m.group(1) -> parseValue(m.group(2))
    }.toSeq
    // reject silently-dropped garbage: rebuild minus matched text must
    // leave only separators
    val leftover = MapEntryRe.replaceAllIn(body, "").replaceAll("[\\s,]", "")
    require(leftover.isEmpty, s"bad property-map entry near: $body")
    entries
  }

  /** Character positions inside single-quoted string literals —
    * keyword matches there are property VALUES, not clause boundaries
    * (`{note: 'set by triage'}` must not split at `set`). */
  private def quotedMask(text: String): Array[Boolean] = {
    val mask = new Array[Boolean](text.length)
    var inQ = false
    var i = 0
    while (i < text.length) {
      if (text.charAt(i) == '\'') { mask(i) = true; inQ = !inQ }
      else mask(i) = inQ
      i += 1
    }
    mask
  }

  private def parseStatement(statement: String): Stmt = {
    val text = CypherLite.normalizeWs(statement)
    val inQuote = quotedMask(text)
    // OPTIONAL MATCH has no write semantics here (a missed optional row
    // would need null-tolerant SET/DELETE scoping) — loud, never a
    // silently-required MATCH
    """(?i)\bOPTIONAL\b""".r.findAllMatchIn(text)
      .filterNot(m => inQuote(m.start)).foreach { _ =>
        throw new IllegalArgumentException(
          "OPTIONAL MATCH is not supported in write statements — " +
            "write-MATCH is required-match (rows that miss drop out)")
      }
    val kw = ("""(?i)\b(MERGE|MATCH|ON CREATE SET|ON MATCH SET|SET|WITH""" +
      """|DETACH DELETE|DELETE|REMOVE|CREATE|WHERE)\b""").r
    // a WITH that is the tail of STARTS WITH / ENDS WITH (legal inside
    // a WHERE predicate) is a string operator, not a clause keyword
    def stringOpWith(m: scala.util.matching.Regex.Match): Boolean =
      m.group(1).equalsIgnoreCase("WITH") && {
        val head = text.substring(0, m.start).trim
        var j = head.length - 1
        while (j >= 0 && Character.isLetter(head.charAt(j))) j -= 1
        val tok = head.substring(j + 1)
        tok.equalsIgnoreCase("STARTS") || tok.equalsIgnoreCase("ENDS")
      }
    val ms = kw.findAllMatchIn(text)
      .filterNot(m => inQuote(m.start)).filterNot(stringOpWith).toSeq
    require(ms.nonEmpty, s"no MERGE/MATCH clause in: $statement")
    require(ms.head.start == 0, s"statement must start with a clause keyword: $statement")
    val nodes = scala.collection.mutable.Buffer.empty[NodeClause]
    val edges = scala.collection.mutable.Buffer.empty[EdgeClause]
    val onCreate = scala.collection.mutable.Buffer.empty[SetItem]
    val onMatch = scala.collection.mutable.Buffer.empty[SetItem]
    val always = scala.collection.mutable.Buffer.empty[SetItem]
    val removes = scala.collection.mutable.Buffer.empty[RemoveItem]
    val deletes = scala.collection.mutable.Buffer.empty[DeleteItem]
    val labelAdds = scala.collection.mutable.Buffer.empty[LabelItem]
    val labelRemoves = scala.collection.mutable.Buffer.empty[LabelItem]
    val bound = scala.collection.mutable.Set.empty[String]
    val PlusEqRe = (s"""(\\w+)\\s*\\+=\\s*\\{($MapBody)\\}""").r
    val LabelRe = """(\w+)\s*:\s*(\w+)""".r
    // a WHERE clause attaches to the IMMEDIATELY preceding MATCH
    // (Cypher's own placement rule); Left = nodes index, Right = edges
    var lastMatch: Option[Either[Int, Int]] = None
    ms.zipWithIndex.foreach { case (m, i) =>
      val body = text.substring(m.end,
        if (i + 1 < ms.size) ms(i + 1).start else text.length).trim
      m.group(1).toUpperCase match {
        case "MERGE" | "MATCH" | "CREATE" =>
          // CREATE upserts like MERGE but REFUSES when the key already
          // exists (probe at apply time): this model keys nodes by
          // (label, id) and edges by (type, src, dst), so Neo4j's
          // duplicate-creating CREATE cannot be represented — loud,
          // never silently a second MERGE
          val create = !m.group(1).equalsIgnoreCase("MATCH")
          val mustCreate = m.group(1).equalsIgnoreCase("CREATE")
          lastMatch = None
          body match {
            case EdgePatRe(a, rvOrNull, t, mapOrNull, b) =>
              require(bound(a) && bound(b),
                s"edge endpoints '$a'/'$b' must be bound by earlier MERGE/MATCH clauses")
              edges += EdgeClause(Option(rvOrNull), t, a, b,
                Option(mapOrNull).map(parseMap).getOrElse(Nil), create, mustCreate)
              Option(rvOrNull).foreach(bound += _)
              if (!create) lastMatch = Some(Right(edges.size - 1))
            case NodePatRe(v, label, mapBody) =>
              val props = parseMap(mapBody)
              require(props.nonEmpty,
                s"node pattern ($v:$label) needs at least an identity property")
              nodes += NodeClause(v, label, props, create, mustCreate)
              bound += v
              if (!create) lastMatch = Some(Left(nodes.size - 1))
            // mapless MATCH (v:Label): binds the label scan — the
            // triage idiom's anchor (`MATCH (p:Process) WHERE … SET …`)
            case NodeBareRe(v, label) =>
              require(!create,
                s"${m.group(1)} ($v:$label) needs a property map — an " +
                  "upsert has no identity without one; mapless patterns " +
                  "are MATCH-only")
              nodes += NodeClause(v, label, Nil, create = false)
              bound += v
              lastMatch = Some(Left(nodes.size - 1))
            case other => throw new IllegalArgumentException(
              s"unsupported ${m.group(1)} pattern: $other")
          }
        case "WHERE" =>
          // full read-grammar predicate (CONTAINS / STARTS WITH /
          // arithmetic / exists-patterns / label tests …): validated
          // here by the CypherLite WHERE parser, EVALUATED at apply
          // time by a scoped read-run against the live frames —
          // write-WHERE is read-WHERE, one grammar
          require(body.nonEmpty, "empty WHERE clause")
          require(!body.contains("$"),
            "WHERE in write statements takes literals only — the " +
              "predicate gates the GRAPH side once per statement, not " +
              "per parameter row; bind per-row values in the property map")
          var anonI = 0
          val pred = CypherLite.parseWhere(body,
            () => { anonI += 1; s"__wa$anonI" })
          val refs = pred.vars.filterNot(_.startsWith("__wa"))
          lastMatch match {
            case Some(Left(ni)) =>
              val nc = nodes(ni)
              require(nc.where.isEmpty, s"duplicate WHERE after MATCH (${nc.v})")
              require(refs.subsetOf(Set(nc.v)),
                s"WHERE after MATCH (${nc.v}) may reference only '${nc.v}' " +
                  s"(got: ${refs.mkString(", ")}) — cross-clause predicates " +
                  "need the read surface")
              nodes(ni) = nc.copy(where = Some(body))
            case Some(Right(ei)) =>
              val ec = edges(ei)
              require(ec.where.isEmpty, s"duplicate WHERE after MATCH [:${ec.etype}]")
              val allowed = Set(ec.a, ec.b) ++ ec.rv
              require(refs.subsetOf(allowed),
                s"WHERE after MATCH [:${ec.etype}] may reference only " +
                  s"${allowed.mkString("/")} (got: ${refs.mkString(", ")})")
              edges(ei) = ec.copy(where = Some(body))
            case None => throw new IllegalArgumentException(
              "WHERE must immediately follow a MATCH clause (Neo4j's own " +
                "placement rule; MERGE takes no WHERE)")
          }
        case del @ ("DELETE" | "DETACH DELETE") =>
          lastMatch = None
          body.split(",").map(_.trim).filter(_.nonEmpty).foreach { v =>
            require(v.matches("\\w+"), s"unsupported DELETE target: $v")
            require(bound(v), s"DELETE target '$v' is not bound")
            deletes += DeleteItem(v, del.startsWith("DETACH"))
          }
        case "REMOVE" =>
          lastMatch = None
          body.split(",").map(_.trim).filter(_.nonEmpty).foreach {
            case s if s.matches("""\w+\.\w+""") =>
              val Array(v, p) = s.split("\\.", 2)
              require(bound(v), s"REMOVE target '$v' is not bound")
              removes += RemoveItem(v, p)
            case LabelRe(v, l) =>
              require(bound(v), s"REMOVE target '$v' is not bound")
              labelRemoves += LabelItem(v, l)
            case other => throw new IllegalArgumentException(
              s"unsupported REMOVE item: $other (expected v.prop or v:Label)")
          }
        case setKw @ ("ON CREATE SET" | "ON MATCH SET" | "SET") =>
          lastMatch = None
          // paren/brace/quote-aware comma split: coalesce($p, v.prop)
          // and v += {a: 1, b: 2} must not break at inner commas
          val parts = {
            val out = scala.collection.mutable.Buffer.empty[String]
            val sb = new StringBuilder
            var depth = 0; var inQ = false
            body.foreach {
              case '\'' => inQ = !inQ; sb += '\''
              case c @ ('(' | '{') if !inQ => depth += 1; sb += c
              case c @ (')' | '}') if !inQ => depth -= 1; sb += c
              case ',' if depth == 0 && !inQ => out += sb.toString; sb.clear()
              case c => sb += c
            }
            out += sb.toString
            out.toSeq
          }
          val items = parts.map(_.trim).filter(_.nonEmpty).flatMap {
            case SetItemRe(v, prop, coalesceParam, valueOrNull) =>
              require(bound(v), s"SET target '$v' is not bound")
              if (coalesceParam != null)
                Seq(SetItem(v, prop, Param(coalesceParam.substring(1)), keepOldOnNull = true))
              else Seq(SetItem(v, prop, parseValue(valueOrNull), keepOldOnNull = false))
            // SET v += {map}: sugar for one SET item per entry (our maps
            // are null-free — a null param contributes no entry, so +=
            // can never erase, the documented house convention; Neo4j's
            // null-value-removes-key behavior needs REMOVE here)
            case PlusEqRe(v, mapBody) =>
              require(bound(v), s"SET target '$v' is not bound")
              parseMap(mapBody).map { case (k, value) =>
                SetItem(v, k, value, keepOldOnNull = false)
              }
            // SET v:Label — only as a plain SET verb (ON CREATE/ON
            // MATCH label mutation stays a loud error)
            case LabelRe(v, l) if setKw == "SET" =>
              require(bound(v), s"SET target '$v' is not bound")
              labelAdds += LabelItem(v, l)
              Nil
            case other => throw new IllegalArgumentException(
              s"unsupported $setKw item: $other (expected v.prop = $$p | 'lit' | num " +
                "| coalesce($p, v.prop) | v += {map}" +
                (if (setKw == "SET") " | v:Label" else "") + ")")
          }
          setKw match {
            case "ON CREATE SET" => onCreate ++= items
            case "ON MATCH SET"  => onMatch ++= items
            case _               => always ++= items
          }
        case "WITH" => lastMatch = None // scope carry — variables stay bound
      }
    }
    Stmt(nodes.toSeq, edges.toSeq, onCreate.toSeq, onMatch.toSeq, always.toSeq,
      removes.toSeq, deletes.toSeq, labelAdds.toSeq, labelRemoves.toSeq)
  }

  // ---------------------------------------------------------------- exec

  private def valueCol(v: Value): Column = v match {
    case Param(n) => col(n).cast("string")
    case Lit(s)   => lit(s)
  }

  /** Null-free string map from (key, value) pairs — a null param simply
    * contributes no entry (so it can never erase on concat). */
  private def mapOf(entries: Seq[(String, Value)]): Column =
    if (entries.isEmpty) expr("cast(map() as map<string,string>)")
    else map_filter(
      map(entries.flatMap { case (k, v) => Seq(lit(k), valueCol(v)) }: _*),
      (_, x) => x.isNotNull)

  /** Fold an ord-sorted array of struct(ord, m: map) with LAST_WIN
    * concat — batch rows apply in row order per key. */
  private def foldMaps(arr: Column): Column = {
    // comparator on ord alone — default struct ordering rejects the
    // map field
    val sorted = array_sort(arr, (l, r) =>
      when(l.getField("ord") < r.getField("ord"), -1)
        .when(l.getField("ord") > r.getField("ord"), 1)
        .otherwise(0))
    aggregate(sorted, expr("cast(map() as map<string,string>)"),
      (acc, x) => map_concat(acc, x.getField("m")))
  }

  /** `FOREACH (x IN <list> | <write clauses>)` (r13 — the events.py-
    * style list-prop loader idiom, the last write-side verb on the r12
    * missing list). Set-based execution: the list EXPLODES into the
    * parameter batch (one row per element; empty lists contribute
    * nothing — Cypher's conditional-write behavior), the body runs as
    * a normal batch statement with `x` bound as `$x`, and the clauses
    * BEFORE the FOREACH re-anchor demoted to MATCH (they upserted in
    * pass 1, so pass 2 only binds). Contract: FOREACH must be the last
    * clause; the prefix may only bind (MERGE/MATCH/CREATE/WHERE — no
    * SET verbs, which would double-apply across the two passes); the
    * list is a `$param` column (array-typed) or a literal `['a', …]`.
    * Nested FOREACH recurses naturally (the body becomes the next
    * statement's tail). */
  private def foreachSplit(statement: String): Option[(String, String, String, String)] = {
    val text = CypherLite.normalizeWs(statement)
    val inQuote = quotedMask(text)
    val m = """(?i)\bFOREACH\s*\(""".r.findAllMatchIn(text)
      .filterNot(x => inQuote(x.start)).toSeq.headOption
    m.map { hit =>
      // matching close paren of the FOREACH(
      var depth = 1; var i = hit.end
      while (i < text.length && depth > 0) {
        val c = text.charAt(i)
        if (!inQuote(i)) {
          if (c == '(') depth += 1 else if (c == ')') depth -= 1
        }
        i += 1
      }
      require(depth == 0, s"unbalanced FOREACH parentheses in: $statement")
      require(text.substring(i).trim.isEmpty,
        "FOREACH must be the statement's last clause")
      val inner = text.substring(hit.end, i - 1)
      // top-level '|' splits header from body
      var bar = -1; var d2 = 0; var j = 0
      while (j < inner.length && bar < 0) {
        val c = inner.charAt(j)
        if (!inQuote(hit.end + j)) {
          if (c == '(' || c == '[' || c == '{') d2 += 1
          else if (c == ')' || c == ']' || c == '}') d2 -= 1
          else if (c == '|' && d2 == 0) bar = j
        }
        j += 1
      }
      require(bar > 0, s"FOREACH needs 'var IN list | body': $inner")
      val header = inner.substring(0, bar).trim
      val body = inner.substring(bar + 1).trim
      val hm = """(?is)^(\w+)\s+IN\s+(.+)$""".r
      header match {
        case hm(v, listExpr) => (text.substring(0, hit.start).trim, v,
          listExpr.trim, body)
        case other => throw new IllegalArgumentException(
          s"bad FOREACH header: $other (expected 'var IN list')")
      }
    }
  }

  private def applyForeach(nodes: DataFrame, edges: DataFrame,
                           pre: String, fvar: String, listExpr: String,
                           body: String, params: DataFrame): (DataFrame, DataFrame) = {
    require(!params.columns.contains(fvar),
      s"FOREACH variable '$fvar' collides with a parameter column")
    val listCol: Column = listExpr match {
      case p if p.startsWith("$") =>
        val name = p.substring(1)
        require(params.columns.contains(name),
          s"FOREACH list parameter '$$$name' is not a parameter column")
        require(params.schema(name).dataType
            .isInstanceOf[org.apache.spark.sql.types.ArrayType],
          s"FOREACH list parameter '$$$name' must be array-typed " +
            s"(got ${params.schema(name).dataType.simpleString})")
        col(name)
      case l if l.startsWith("[") && l.endsWith("]") =>
        val elems = PropLiterals.elements(l)
        require(elems.nonEmpty, s"empty FOREACH list literal: $l")
        array(elems.map(lit): _*)
      case other => throw new IllegalArgumentException(
        s"unsupported FOREACH list: $other ($$param array column or " +
          "['literal', …] list)")
    }
    // pass-1 prefix may only BIND — a SET verb would double-apply
    val inQuote = quotedMask(pre)
    """(?i)\b(ON CREATE SET|ON MATCH SET|SET|DETACH DELETE|DELETE|REMOVE)\b""".r
      .findAllMatchIn(pre).filterNot(x => inQuote(x.start)).foreach { x =>
        throw new IllegalArgumentException(
          s"clauses before FOREACH may only bind (MERGE/MATCH/CREATE" +
            s"/WHERE) — move '${x.group(1)}' into the FOREACH body or a " +
            "separate statement")
      }
    val (n1, e1) =
      if (pre.isEmpty) (nodes, edges) else merge(nodes, edges, pre, params)
    val demoted = """(?i)\b(MERGE|CREATE)\b""".r.replaceAllIn(pre, mm =>
      if (inQuote(mm.start)) mm.group(1) else "MATCH")
    val body2 = bindFrameRefs(body, Set(fvar))
    val params2 = params.withColumn(fvar, explode(listCol))
    merge(n1, e1, s"$demoted $body2".trim, params2)
  }

  /** `CALL { <write statement> } IN TRANSACTIONS [OF n ROWS]` (r13 —
    * the remaining Neo4j batch-ETL spelling): the parameter frame
    * applies in CONTIGUOUS CHUNKS of n rows (default 1000), each chunk
    * a full [[merge]] pass over the state the previous chunks left —
    * so created-vs-matched is decided PER CHUNK, Neo4j's
    * chunk-commit semantics (the one-batch `merge` decides it against
    * the pre-batch graph once; see the class doc divergence note).
    * This surface exists for migration parity: the chunk loop is
    * driver-sequential BY DEFINITION (that is what transaction batches
    * mean), so the one-batch form stays the scale path. */
  private val InTxRe =
    """(?is)^CALL\s*\{(.+)\}\s*IN\s+TRANSACTIONS(?:\s+OF\s+(\d+)\s+ROWS)?\s*$""".r

  private def applyInTransactions(nodes: DataFrame, edges: DataFrame,
                                  inner: String, ofRows: Int,
                                  params: DataFrame): (DataFrame, DataFrame) = {
    require(ofRows >= 1, s"IN TRANSACTIONS OF $ofRows ROWS: need >= 1")
    // contiguous row ranges in frame order; the single-task window is
    // the honest cost of SERIALIZED transaction semantics (this is
    // the migration-parity surface, not the scale path)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(monotonically_increasing_id())
    val numbered = params.withColumn("__txn",
      ((row_number().over(w) - 1) / ofRows).cast("int"))
      .localCheckpoint()
    val nChunks = numbered.agg(max(col("__txn"))).collect()(0) match {
      case r if r.isNullAt(0) => 0
      case r => r.getInt(0) + 1
    }
    var state = (nodes, edges)
    (0 until nChunks).foreach { c =>
      val chunk = numbered.filter(col("__txn") === c).drop("__txn")
      val (n2, e2) = merge(state._1, state._2, inner, chunk)
      // sever per chunk: chunk k+1 must not replay chunks 1..k's plans
      state = (n2.localCheckpoint(), e2.localCheckpoint())
    }
    state
  }

  /** Apply a parsed statement over the parameter frame. Returns the
    * updated (nodes, edges). */
  def merge(nodes: DataFrame, edges: DataFrame, statement: String,
            params: DataFrame): (DataFrame, DataFrame) = {
    CypherLite.normalizeWs(statement) match {
      case InTxRe(inner, ofOrNull) =>
        return applyInTransactions(nodes, edges, inner.trim,
          Option(ofOrNull).map(_.toInt).getOrElse(1000), params)
      case _ => ()
    }
    foreachSplit(statement) match {
      case Some((pre, fvar, listExpr, body)) =>
        return applyForeach(nodes, edges, pre, fvar, listExpr, body, params)
      case None => ()
    }
    val st = parseStatement(statement)
    val pm = params.withColumn("_ord", monotonically_increasing_id())

    def setsFor(v: String, items: Seq[SetItem]): Seq[(String, Value)] =
      items.filter(_.v == v).map(it => it.prop -> it.value)

    // ---- node phase: one upsert per distinct merge/match variable ----
    var outNodes = nodes
    // per-variable per-row id expr (needed again in the edge phase);
    // mapless MATCH vars have no per-row identity and stay out
    val idExprs: Map[String, Column] = st.nodes.filter(_.props.nonEmpty).map { nc =>
      nc.v -> valueCol(nc.props.head._2)
    }.toMap
    val labels: Map[String, String] = st.nodes.map(nc => nc.v -> nc.label).toMap
    // MATCH var → the pm rows whose lookup (id + extra-prop equality
    // constraints, against the frame as of that clause) HIT — the
    // row-level gate every later clause referencing the var applies
    val matchedPm = scala.collection.mutable.Map.empty[String, DataFrame]
    // mapless MATCH var → its id-set scope (the WHERE-narrowed label
    // scan) — SET/REMOVE/DELETE over these vars apply set-wide, not
    // per parameter row
    val setScopes = scala.collection.mutable.Map.empty[String, DataFrame]
    // WHERE gate: ONE scoped read-run through the full CypherLite
    // grammar (CONTAINS / STARTS WITH / arithmetic / exists-patterns /
    // label tests) against the frames as of the clause — write-WHERE
    // IS read-WHERE, no second predicate compiler. Edges are pre-batch
    // (same convention as edge-map match constraints).
    def whereNodeIds(nc: NodeClause, curNodes: DataFrame): DataFrame =
      CypherLite.run(curNodes, edges,
          s"MATCH (${nc.v}:${nc.label}) WHERE ${nc.where.get} " +
            s"RETURN DISTINCT ${nc.v}")
        .select(col(nc.v).as("__wid"))

    st.nodes.foreach { nc =>
      if (nc.create) {
        val createEntries = nc.props ++ setsFor(nc.v, st.onCreate) ++
          setsFor(nc.v, st.always)
        val matchEntries = setsFor(nc.v, st.onMatch) ++ setsFor(nc.v, st.always)
        val cand = pm
          .select(idExprs(nc.v).as("id"), col("_ord"),
            mapOf(createEntries).as("cm"), mapOf(matchEntries).as("mm"))
          .filter(col("id").isNotNull)
          .groupBy(col("id"))
          .agg(
            foldMaps(collect_list(struct(col("_ord").as("ord"), col("cm").as("m")))).as("cm"),
            foldMaps(collect_list(struct(col("_ord").as("ord"), col("mm").as("m")))).as("mm"))
        val keyed = cand.select(col("id"), lit(nc.label).as("label"),
          col("cm"), col("mm"))
        if (nc.mustCreate) {
          val dup = keyed.select(col("id"))
            .join(outNodes.filter(col("label") === nc.label).select(col("id")),
              Seq("id"), "left_semi")
            .limit(1).collect()
          if (dup.nonEmpty) throw new IllegalArgumentException(
            s"CREATE (${nc.v}:${nc.label}): id '${dup.head.get(0)}' already " +
              "exists — this model keys nodes by (label, id) and cannot " +
              "represent duplicate nodes; use MERGE")
        }
        val updated = outNodes.join(
            keyed.select(col("id"), col("label"), col("mm")), Seq("id", "label"), "left")
          .select(col("label"), col("id"),
            when(col("mm").isNotNull, map_concat(col("props"), col("mm")))
              .otherwise(col("props")).as("props"))
        val created = keyed
          .join(outNodes.select(col("id"), col("label")), Seq("id", "label"), "left_anti")
          .select(col("label"), col("id"), col("cm").as("props"))
        outNodes = updated.unionByName(created)
      } else if (nc.props.nonEmpty) {
        // MATCH: bind existing nodes; map entries past the identity are
        // equality constraints against stored props, per parameter row;
        // a WHERE clause narrows the bindable id set first
        val extras = nc.props.tail
        val g0 = outNodes.filter(col("label") === nc.label)
          .select(col("id").as("__mid"), col("props").as("__mprops"))
        val g = nc.where.map { _ =>
          val w = whereNodeIds(nc, outNodes)
          g0.join(w, g0("__mid") === w("__wid"), "left_semi")
        }.getOrElse(g0)
        val cond = extras.foldLeft(idExprs(nc.v) === col("__mid")) {
          case (c, (k, v)) => c && col("__mprops").getItem(k) === valueCol(v)
        }
        val matched = pm.join(g, cond, "left_semi")
        matchedPm(nc.v) = matched
        val matchEntries = setsFor(nc.v, st.onMatch) ++ setsFor(nc.v, st.always)
        if (matchEntries.nonEmpty) {
          val mm = matched
            .select(idExprs(nc.v).as("id"), col("_ord"), mapOf(matchEntries).as("mm"))
            .filter(col("id").isNotNull)
            .groupBy(col("id"))
            .agg(foldMaps(collect_list(
              struct(col("_ord").as("ord"), col("mm").as("m")))).as("mm"))
            .withColumn("label", lit(nc.label))
          outNodes = outNodes.join(mm, Seq("id", "label"), "left")
            .select(col("label"), col("id"),
              when(col("mm").isNotNull, map_concat(col("props"), col("mm")))
                .otherwise(col("props")).as("props"))
        }
      } else {
        // mapless MATCH: binds the (WHERE-narrowed) LABEL SCAN as a
        // set scope — the triage idiom. Every parameter row's SET
        // applies to every scope node (for the common literal-only
        // statement the frame is one row); fold order is still batch
        // row order per id.
        val scope = nc.where.map(_ => whereNodeIds(nc, outNodes)).getOrElse(
          outNodes.filter(col("label") === nc.label)
            .select(col("id").as("__wid")).distinct())
        setScopes(nc.v) = scope
        val matchEntries = setsFor(nc.v, st.onMatch) ++ setsFor(nc.v, st.always)
        if (matchEntries.nonEmpty) {
          val mm = pm.crossJoin(scope)
            .select(col("__wid").as("id"), col("_ord"), mapOf(matchEntries).as("mm"))
            .groupBy(col("id"))
            .agg(foldMaps(collect_list(
              struct(col("_ord").as("ord"), col("mm").as("m")))).as("mm"))
            .withColumn("label", lit(nc.label))
          outNodes = outNodes.join(mm, Seq("id", "label"), "left")
            .select(col("label"), col("id"),
              when(col("mm").isNotNull, map_concat(col("props"), col("mm")))
                .otherwise(col("props")).as("props"))
        }
      }
    }

    // ---- edge phase: upsert keyed on (etype, src, dst) ----
    var outEdges = edges
    // edge var → its batch's (etype, src, dst) key frame (DELETE scope)
    val edgeKeys = scala.collection.mutable.Map.empty[String, DataFrame]
    st.edges.foreach { ec =>
      Seq(ec.a, ec.b).foreach { v =>
        require(idExprs.contains(v),
          s"edge endpoint '$v' is bound by a mapless MATCH — edge clauses " +
            "key per parameter row and need endpoints with an identity " +
            "property map")
      }
      val createEntries = ec.props ++
        ec.rv.toSeq.flatMap(v => setsFor(v, st.onCreate) ++ setsFor(v, st.always))
      val matchEntries =
        ec.rv.toSeq.flatMap(v => setsFor(v, st.onMatch) ++ setsFor(v, st.always))
      val constrained = !ec.create && ec.props.nonEmpty
      var cand0 = pm.select(Seq(
          idExprs(ec.a).as("src"), idExprs(ec.b).as("dst"), col("_ord"),
          mapOf(createEntries).as("cm"), mapOf(matchEntries).as("mm")) ++
          (if (constrained) Seq(mapOf(ec.props).as("__km")) else Nil): _*)
        .filter(col("src").isNotNull && col("dst").isNotNull)
      // MATCH-bound endpoints: rows whose node lookup missed (id or an
      // extra-prop constraint) drop out — row-level, via the _ord gate
      Seq(ec.a, ec.b).foreach { v =>
        matchedPm.get(v).foreach { matched =>
          cand0 = cand0.join(matched.select(col("_ord")), Seq("_ord"), "left_semi")
        }
      }
      // MATCH edge with a property map: the entries are per-row MATCH
      // CONSTRAINTS (Cypher semantics) — a row binds an edge only when
      // the STORED props carry every entry's value. One equi-join on
      // the edge key (unique per upsert invariant) + a higher-order
      // violation check; rows whose edge misses or violates drop out.
      if (constrained) {
        val stored = edges.filter(col("etype") === ec.etype)
          .select(col("src"), col("dst"), col("props").as("__eprops"))
        cand0 = cand0
          .join(stored, Seq("src", "dst"))
          .filter(size(map_filter(col("__km"), (k, v) =>
            coalesce(element_at(col("__eprops"), k) =!= v, lit(true)))) === 0)
          .drop("__km", "__eprops")
      }
      // WHERE on a MATCH edge clause: the qualifying (src, dst) key set
      // from one scoped read-run (full grammar — r.props, endpoint
      // props, patterns), against the pre-batch edges like the map
      // constraints above
      ec.where.foreach { w =>
        require(!ec.create, s"WHERE cannot gate a MERGE edge clause")
        val keys = CypherLite.run(outNodes, edges,
            s"MATCH (${ec.a})-[${ec.rv.getOrElse("__wr")}:${ec.etype}]->" +
              s"(${ec.b}) WHERE $w RETURN DISTINCT ${ec.a}, ${ec.b}")
          .select(col(ec.a).as("src"), col(ec.b).as("dst"))
        cand0 = cand0.join(keys, Seq("src", "dst"), "left_semi")
      }
      val cand = cand0
        .groupBy(col("src"), col("dst"))
        .agg(
          foldMaps(collect_list(struct(col("_ord").as("ord"), col("cm").as("m")))).as("cm"),
          foldMaps(collect_list(struct(col("_ord").as("ord"), col("mm").as("m")))).as("mm"))
        .select(lit(ec.etype).as("etype"), col("src"), col("dst"), col("cm"), col("mm"))
      ec.rv.foreach(v =>
        edgeKeys(v) = cand.select(col("etype"), col("src"), col("dst")))
      val updated = outEdges.join(cand.select(col("etype"), col("src"), col("dst"),
            col("mm")), Seq("etype", "src", "dst"), "left")
        .select(col("etype"), col("src"), col("dst"), col("event_id"),
          when(col("mm").isNotNull, map_concat(col("props"), col("mm")))
            .otherwise(col("props")).as("props"))
      if (ec.create) {
        if (ec.mustCreate) {
          val dup = cand.select(col("etype"), col("src"), col("dst"))
            .join(outEdges.select(col("etype"), col("src"), col("dst")),
              Seq("etype", "src", "dst"), "left_semi")
            .limit(1).collect()
          if (dup.nonEmpty) throw new IllegalArgumentException(
            s"CREATE [:${ec.etype}]: relationship (${dup.head.get(1)})-" +
              s"[:${ec.etype}]->(${dup.head.get(2)}) already exists — edges " +
              "key on (type, src, dst) and cannot duplicate; use MERGE")
        }
        val created = cand
          .join(outEdges.select(col("etype"), col("src"), col("dst")),
            Seq("etype", "src", "dst"), "left_anti")
          .select(col("etype"), col("src"), col("dst"),
            // synthetic rows carry no source event; cast to whatever
            // event_id type the target frame uses (int here, but a
            // caller's frame may differ)
            lit(0).cast(outEdges.schema("event_id").dataType).as("event_id"),
            col("cm").as("props"))
        outEdges = updated.unionByName(created)
      } else {
        // MATCH edge: update existing rows only, never create
        outEdges = updated
      }
    }

    // ---- REMOVE phase: drop properties, keep rows ----
    // scope of a node variable = the ids its clause touched this batch
    def nodeScope(v: String): DataFrame = setScopes.get(v) match {
      // mapless MATCH: the WHERE-narrowed label scan IS the scope
      case Some(scope) =>
        scope.select(col("__wid").as("id")).withColumn("label", lit(labels(v)))
      case None =>
        val ids = matchedPm.get(v) match {
          case Some(matched) => matched.select(idExprs(v).as("id"))
          case None          => pm.select(idExprs(v).as("id"))
        }
        ids.filter(col("id").isNotNull).distinct()
          .withColumn("label", lit(labels(v)))
    }
    val nodeVars = labels.keySet
    st.removes.groupBy(_.v).foreach { case (v, items) =>
      val drop = items.map(_.prop)
      if (nodeVars(v)) {
        val scope = nodeScope(v).withColumn("__rm", lit(1))
        outNodes = outNodes.join(scope, Seq("id", "label"), "left")
          .select(col("label"), col("id"),
            when(col("__rm").isNotNull,
              map_filter(col("props"), (k, _) => !k.isin(drop: _*)))
              .otherwise(col("props")).as("props"))
      } else {
        val keys = edgeKeys(v).withColumn("__rm", lit(1))
        outEdges = outEdges.join(keys, Seq("etype", "src", "dst"), "left")
          .select(col("etype"), col("src"), col("dst"), col("event_id"),
            when(col("__rm").isNotNull,
              map_filter(col("props"), (k, _) => !k.isin(drop: _*)))
              .otherwise(col("props")).as("props"))
      }
    }

    // ---- label phases: SET v:Label / REMOVE v:Label --------------
    // The frame model keys nodes by (label, id), so a multi-label node
    // materializes as one row PER LABEL sharing the id: SET v:Label
    // inserts the missing (Label, id) row with a snapshot of the
    // source row's props (existing rows keep theirs, MERGE-like);
    // REMOVE v:Label deletes that label's row. Documented divergence
    // from Neo4j's single-node-many-labels storage: label rows do not
    // stay property-synchronized after the add.
    st.labelAdds.foreach { la =>
      require(labels.contains(la.v),
        s"SET ${la.v}:${la.label}: '${la.v}' is not a node variable")
      val scope = nodeScope(la.v)
      val snap = outNodes.join(scope, Seq("id", "label"), "left_semi")
        .select(col("id"), col("props"))
        .withColumn("label", lit(la.label))
      val created = snap
        .join(outNodes.select(col("id"), col("label")), Seq("id", "label"), "left_anti")
        .select(col("label"), col("id"), col("props"))
      outNodes = outNodes.unionByName(created)
    }
    st.labelRemoves.foreach { lr =>
      require(labels.contains(lr.v),
        s"REMOVE ${lr.v}:${lr.label}: '${lr.v}' is not a node variable")
      val scope = nodeScope(lr.v).select(col("id"))
        .withColumn("label", lit(lr.label))
      // Neo4j keeps a node alive with zero labels; this model cannot
      // represent a label-less node, so removing an id's LAST label
      // row refuses loudly instead of silently deleting the node
      // (one bounded probe — scope is batch-sized)
      val affected = outNodes.join(scope, Seq("id", "label"), "left_semi")
        .select(col("id")).distinct()
      val lastOnly = outNodes.join(affected, Seq("id"), "left_semi")
        .groupBy(col("id")).agg(count(lit(1)).as("n"))
        .filter(col("n") === 1).limit(1).count()
      if (lastOnly > 0) throw new IllegalStateException(
        s"REMOVE ${lr.v}:${lr.label} would leave node(s) label-less — the frame " +
          "model keys nodes by (label, id); DELETE the node instead")
      outNodes = outNodes.join(scope, Seq("id", "label"), "left_anti")
        .select(col("label"), col("id"), col("props"))
    }

    // ---- DELETE phase: edges first so `DELETE r, v` leaves v clean ----
    st.deletes.filterNot(d => nodeVars(d.v)).foreach { d =>
      outEdges = outEdges
        .join(edgeKeys(d.v), Seq("etype", "src", "dst"), "left_anti")
        .select(col("etype"), col("src"), col("dst"), col("event_id"), col("props"))
    }
    st.deletes.filter(d => nodeVars(d.v)).foreach { d =>
      val ids = nodeScope(d.v).select(col("id"))
      if (d.detach) {
        outEdges = outEdges
          .join(ids.select(col("id").as("src")), Seq("src"), "left_anti")
          .join(ids.select(col("id").as("dst")), Seq("dst"), "left_anti")
          .select(col("etype"), col("src"), col("dst"), col("event_id"), col("props"))
      } else {
        // Neo4j refuses to delete a node that still has relationships;
        // mirroring that costs one bounded action (limit-1 probe)
        val incident = outEdges
          .join(ids.select(col("id").as("src")), Seq("src"), "left_semi")
          .select(col("src").as("id"))
          .unionByName(outEdges
            .join(ids.select(col("id").as("dst")), Seq("dst"), "left_semi")
            .select(col("dst").as("id")))
          .limit(1).count()
        if (incident > 0) throw new IllegalStateException(
          s"cannot DELETE node '${d.v}': incident relationships remain " +
            "(use DETACH DELETE)")
      }
      outNodes = outNodes.join(nodeScope(d.v), Seq("id", "label"), "left_anti")
        .select(col("label"), col("id"), col("props"))
    }
    (outNodes, outEdges)
  }

  // ------------------------------------------------- read→write tail

  /** Rewrite bare word references to read-frame columns into `$col`
    * params (quote-aware; skips map-KEY/label positions — a word
    * followed by ':' — and qualified tails `v.word`). The write
    * grammar then binds them from the frame like any parameter. */
  private def bindFrameRefs(text: String, cols: Set[String]): String = {
    val sb = new StringBuilder
    var i = 0; var inQ = false
    while (i < text.length) {
      val c = text.charAt(i)
      if (inQ) { sb += c; if (c == '\'') inQ = false; i += 1 }
      else if (c == '\'') { sb += c; inQ = true; i += 1 }
      else if (Character.isJavaIdentifierStart(c) &&
          (i == 0 || (!Character.isJavaIdentifierPart(text.charAt(i - 1)) &&
            text.charAt(i - 1) != '$' && text.charAt(i - 1) != '.'))) {
        var j = i
        while (j < text.length && Character.isJavaIdentifierPart(text.charAt(j))) j += 1
        val word = text.substring(i, j)
        var k = j
        while (k < text.length && text.charAt(k) == ' ') k += 1
        val keyPos = k < text.length && text.charAt(k) == ':'
        // label/type position (r13, advice): a word PRECEDED by ':'
        // is a node label or relationship type (`(v:User {...})`,
        // `-[r:TYPE]->`) and must stay literal even when a read
        // column shares the name — EXCEPT when that ':' belongs to a
        // map entry (`{uid: uid}`), where the word is a VALUE and the
        // rewrite is the whole point. Discriminate by what precedes
        // the word BEFORE the ':': a map key follows '{' or ',',
        // a label's variable follows '(' / '[' / an expression.
        var b = i - 1
        while (b >= 0 && text.charAt(b) == ' ') b -= 1
        val labelPos = b >= 0 && text.charAt(b) == ':' && {
          var k2 = b - 1 // back over the key/variable word
          while (k2 >= 0 && Character.isJavaIdentifierPart(text.charAt(k2))) k2 -= 1
          while (k2 >= 0 && text.charAt(k2) == ' ') k2 -= 1
          !(k2 >= 0 && (text.charAt(k2) == '{' || text.charAt(k2) == ','))
        }
        if (cols(word) && !keyPos && !labelPos) sb.append('$').append(word)
        else sb.append(word)
        i = j
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  /** READ→WRITE COMPOSITION (r12) — one statement that enriches
    * through the read pipeline and writes the result back, Neo4j's
    * enrich-then-tag idiom:
    *
    * {{{
    * MATCH (u:User)-[:DID]->(t:EType)
    * WITH u AS uid, count(*) AS n
    * MATCH (v:User {uid: uid}) SET v.breadth = n
    * }}}
    *
    * Contract: the statement splits at the LAST top-level `WITH`
    * before the FIRST write keyword (MERGE/CREATE/SET/DELETE/DETACH
    * DELETE/REMOVE); the write tail starts at the first MATCH after
    * that WITH (re-anchoring carried ids), or at the write keyword.
    * Everything before runs through [[CypherLite]] with the boundary
    * `WITH` rewritten to `RETURN` — the full read grammar (multi-hop
    * patterns, aggregation, WHERE, subqueries) — and the resulting
    * frame becomes the write tail's PARAMETER BATCH, one write
    * application per row (exactly how `$param` frames drive
    * [[merge]]). In the write tail, bare references to carried
    * columns read as `$col` params; node variables do NOT carry
    * across (a returned node is its id string — re-anchor with
    * `MATCH/MERGE (v:Label {key: col})`). A trailing RETURN is not
    * supported (the updated frames are the result). Returns the
    * updated (nodes, edges). */
  /** Quote/nesting-aware scan for top-level keyword positions. */
  private def topLevelHits(text: String, kws: Seq[String]): Seq[(Int, String)] = {
    val out = scala.collection.mutable.Buffer.empty[(Int, String)]
    var i = 0; var dp = 0; var inQ = false
    while (i < text.length) {
      val c = text.charAt(i)
      if (inQ) { if (c == '\'') inQ = false }
      else c match {
        case '\'' => inQ = true
        case '(' | '[' | '{' => dp += 1
        case ')' | ']' | '}' => dp -= 1
        case _ =>
          if (dp == 0 &&
              (i == 0 || !Character.isLetterOrDigit(text.charAt(i - 1)))) {
            kws.find(k =>
              text.regionMatches(true, i, k, 0, k.length) &&
                (i + k.length >= text.length ||
                  !Character.isLetterOrDigit(text.charAt(i + k.length))))
              .foreach(k => out += ((i, k)))
          }
      }
      i += 1
    }
    out.toSeq
  }

  private val writeKws = Seq("DETACH DELETE", "MERGE", "CREATE", "SET",
    "DELETE", "REMOVE")

  /** A WITH at position p that tails STARTS WITH / ENDS WITH is a
    * string operator, not a clause boundary. */
  private def stringOpAt(text: String, p: Int): Boolean = {
    val head = text.substring(0, p).trim
    var j = head.length - 1
    while (j >= 0 && Character.isLetter(head.charAt(j))) j -= 1
    val tok = head.substring(j + 1)
    tok.equalsIgnoreCase("STARTS") || tok.equalsIgnoreCase("ENDS")
  }

  /** True when the statement is the [[runComposed]] shape — a
    * top-level WITH boundary (not a STARTS/ENDS WITH operator) before
    * the first write keyword. Lets callers (GraphStore.update)
    * dispatch between [[merge]] and [[runComposed]] without
    * duplicating the scan. */
  def isComposed(statement: String): Boolean = {
    val text = CypherLite.normalizeWs(statement).trim
    val wHits = topLevelHits(text, writeKws)
    wHits.nonEmpty && topLevelHits(text, Seq("WITH"))
      .filter(_._1 < wHits.head._1)
      .exists { case (p, _) => !stringOpAt(text, p) }
  }

  def runComposed(nodes: DataFrame, edges: DataFrame,
                  cypher: String): (DataFrame, DataFrame) = {
    val text = CypherLite.normalizeWs(cypher).trim
    def topLevelHits(kws: Seq[String]): Seq[(Int, String)] =
      CypherWrite.topLevelHits(text, kws)
    val wHits = topLevelHits(writeKws)
    require(wHits.nonEmpty,
      "runComposed needs a write tail (MERGE/CREATE/SET/DELETE/REMOVE) — " +
        "use CypherLite.run for pure reads")
    val wStart = wHits.head._1
    val withHits = topLevelHits(Seq("WITH")).filter(_._1 < wStart)
      .filterNot { case (p, _) => stringOpAt(text, p) }
    require(withHits.nonEmpty,
      "runComposed needs a WITH boundary before the write tail " +
        "(MATCH … WITH cols MERGE/SET/… ) — a write statement without " +
        "a read stage is CypherWrite.merge's surface")
    val (withStart, _) = withHits.last
    // the write tail starts at the first anchor clause after the
    // boundary WITH: a MATCH (re-anchoring carried ids — the enrich-
    // then-tag idiom `WITH uid, n MATCH (u:User {uid: uid}) SET …`)
    // or, with no MATCH between, the write keyword itself
    val tailStart = topLevelHits(Seq("MATCH"))
      .collectFirst { case (p, _) if p > withStart && p < wStart => p }
      .getOrElse(wStart)
    val items = text.substring(withStart + 4, tailStart).trim
    require(items.nonEmpty, "empty WITH item list before the write tail")
    // the boundary WITH must carry ONLY its item list — a clause
    // keyword here means the write tail did not directly follow it
    val ClauseKw = """(?i)\b(UNWIND|WHERE|ORDER BY|CALL|UNION|RETURN|SKIP|LIMIT)\b""".r
    ClauseKw.findFirstIn(items).foreach { k =>
      throw new IllegalArgumentException(
        s"the write tail must start right after the boundary WITH's item " +
          s"list (found $k) — stage the read with an extra " +
          "`WITH cols` projection before the write clauses")
    }
    val readText = text.substring(0, withStart) + " RETURN " + items
    val frame = CypherLite.run(nodes, edges, readText)
    val writeText = bindFrameRefs(text.substring(tailStart), frame.columns.toSet)
    merge(nodes, edges, writeText, frame)
  }

  /** One-shot form: a literal statement, or one `$param` binding set. */
  def mergeOne(nodes: DataFrame, edges: DataFrame, statement: String,
               params: Map[String, String] = Map.empty): (DataFrame, DataFrame) = {
    val spark = nodes.sparkSession
    val row = org.apache.spark.sql.Row.fromSeq(params.values.toSeq)
    val schema = org.apache.spark.sql.types.StructType(params.keys.toSeq.map(k =>
      org.apache.spark.sql.types.StructField(k, org.apache.spark.sql.types.StringType)))
    val p = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(row), 1), schema)
    merge(nodes, edges, statement,
      if (params.isEmpty) spark.range(1).toDF("_dummy") else p)
  }

  /** Empty graph frames with the engine's node/edge schemas — the
    * starting point for a pure-Cypher-built graph. */
  def emptyGraph(spark: SparkSession): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.types._
    val n = spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("label", StringType), StructField("id", StringType),
        StructField("props", MapType(StringType, StringType)))))
    val e = spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("etype", StringType), StructField("src", StringType),
        StructField("dst", StringType), StructField("event_id", IntegerType),
        StructField("props", MapType(StringType, StringType)))))
    (n, e)
  }
}
