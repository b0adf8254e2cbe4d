package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A small Cypher front-end over the (nodes, edges) property-graph
  * frames — the textual query surface a user of the reference's Neo4j
  * deployment already writes, compiled to DataFrame joins (so Catalyst
  * plans/broadcasts/prunes it like any other query).
  *
  * Supported subset (the patterns the reference's analysts actually
  * run — see events.py's schema):
  *
  * {{{
  * MATCH (p:Process)-[:CREATED_FILE]->(f:File)
  * WHERE f.id CONTAINS '.exe' AND p.image ENDS WITH 'cmd.exe'
  * RETURN DISTINCT p, f.id LIMIT 10
  * }}}
  *
  *  - linear patterns of any length, forward `-[:T]->` and reverse
  *    `<-[:T]-` hops, variable-length `-[:T*1..3]->`
  *  - node labels optional; `v.id` is the node key, any other
  *    `v.prop` reads the property map
  *  - WHERE: `=`, `<>`, `CONTAINS`, `STARTS WITH`, `ENDS WITH`
  *    over string literals, AND-combined
  *  - RETURN [DISTINCT] var | var.prop, ...; optional LIMIT n
  *  - aggregation: `RETURN v, count(*)` groups by the non-aggregate
  *    items (Cypher's implicit grouping rule)
  *
  * Each single hop is one equi-join on the edge frame; a
  * variable-length hop materializes the bounded (from, to) hop-pair
  * set via iterated joins (distinct per depth) — the same shapes the
  * hand-written operators use, so the 100 TB story is unchanged.
  */
object CypherLite {

  final case class NodePat(v: String, label: Option[String])
  final case class EdgePat(etype: Option[String], min: Int, max: Int, reverse: Boolean,
                           v: Option[String] = None)
  final case class Cond(v: String, prop: String, op: String, value: String)
  final case class Query(nodes: Seq[NodePat], hops: Seq[EdgePat],
                         optNodes: Seq[NodePat], optHops: Seq[EdgePat],
                         where: Seq[Cond],
                         ret: Seq[(String, Option[String])], distinct: Boolean,
                         orderBy: Seq[(String, Boolean)], limit: Option[Int])

  private val NodeRe = """\(\s*(\w+)\s*(?::\s*(\w+))?\s*\)""".r
  private val FwdRe = """-\[\s*(\w+)?\s*(?::(\w+))?\s*(?:\*(\d+)\.\.(\d+))?\s*\]->""".r
  private val RevRe = """<-\[\s*(\w+)?\s*(?::(\w+))?\s*(?:\*(\d+)\.\.(\d+))?\s*\]-""".r
  private val CondRe =
    """(\w+)\.(\w+)\s*(=|<>|CONTAINS|STARTS WITH|ENDS WITH)\s*'([^']*)'""".r

  def parse(q: String): Query = {
    val text = q.trim.replaceAll("\\s+", " ")
    val mMatch = """(?i)MATCH (.+?)(?: OPTIONAL MATCH (.+?))?(?: WHERE (.+?))? RETURN (DISTINCT )?(.+?)(?: ORDER BY (.+?))?(?: LIMIT (\d+))?\s*$""".r
    def parsePattern(pattern: String): (Seq[NodePat], Seq[EdgePat]) = {
      val nodes = NodeRe.findAllMatchIn(pattern).map(m =>
        NodePat(m.group(1), Option(m.group(2)))).toSeq
      // hops in textual order: scan the pattern for edge tokens
      val hops = ("""-\[[^\]]*\]->|<-\[[^\]]*\]-""".r)
        .findAllIn(pattern).map {
          case FwdRe(ev, t, lo, hi) =>
            EdgePat(Option(t), Option(lo).map(_.toInt).getOrElse(1),
              Option(hi).map(_.toInt).getOrElse(1), reverse = false, Option(ev))
          case RevRe(ev, t, lo, hi) =>
            EdgePat(Option(t), Option(lo).map(_.toInt).getOrElse(1),
              Option(hi).map(_.toInt).getOrElse(1), reverse = true, Option(ev))
          case other => throw new IllegalArgumentException(s"bad edge pattern: $other")
        }.toSeq
      hops.filter(h => h.v.isDefined && (h.min != 1 || h.max != 1)).foreach { h =>
        throw new IllegalArgumentException(
          s"edge variable '${h.v.get}' not supported on variable-length hops")
      }
      require(nodes.nonEmpty && nodes.size == hops.size + 1,
        s"pattern must be a linear node chain: ${nodes.size} nodes, ${hops.size} hops")
      (nodes, hops)
    }
    text match {
      case mMatch(pattern, optOrNull, whereOrNull, distinctOrNull, retPart, orderOrNull, limitOrNull) =>
        val (nodes, hops) = parsePattern(pattern)
        val (optNodes, optHops) = Option(optOrNull) match {
          case Some(op) =>
            val (on, oh) = parsePattern(op)
            require(nodes.exists(_.v == on.head.v),
              s"OPTIONAL MATCH must start at a bound variable, got '${on.head.v}'")
            (on, oh)
          case None => (Seq.empty[NodePat], Seq.empty[EdgePat])
        }
        val where = Option(whereOrNull).toSeq.flatMap(_.split("(?i) AND ").toSeq).map {
          case CondRe(v, p, op, value) => Cond(v, p, op.toUpperCase, value)
          case other => throw new IllegalArgumentException(s"bad condition: $other")
        }
        val ret = retPart.split(",").toSeq.map(_.trim).map {
          case c if c.equalsIgnoreCase("count(*)") => ("count(*)", None)
          case r => r.split("\\.") match {
            case Array(v) => (v, None)
            case Array(v, p) => (v, Some(p))
            case _ => throw new IllegalArgumentException(s"bad return item: $r")
          }
        }
        val orderBy = Option(orderOrNull).toSeq.flatMap(_.split(",").toSeq).map { o =>
          val parts = o.trim.split("\\s+")
          val desc = parts.length > 1 && parts(1).equalsIgnoreCase("DESC")
          val cn = if (parts(0).equalsIgnoreCase("count(*)")) "count"
                   else parts(0).replace(".", "_")
          (cn, desc)
        }
        Query(nodes, hops, optNodes, optHops, where, ret, distinctOrNull != null, orderBy,
          Option(limitOrNull).map(_.toInt))
      case _ => throw new IllegalArgumentException(s"unsupported query: $q")
    }
  }

  /** Bounded (from, to) pair set for a hop; a named single hop also
    * carries the edge's property map and event_id for WHERE/RETURN. */
  private def hopPairs(edges: DataFrame, h: EdgePat): DataFrame = {
    val e0 = h.etype.map(t => edges.filter(col("etype") === t)).getOrElse(edges)
    h.v match {
      case Some(ev) =>
        // merged edges are unique per (etype, src, dst) — no distinct
        return if (h.reverse)
          e0.select(col("dst").as("_from"), col("src").as("_to"),
            col("props").as(s"${ev}__props"), col("event_id").as(s"${ev}__event_id"))
        else
          e0.select(col("src").as("_from"), col("dst").as("_to"),
            col("props").as(s"${ev}__props"), col("event_id").as(s"${ev}__event_id"))
      case None => ()
    }
    val e = (if (h.reverse) e0.select(col("dst").as("_from"), col("src").as("_to"))
             else e0.select(col("src").as("_from"), col("dst").as("_to")))
      .distinct()
    if (h.min == 1 && h.max == 1) e
    else {
      require(h.min >= 1 && h.max >= h.min && h.max <= 10,
        s"variable-length bounds out of range: *${h.min}..${h.max}")
      val base = e.persist()
      var cur = base
      var acc: DataFrame = if (h.min <= 1) base else null
      for (k <- 2 to h.max) {
        cur = cur.join(base.select(col("_from").as("_mid"), col("_to").as("_nxt")),
            cur("_to") === col("_mid"))
          .select(col("_from"), col("_nxt").as("_to"))
          .distinct()
          .localCheckpoint()
        if (k >= h.min) acc = if (acc == null) cur else acc.unionByName(cur).distinct()
      }
      base.unpersist()
      acc
    }
  }

  /** Compile + run a query against (nodes, edges) frames from
    * [[SysmonGraph.build]]. Returned columns are the RETURN items:
    * bare vars yield the node id (column named after the var),
    * `v.prop` yields column `v_prop`. */
  def run(nodes: DataFrame, edges: DataFrame, cypher: String): DataFrame = {
    val q = parse(cypher)

    def labelIds(label: String): DataFrame =
      nodes.filter(col("label") === label).select(col("id"))

    // seed bindings with the first node variable
    val first = q.nodes.head
    var bound = first.label match {
      case Some(l) => labelIds(l).select(col("id").as(first.v))
      case None => nodes.select(col("id").as(first.v)).distinct()
    }
    // walk a chain: one join per hop, label semi-joins as we bind
    def walk(seed: DataFrame, pats: Seq[NodePat], hops: Seq[EdgePat]): DataFrame = {
      var b = seed
      hops.zipWithIndex.foreach { case (h, i) =>
        val from = pats(i).v
        val to = pats(i + 1).v
        val pairs = hopPairs(edges, h)
        b = b.join(pairs, b(from) === pairs("_from"))
          .drop("_from").withColumnRenamed("_to", to)
        pats(i + 1).label.foreach { l =>
          b = b.join(labelIds(l).select(col("id").as(to)), Seq(to), "left_semi")
        }
      }
      b
    }
    bound = walk(bound, q.nodes, q.hops)
    // OPTIONAL MATCH: walk its chain from the shared variable's bound
    // values, then left-join — non-matching rows keep nulls for the
    // optional variables (WHERE applies to the joined rows, SQL-style)
    if (q.optHops.nonEmpty) {
      val shared = q.optNodes.head.v
      val optSeed = bound.select(col(shared)).distinct()
      val opt = walk(optSeed, q.optNodes, q.optHops)
      bound = bound.join(opt, Seq(shared), "left")
    }
    // WHERE: property access — edge vars read the carried props map,
    // node vars join the nodes frame
    def propCol(v: String, prop: String): (DataFrame, String) = {
      val cn = s"${v}_$prop"
      if (bound.columns.contains(cn)) (bound, cn)
      else if (bound.columns.contains(s"${v}__props")) {
        val c = if (prop == "event_id") col(s"${v}__event_id").cast("string")
                else element_at(col(s"${v}__props"), prop)
        (bound.withColumn(cn, c), cn)
      } else if (prop == "id") (bound, v)
      else {
        val pn = nodes.select(col("id").as(v), element_at(col("props"), prop).as(cn))
        (bound.join(pn, Seq(v), "left"), cn)
      }
    }
    q.where.foreach { c =>
      val (df, cn) = propCol(c.v, c.prop)
      bound = df
      val lhs = col(cn)
      val pred: Column = c.op match {
        case "=" => lhs === c.value
        case "<>" => lhs =!= c.value
        case "CONTAINS" => lhs.contains(c.value)
        case "STARTS WITH" => lhs.startsWith(c.value)
        case "ENDS WITH" => lhs.endsWith(c.value)
      }
      bound = bound.filter(pred)
    }
    // RETURN — with Cypher's implicit grouping when count(*) appears
    val (aggItems, plainItems) = q.ret.partition(_._1 == "count(*)")
    val outCols = plainItems.map {
      case (v, None) => col(v)
      case (v, Some(p)) =>
        val cn = s"${v}_$p"
        if (!bound.columns.contains(cn)) {
          val (df, _) = propCol(v, p)
          bound = df
        }
        col(cn)
    }
    var out =
      if (aggItems.nonEmpty) {
        require(plainItems.nonEmpty, "count(*) needs at least one grouping item")
        bound.groupBy(outCols: _*).agg(count(lit(1)).as("count"))
      } else bound.select(outCols: _*)
    if (q.distinct && aggItems.isEmpty) out = out.distinct()
    if (q.orderBy.nonEmpty)
      out = out.orderBy(q.orderBy.map { case (c, desc) =>
        if (desc) col(c).desc else col(c).asc }: _*)
    q.limit.foreach(n => out = out.limit(n))
    out
  }
}
