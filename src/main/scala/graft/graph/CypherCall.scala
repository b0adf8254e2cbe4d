package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** J7 — GDS-style procedure surface: `CALL graft.<proc>({config})
  * YIELD … [WHERE …] [RETURN …] [ORDER BY …] [SKIP n] [LIMIT n]`.
  *
  * Ties the B-suite analytics into the textual query language the way
  * Neo4j's GDS catalog does (`CALL gds.pageRank.stream(...) YIELD
  * nodeId, score`): a user of the reference graph
  * (reference events.py builds it, queries run against Neo4j where the
  * GDS catalog lives) calls algorithms by name with a config map and
  * pipelines the yielded rows. Differences from GDS, documented here
  * rather than silently diverging:
  *
  *   - the graph is BOUND at run() (the (nodes, edges) frames), so
  *     there is no named-graph first argument and no catalog
  *     project/drop lifecycle — config keys `relationshipType` /
  *     `nodeLabel` / `orientation` give the per-call subgraph
  *     selection that GDS does at projection time;
  *   - only stream mode exists (rows out — mutate/write modes are the
  *     CypherWrite surface's job); a trailing `.stream` on the
  *     procedure name is accepted and ignored;
  *   - yields use this engine's id-typed node keys (`id`), not Neo4j's
  *     internal numeric nodeIds.
  *
  * The tail after YIELD reuses CypherLite's own term/predicate/
  * projection machinery over the flat yielded frame (bare identifiers
  * resolve as columns), so WHERE/RETURN support the full expression
  * grammar — arithmetic, CASE, coalesce, aggregates in RETURN, etc.
  *
  * Everything compiles to the same scale-shaped DataFrame plans the
  * direct Scala API produces (CALL is a parser, not an engine): the
  * procedure registry dispatches to [[GraphOps]]/[[FastRP]] verbatim.
  * Unknown procedures, unknown config keys, and YIELD columns not in
  * the procedure's schema all fail loudly — a typo must never silently
  * run a default.
  */
object CypherCall {
  import CypherLite.{parseRetItem, parseOrder, parseWhere, splitTopLevel, Compiler}

  /** Quote-aware CALL detector (the dispatch hook for
    * [[CypherLite.run]]). */
  def isCall(cypher: String): Boolean =
    cypher.trim.toUpperCase.startsWith("CALL ")

  // ---------------------------------------------------------------- config

  /** One procedure: canonical yield schema (ordered), allowed config
    * keys, and the dispatch into the Scala API. */
  private final case class Proc(yields: Seq[String], keys: Set[String],
                                run: (DataFrame, DataFrame, Cfg) => DataFrame)

  /** Parsed config map with typed, loud accessors. */
  private final class Cfg(val name: String, m: Map[String, Any]) {
    def int(k: String, dflt: Int): Int = m.get(k) match {
      case None => dflt
      case Some(v: Long) => v.toInt
      case Some(v) => fail(k, v, "an integer")
    }
    def dbl(k: String, dflt: Double): Double = m.get(k) match {
      case None => dflt
      case Some(v: Double) => v
      case Some(v: Long) => v.toDouble
      case Some(v) => fail(k, v, "a number")
    }
    def bool(k: String, dflt: Boolean): Boolean = m.get(k) match {
      case None => dflt
      case Some(v: Boolean) => v
      case Some(v) => fail(k, v, "true/false")
    }
    def str(k: String): Option[String] = m.get(k).map {
      case s: String => s
      case v => fail(k, v, "a string")
    }
    /** String list; a single scalar is accepted as a 1-list (GDS
      * accepts both spellings for relationshipTypes/sourceNodes). */
    def strs(k: String): Option[Seq[String]] = m.get(k).map {
      case s: String => Seq(s)
      case l: Seq[_] => l.map {
        case s: String => s
        case n: Long => n.toString
        case v => fail(k, v, "a list of strings")
      }
      case v => fail(k, v, "a list of strings")
    }
    /** Double list (e.g. iterationWeights: [0.0, 1.0, 1.0]). */
    def dbls(k: String): Option[Seq[Double]] = m.get(k).map {
      case l: Seq[_] => l.map {
        case d: Double => d
        case n: Long => n.toDouble
        case v => fail(k, v, "a list of numbers")
      }
      case v => fail(k, v, "a list of numbers")
    }
    def has(k: String): Boolean = m.contains(k)
    /** True iff the raw value was spelled as a list — the spelling
      * that forces node-ID semantics in [[nodeFilterFrame]] (r14). */
    def isList(k: String): Boolean = m.get(k).exists(_.isInstanceOf[Seq[_]])
    private def fail(k: String, v: Any, want: String): Nothing =
      throw new IllegalArgumentException(
        s"$name: config key '$k' must be $want, got $v")
  }

  /** Parse `{key: value, …}` to a typed map. Values: 'string', number
    * (Long when integral), true/false, or a flat list of those.
    * Quote-aware: a comma or brace inside a string literal doesn't
    * split. `$params` don't reach here — [[CypherLite.run]]'s
    * parameter substitution happens on the raw text first. */
  private def parseConfig(s0: String): Map[String, Any] = {
    val s = s0.trim
    require(s.startsWith("{") && s.endsWith("}"), s"bad config map: $s0")
    val body = s.substring(1, s.length - 1).trim
    if (body.isEmpty) return Map.empty
    // split on top-level commas (outside quotes and [ ] lists)
    val parts = scala.collection.mutable.ListBuffer.empty[String]
    var depth = 0; var inStr = false; var start = 0
    for (i <- body.indices) body.charAt(i) match {
      case '\'' => inStr = !inStr
      case '[' | '{' if !inStr => depth += 1
      case ']' | '}' if !inStr => depth -= 1
      case ',' if !inStr && depth == 0 =>
        parts += body.substring(start, i); start = i + 1
      case _ =>
    }
    parts += body.substring(start)
    val entry = """(?s)\s*(\w+)\s*:\s*(.+?)\s*""".r
    parts.map {
      case entry(k, v) => k -> parseValue(k, v)
      case other => throw new IllegalArgumentException(s"bad config entry: $other")
    }.toMap
  }

  private def parseValue(k: String, v: String): Any = v match {
    case s if s.startsWith("'") && s.endsWith("'") && s.length >= 2 =>
      s.substring(1, s.length - 1)
    case s if s.startsWith("[") && s.endsWith("]") =>
      val inner = s.substring(1, s.length - 1).trim
      if (inner.isEmpty) Seq.empty[Any]
      else {
        // elements are scalars — quote-aware comma split
        val out = scala.collection.mutable.ListBuffer.empty[String]
        var inStr = false; var start = 0
        for (i <- inner.indices) inner.charAt(i) match {
          case '\'' => inStr = !inStr
          case ',' if !inStr => out += inner.substring(start, i); start = i + 1
          case _ =>
        }
        out += inner.substring(start)
        out.toSeq.map(e => parseValue(k, e.trim))
      }
    case "true" => true
    case "false" => false
    case s if s.matches("-?\\d+") => s.toLong
    case s if s.matches("-?\\d+\\.\\d+(?:[eE]-?\\d+)?|-?\\d+[eE]-?\\d+") => s.toDouble
    case other => throw new IllegalArgumentException(
      s"config key '$k': unsupported value $other (string/number/boolean/flat list)")
  }

  // ------------------------------------------------------- graph selection

  /** Config keys every procedure accepts (the GDS projection-time
    * selections, applied per-call since the graph binds at run()). */
  private val CommonKeys = Set("relationshipType", "relationshipTypes",
    "nodeLabel", "orientation")

  /** Type/label SELECTION only, every column kept: relationship-type
    * filter (needs an `etype` column) and node-label endpoint
    * restriction (two semi-joins against the labeled node set — stays
    * an equi-join shape at any scale). Weight resolution probes must
    * run on THIS projected set (GDS only requires the property on
    * projected relationships), so selection is split from
    * [[orientEdges]]' projection. */
  private def filterEdges(nodes: DataFrame, edges: DataFrame, cfg: Cfg): DataFrame = {
    var e = edges
    cfg.strs("relationshipTypes").orElse(cfg.strs("relationshipType")).foreach { ts =>
      require(e.columns.contains("etype"),
        s"${cfg.name}: relationshipType needs an 'etype' column on the edge frame")
      e = e.filter(col("etype").isin(ts: _*))
    }
    cfg.str("nodeLabel").foreach { l =>
      val keep = nodes.filter(col("label") === l).select(col("id"))
      e = e.join(keep.select(col("id").as("src")), Seq("src"), "left_semi")
        .join(keep.select(col("id").as("dst")), Seq("dst"), "left_semi")
    }
    e
  }

  /** Orientation + (src, dst[, w]) projection over an already-selected
    * edge frame. */
  private def orientEdges(e: DataFrame, cfg: Cfg): DataFrame = {
    val base = e.select(Seq(col("src"), col("dst")) ++
      (if (e.columns.contains("w")) Seq(col("w")) else Nil): _*)
    cfg.str("orientation").getOrElse("NATURAL").toUpperCase match {
      case "NATURAL" => base
      case "REVERSE" => base.withColumnRenamed("src", "__t")
        .withColumnRenamed("dst", "src").withColumnRenamed("__t", "dst")
      case "UNDIRECTED" if base.columns.contains("w") =>
        // weight-preserving symmetrization (undirected() is src/dst-only)
        base.unionByName(base.select(col("dst").as("src"),
          col("src").as("dst"), col("w"))).distinct()
      case "UNDIRECTED" => GraphOps.undirected(base.select(col("src"), col("dst")))
      case other => throw new IllegalArgumentException(
        s"${cfg.name}: orientation must be NATURAL, REVERSE or UNDIRECTED, got '$other'")
    }
  }

  private def selectEdges(nodes: DataFrame, edges: DataFrame, cfg: Cfg): DataFrame =
    orientEdges(filterEdges(nodes, edges, cfg), cfg)

  /** GDS `relationshipWeightProperty`: resolve a weight column onto
    * the edge frame — an existing column of that name wins, else a
    * props-map entry. Returns the augmented frame + the weightCol to
    * pass through ("w"). */
  private def resolveWeightProp(ed: DataFrame, cfg: Cfg): (DataFrame, Option[String]) =
    cfg.str("relationshipWeightProperty") match {
      case None => (ed, None)
      case Some(p) if ed.columns.contains(p) =>
        val withW = ed.withColumn("w", col(p).cast("double"))
        // same loud null probe as the props-map branch: a null (or a
        // non-numeric value nulled by the cast) in an EXISTING weight
        // column would otherwise silently drop that edge's contribution
        require(withW.filter(col("w").isNull).limit(1).count() == 0,
          s"${cfg.name}: relationshipWeightProperty '$p' is null or " +
            "non-numeric on at least one edge")
        (withW, Some("w"))
      case Some(p) =>
        require(ed.columns.contains("props"),
          s"${cfg.name}: relationshipWeightProperty '$p' needs a matching edge " +
            "column or a 'props' column on the edge frame")
        val withW = ed.withColumn("w", element_at(col("props"), p).cast("double"))
        // loud, not silent: a missing/non-numeric weight must never
        // quietly drop edges or zero the graph (one limit-1 probe)
        require(withW.filter(col("w").isNull).limit(1).count() == 0,
          s"${cfg.name}: relationshipWeightProperty '$p' is missing or " +
            "non-numeric on at least one edge")
        (withW, Some("w"))
    }

  /** GDS `nodeWeightProperty` (r14): resolve a per-node weight from
    * the NODES frame — an existing column of that name wins, else a
    * props-map entry — as an (id, nw) frame for
    * [[GraphOps.labelPropagation]]. Loud on null/non-numeric (the
    * [[resolveWeightProp]] probe, same rationale). */
  private def resolveNodeWeightProp(n: DataFrame, cfg: Cfg): Option[DataFrame] =
    cfg.str("nodeWeightProperty").map { p =>
      val withW =
        if (n.columns.contains(p)) n.withColumn("nw", col(p).cast("double"))
        else {
          require(n.columns.contains("props"),
            s"${cfg.name}: nodeWeightProperty '$p' needs a matching node " +
              "column or a 'props' column on the node frame")
          n.withColumn("nw", element_at(col("props"), p).cast("double"))
        }
      require(withW.filter(col("nw").isNull).limit(1).count() == 0,
        s"${cfg.name}: nodeWeightProperty '$p' is missing or non-numeric " +
          "on at least one node")
      withW.select(col("id"), col("nw"))
    }

  /** `sourceNodes` as a seeds frame, CAST to the edge frame's id type
    * (config values arrive as strings; a Long-id graph needs Long
    * seeds or the local finishers' exact-equality lookups miss and
    * the result schema mixes types). */
  private def seedFrame(edges: DataFrame, ids: Seq[String]): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    ids.toDF("id").select(col("id").cast(edges.schema("src").dataType))
  }

  /** Vertex set of the (selected) edge frame — the default root set
    * for the per-source centralities, like GDS computing over every
    * node of the projection. */
  private def allVertices(e: DataFrame): DataFrame =
    e.select(col("src").as("id")).union(e.select(col("dst").as("id"))).distinct()

  /** GDS node-filter config (`sourceNodeFilter`/`targetNodeFilter`,
    * r13): a SINGLE string that names an existing label filters by
    * label (GDS's label spelling); anything else — a list, or a string
    * matching no label — is a node-id set. PRECEDENCE (r14, advice):
    * a single string matching BOTH a label and a node id is AMBIGUOUS
    * and raises loudly — the list spelling `['x']` always forces id
    * semantics, so every node stays addressable and adding a label
    * later can never silently change an existing query. The label and
    * ambiguity probes are one limit-1 scan each; ids cast to the edge
    * frame's id type like [[seedFrame]]. */
  private def nodeFilterFrame(nodes: DataFrame, edges: DataFrame,
                              cfg: Cfg, key: String): Option[DataFrame] =
    cfg.strs(key).map { vals =>
      val asLabel = vals.size == 1 && !cfg.isList(key) &&
        nodes.filter(col("label") === vals.head).limit(1).count() > 0
      if (asLabel) {
        require(nodes.filter(col("id").cast("string") === vals.head)
            .limit(1).count() == 0,
          s"${cfg.name}: $key '${vals.head}' matches both a label and a " +
            "node id — use the list spelling ['" + vals.head + "'] to " +
            "force node-id semantics (a single string means label)")
        nodes.filter(col("label") === vals.head)
          .select(col("id").cast(edges.schema("src").dataType).as("id"))
          .distinct()
      } else seedFrame(edges, vals)
    }

  // ------------------------------------------------------------- registry

  private val procs: Map[String, Proc] = Map(
    "pageRank" -> Proc(Seq("id", "score"),
      Set("maxIterations", "dampingFactor", "sourceNodes", "relationshipWeightProperty"),
      (n, ed, cfg) => {
        val (ed2, wcol) = resolveWeightProp(filterEdges(n, ed, cfg), cfg)
        val e = orientEdges(ed2, cfg)
        val iters = cfg.int("maxIterations", 10)
        val damping = cfg.dbl("dampingFactor", 0.85)
        val out = cfg.strs("sourceNodes") match {
          // GDS spelling: sourceNodes on pageRank = personalized
          case Some(seeds) =>
            require(wcol.isEmpty,
              "graft.pageRank: sourceNodes (personalized) does not support " +
                "relationshipWeightProperty yet")
            GraphOps.personalizedPageRank(e, seedFrame(ed, seeds), iters, damping)
          case None => GraphOps.pageRank(e, iters, damping, weightCol = wcol)
        }
        out.select(col("id"), col("rank").as("score"))
      }),
    // r16: gds.articleRank — the PageRank variant with the
    // deg + avgOutDeg divisor; same yield shape as pageRank
    "articleRank" -> Proc(Seq("id", "score"),
      Set("maxIterations", "dampingFactor"),
      (n, ed, cfg) => {
        val e = orientEdges(filterEdges(n, ed, cfg), cfg)
        GraphOps.articleRank(e, cfg.int("maxIterations", 10),
            cfg.dbl("dampingFactor", 0.85))
          .select(col("id"), col("rank").as("score"))
      }),
    // r14: GDS's weighted-wcc config pair — `threshold` keeps only
    // edges whose resolved weight is > the value (GDS semantics:
    // relationshipWeightProperty + threshold prune the projection
    // before the component run; vertices keep their row even if all
    // their edges prune away... in GDS pruned-to-isolated vertices
    // become singletons, and the edge-derived vertex set here comes
    // from the UNPRUNED graph for exactly that parity)
    "wcc" -> Proc(Seq("id", "componentId"),
      Set("maxIterations", "relationshipWeightProperty", "threshold"),
      (n, ed, cfg) => {
        val (ed2, wcol) = resolveWeightProp(filterEdges(n, ed, cfg), cfg)
        require(wcol.isDefined || !cfg.has("threshold"),
          "graft.wcc: threshold needs relationshipWeightProperty")
        val oriented = orientEdges(ed2, cfg)
        // the weight filter runs ONLY when the configured threshold is
        // meaningful — gate on the VALUE, not key presence (r15
        // advice: an explicit `threshold: 0.0` must behave exactly
        // like the omitted default; GDS's own gate is threshold > 0,
        // and `weight > 0.0` prunes zero/negative edges)
        wcol.filter(_ => cfg.has("threshold") &&
            cfg.dbl("threshold", 0.0) > 0.0) match {
          case Some(w) =>
            val kept = oriented.filter(col(w) > cfg.dbl("threshold", 0.0))
            val allV = oriented.select(col("src").as("id"))
              .unionByName(oriented.select(col("dst").as("id"))).distinct()
            val comps = GraphOps.connectedComponents(kept,
              cfg.int("maxIterations", 30))
            // pruned-to-isolated vertices are singleton components
            allV.join(comps, Seq("id"), "left")
              .select(col("id"),
                coalesce(col("component"), col("id")).as("componentId"))
          case None =>
            GraphOps.connectedComponents(oriented, cfg.int("maxIterations", 30))
              .select(col("id"), col("component").as("componentId"))
        }
      }),
    "scc" -> Proc(Seq("id", "componentId"), Set("maxIterations"),
      (n, ed, cfg) =>
        GraphOps.sccDataFrame(selectEdges(n, ed, cfg), cfg.int("maxIterations", 15))
          .select(col("id"), col("component").as("componentId"))),
    "labelPropagation" -> Proc(Seq("id", "communityId"),
      Set("maxIterations", "relationshipWeightProperty", "nodeWeightProperty"),
      (n, ed, cfg) => {
        // GDS parity (r14): votes scale with the edge weight and the
        // voting node's weight — the last community proc to grow its
        // weighted twin (louvain/leiden already have theirs)
        val (ed2, wcol) = resolveWeightProp(filterEdges(n, ed, cfg), cfg)
        GraphOps.labelPropagation(orientEdges(ed2, cfg),
            cfg.int("maxIterations", 5), weightCol = wcol,
            nodeWeights = resolveNodeWeightProp(n, cfg))
          .select(col("id"), col("community").as("communityId"))
      }),
    "louvain" -> Proc(Seq("id", "communityId"),
      Set("maxLevels", "maxIterations", "relationshipWeightProperty"),
      (n, ed, cfg) => {
        val (ed2, wcol) = resolveWeightProp(filterEdges(n, ed, cfg), cfg)
        GraphOps.louvain(orientEdges(ed2, cfg),
            maxLevels = cfg.int("maxLevels", 2), moveIters = cfg.int("maxIterations", 3),
            weightCol = wcol)
          .select(col("id"), col("community").as("communityId"))
      }),
    // r16: gds.modularityOptimization — louvain's flat move phase,
    // no contraction (GraphOps delegates at maxLevels = 1)
    "modularityOptimization" -> Proc(Seq("id", "communityId"),
      Set("maxIterations", "relationshipWeightProperty"),
      (n, ed, cfg) => {
        val (ed2, wcol) = resolveWeightProp(filterEdges(n, ed, cfg), cfg)
        GraphOps.modularityOptimization(orientEdges(ed2, cfg),
            maxIterations = cfg.int("maxIterations", 10), weightCol = wcol)
          .select(col("id"), col("community").as("communityId"))
      }),
    "leiden" -> Proc(Seq("id", "communityId"),
      Set("maxLevels", "maxIterations", "relationshipWeightProperty"),
      (n, ed, cfg) => {
        val (ed2, wcol) = resolveWeightProp(filterEdges(n, ed, cfg), cfg)
        GraphOps.leiden(orientEdges(ed2, cfg),
            maxLevels = cfg.int("maxLevels", 2), moveIters = cfg.int("maxIterations", 3),
            weightCol = wcol)
          .select(col("id"), col("community").as("communityId"))
      }),
    "degree" -> Proc(Seq("id", "inDegree", "outDegree", "degree"),
      Set("relationshipWeightProperty"),
      (n, ed, cfg) => {
        // GDS's relationshipWeightProperty (r12): degrees become
        // weight sums; unweighted stays the count path (longs)
        val (edW, wc) = resolveWeightProp(filterEdges(n, ed, cfg), cfg)
        val e = orientEdges(edW, cfg)
        val d = wc match {
          case Some(w) => GraphOps.weightedDegrees(e, w)
          case None => GraphOps.degrees(e)
        }
        d.select(col("id"), col("in_deg").as("inDegree"),
          col("out_deg").as("outDegree"), col("deg").as("degree"))
      }),
    // r15: gds.influenceMaximization.celf — the same IC-model greedy
    // objective, computed by reverse influence sampling (the
    // distributed standard; CELF's lazy queue is driver-sequential)
    "influenceMaximization.celf" -> Proc(Seq("rank", "id", "spread"),
      Set("seedSetSize", "monteCarloSimulations", "propagationProbability",
        "maxDepth"),
      (n, ed, cfg) => {
        val k = cfg.int("seedSetSize", -1)
        require(k >= 1,
          "influenceMaximization.celf: config key 'seedSetSize' is required")
        Influence.influenceMaximization(selectEdges(n, ed, cfg),
          seedSetSize = k,
          monteCarloSimulations = cfg.int("monteCarloSimulations", 100),
          propagationProbability = cfg.dbl("propagationProbability", 0.1),
          maxDepth = cfg.int("maxDepth", 30))
      }),
    // r15: gds.maxkcut — deterministic gated local search over the
    // same objective (GDS runs randomized VNS)
    "maxkcut" -> Proc(Seq("id", "communityId"),
      Set("k", "iterations", "relationshipWeightProperty"),
      (n, ed, cfg) => {
        val (ed2, wcol) = resolveWeightProp(filterEdges(n, ed, cfg), cfg)
        MaxKCut.maxKCut(orientEdges(ed2, cfg),
          k = cfg.int("k", 2), iterations = cfg.int("iterations", 8),
          weightCol = wcol)
      }),
    // r15: gds.graph.sample.rwr — RWR subgraph sampling; GDS returns
    // a catalog graph name, this engine's natural surface is the
    // sampled edge stream itself (the induced edges on the visited
    // vertex set), which is what the catalog graph contains
    "graph.sample.rwr" -> Proc(Seq("src", "dst"),
      Set("samplingRatio", "restartProbability", "startNodes",
        "walkersPerStart", "maxSteps"),
      (n, ed, cfg) => {
        val ed2 = selectEdges(n, ed, cfg)
        GraphOps.sampleRwr(ed2,
          samplingRatio = cfg.dbl("samplingRatio", 0.15),
          restartProbability = cfg.dbl("restartProbability", 0.1),
          startNodes = cfg.strs("startNodes").map(seedFrame(ed, _)),
          walkersPerStart = cfg.int("walkersPerStart", 8),
          maxSteps = cfg.int("maxSteps", 200))
      }),
    // r16: gds.graph.sample.cnarw — common-neighbour-aware walk
    // sampling, the second GDS sampling proc; same yield/config shape
    // as rwr
    "graph.sample.cnarw" -> Proc(Seq("src", "dst"),
      Set("samplingRatio", "restartProbability", "startNodes",
        "walkersPerStart", "maxSteps"),
      (n, ed, cfg) => {
        val ed2 = selectEdges(n, ed, cfg)
        GraphOps.sampleCnarw(ed2,
          samplingRatio = cfg.dbl("samplingRatio", 0.15),
          restartProbability = cfg.dbl("restartProbability", 0.1),
          startNodes = cfg.strs("startNodes").map(seedFrame(ed, _)),
          walkersPerStart = cfg.int("walkersPerStart", 8),
          maxSteps = cfg.int("maxSteps", 200))
      }),
    // r15: gds.node2vec — the EMBEDDINGS (deterministic full-batch
    // SGNS over the B31 biased walks), not just the walks; GDS config
    // spellings map 1:1 (negativeSamplingRate = negatives per
    // positive, initialLearningRate = the constant batch-GD rate)
    "node2vec" -> Proc(Seq("id", "embedding"),
      Set("embeddingDimension", "walksPerNode", "walkLength", "windowSize",
        "iterations", "initialLearningRate", "negativeSamplingRate",
        "returnFactor", "inOutFactor"),
      (n, ed, cfg) =>
        Node2Vec.embeddings(selectEdges(n, ed, cfg),
          dim = cfg.int("embeddingDimension", 32),
          walksPerNode = cfg.int("walksPerNode", 4),
          walkLength = cfg.int("walkLength", 8),
          windowSize = cfg.int("windowSize", 3),
          iterations = cfg.int("iterations", 5),
          learningRate = cfg.dbl("initialLearningRate", 0.05),
          negativeSamples = cfg.int("negativeSamplingRate", 2),
          p = cfg.dbl("returnFactor", 1.0),
          q = cfg.dbl("inOutFactor", 1.0))),
    // r15: gds.alpha.linkprediction.* — GDS spells four per-pair
    // functions; the set-returning proc here streams every candidate
    // pair (≥ 1 shared neighbor) with all four measures at once, and
    // the per-measure GDS spellings alias to it (YIELD picks columns)
    "linkprediction" -> Proc(
      Seq("node1", "node2", "commonNeighbors", "adamicAdar",
        "resourceAllocation", "preferentialAttachment",
        "totalNeighbors", "sameCommunity"),
      Set("centerCap", "communityProperty"),
      (n, ed, cfg) => {
        // r16: sameCommunity reads a node-prop assignment (the
        // conductance pattern); without communityProperty the column
        // is NULL — the measure is undefined, not zero
        val comm = cfg.str("communityProperty").map { cp =>
          n.select(col("id").cast("string").as("id"),
              element_at(col("props"), cp).as("community"))
            .filter(col("community").isNotNull)
        }
        val out = GraphOps.linkPrediction(selectEdges(n, ed, cfg),
          cfg.int("centerCap", 100000).toLong, comm)
        if (out.columns.contains("sameCommunity")) out
        else out.withColumn("sameCommunity", lit(null).cast("long"))
      }),
    // r17: gds.similarity.* function spellings — GDS spells cosine /
    // euclidean / pearson as per-pair Cypher FUNCTIONS over two vector
    // properties; the set-returning proc here streams every unordered
    // pair of property-bearing nodes with all four measures at once
    // (the linkprediction-function precedent — YIELD narrows to the
    // measure, the per-metric spellings alias here). Vectors parse
    // from the props map as comma-separated numbers; the input is
    // required BOUNDED (pairCap, loud) — corpus-scale similarity is
    // the knn/E-suite's job.
    "similarity" -> Proc(
      Seq("node1", "node2", "cosine", "euclidean", "euclideanDistance",
        "pearson"),
      Set("nodeProperty", "pairCap"),
      (n, ed, cfg) => {
        val p = cfg.str("nodeProperty").getOrElse(
          throw new IllegalArgumentException(
            "graft.similarity: config key 'nodeProperty' is required"))
        require(n.columns.contains("props"),
          "graft.similarity: nodeProperty needs a 'props' column on the " +
            "node frame")
        val vecs = n
          .select(col("id").cast("string").as("id"),
            element_at(col("props"), p).as("s"))
          .filter(col("s").isNotNull)
          .select(col("id"),
            // try_cast: ANSI mode would throw mid-fold on a malformed
            // entry; nulling it lets the probe below name the property
            transform(split(col("s"), ","), x => x.try_cast("double")).as("v"))
        // loud, not silent: a non-numeric entry would null-poison every
        // fold the measures run (one limit-1 probe)
        require(vecs.filter(exists(col("v"), x => x.isNull))
            .limit(1).count() == 0,
          s"graft.similarity: nodeProperty '$p' has a non-numeric entry " +
            "on at least one node")
        graft.operators.Similarity.pairwiseMetrics(vecs,
          cfg.int("pairCap", 10000).toLong)
      }),
    "triangleCount" -> Proc(Seq("id", "triangles"), Set.empty,
      (n, ed, cfg) =>
        GraphOps.triangles(selectEdges(n, ed, cfg))
          .select(col("id"), col("n_tri").as("triangles"))),
    // GDS gds.triangles parity (r12): stream each triangle once,
    // vertices id-sorted
    "triangles" -> Proc(Seq("nodeA", "nodeB", "nodeC"), Set.empty,
      (n, ed, cfg) =>
        GraphOps.triangleEnumerate(selectEdges(n, ed, cfg))
          .select(col("a").as("nodeA"), col("b").as("nodeB"),
            col("c").as("nodeC"))),
    // GDS gds.kcore parity (r14): the proc GDS actually ships streams
    // the full DECOMPOSITION (nodeId, coreValue), no k argument —
    // B43's H-index fixpoint / local peel. kCore (below) keeps the
    // graft-ism of extracting one level's subgraph.
    "kcore" -> Proc(Seq("id", "coreValue"), Set("maxIterations"),
      (n, ed, cfg) => GraphOps.coreDecomposition(selectEdges(n, ed, cfg),
        cfg.int("maxIterations", 100))),
    "kCore" -> Proc(Seq("id", "degree"), Set("k"),
      (n, ed, cfg) => {
        require(cfg.has("k"), "kCore: config key 'k' is required")
        GraphOps.kCore(selectEdges(n, ed, cfg), cfg.int("k", 0))
          .select(col("id"), col("deg").as("degree"))
      }),
    "closeness" -> Proc(Seq("id", "score"),
      Set("sourceNodes", "maxDepth", "relationshipWeightProperty"),
      (n, ed, cfg) => {
        val (ed2, wcol) = resolveWeightProp(filterEdges(n, ed, cfg), cfg)
        val e = orientEdges(ed2, cfg)
        val roots = cfg.strs("sourceNodes").map(seedFrame(ed, _)).getOrElse(allVertices(e))
        GraphOps.closeness(e, roots, cfg.int("maxDepth", 20), weightCol = wcol)
          .select(col("id"), col("closeness").as("score"))
      }),
    "harmonic" -> Proc(Seq("id", "score"), Set("sourceNodes", "maxDepth"),
      (n, ed, cfg) => {
        val e = selectEdges(n, ed, cfg)
        val roots = cfg.strs("sourceNodes").map(seedFrame(ed, _)).getOrElse(allVertices(e))
        GraphOps.harmonic(e, roots, cfg.int("maxDepth", 10))
          .select(col("id"), col("harmonic").as("score"))
      }),
    "betweenness" -> Proc(Seq("id", "score"),
      Set("sourceNodes", "maxDepth", "undirectedInput",
        "relationshipWeightProperty", "samplingSize"),
      (n, ed, cfg) => {
        val (ed2, wcol) = resolveWeightProp(filterEdges(n, ed, cfg), cfg)
        val e = orientEdges(ed2, cfg)
        // sourceNodes = explicit Brandes roots; samplingSize (r14) =
        // GDS's own scale escape hatch — full-root Brandes is the one
        // plan nobody runs at 100×. The sample is DETERMINISTIC: the k
        // smallest (xxhash64(id), id) vertices (the P3/E7 init
        // pattern — partition-arrival-invariant, one bounded
        // TakeOrderedAndProject, reruns and engines agree where GDS
        // would hand back a random subset). halve pairs with the
        // symmetrized-input fast path (weighted path does its own pair
        // dedup — undirectedInput is only the unweighted BFS shortcut,
        // halve applies to both).
        val undirected = cfg.bool("undirectedInput", false)
        require(!(cfg.has("sourceNodes") && cfg.has("samplingSize")),
          s"${cfg.name}: sourceNodes and samplingSize are mutually " +
            "exclusive (explicit roots vs a deterministic sample)")
        val roots = cfg.strs("sourceNodes").map(seedFrame(ed, _))
          .orElse(if (!cfg.has("samplingSize")) None else Some {
            val k = cfg.int("samplingSize", 0)
            require(k >= 1, s"${cfg.name}: samplingSize must be >= 1")
            allVertices(e)
              .orderBy(xxhash64(col("id").cast("string")), col("id").cast("string"))
              .limit(k)
          })
          .getOrElse(allVertices(e))
        GraphOps.betweenness(e, roots, cfg.int("maxDepth", 20),
            halve = undirected, undirectedInput = undirected && wcol.isEmpty,
            weightCol = wcol)
          .select(col("id"), col("betweenness").as("score"))
      }),
    "bfs" -> Proc(Seq("id", "dist"), Set("sourceNodes", "maxDepth"),
      (n, ed, cfg) => {
        val seeds = cfg.strs("sourceNodes").getOrElse(
          throw new IllegalArgumentException("bfs: config key 'sourceNodes' is required"))
        GraphOps.bfs(selectEdges(n, ed, cfg), seedFrame(ed, seeds), cfg.int("maxDepth", 20))
      }),
    // GDS gds.dfs parity (r14): deterministic sorted-adjacency
    // depth-first preorder — the bounded-local-finisher contract
    // (a DFS order is sequential by definition; loud above the bound)
    "dfs" -> Proc(Seq("id", "ord"), Set("sourceNode", "maxDepth"),
      (n, ed, cfg) => {
        val src = cfg.str("sourceNode").getOrElse(
          throw new IllegalArgumentException(
            "dfs: config key 'sourceNode' is required"))
        GraphOps.dfs(selectEdges(n, ed, cfg), src,
          cfg.int("maxDepth", Int.MaxValue))
      }),
    "sssp" -> Proc(Seq("id", "distance"),
      Set("sourceNodes", "maxIterations", "weightProperty"),
      (n, ed, cfg) => {
        val seeds = cfg.strs("sourceNodes").getOrElse(
          throw new IllegalArgumentException("sssp: config key 'sourceNodes' is required"))
        // weight resolution on the FILTERED edge set (type/label
        // selection first — a bad weight on an edge outside the
        // projection must not abort the call; GDS only requires the
        // property on projected relationships) but before orientation
        // (orientEdges carries `w` through every orientation): an
        // existing `w` column wins; else a props entry named by
        // weightProperty; else hop count (w = 1)
        val edF = filterEdges(n, ed, cfg)
        val ed2 = cfg.str("weightProperty") match {
          case Some(p) =>
            require(edF.columns.contains("props"),
              "sssp: weightProperty needs a 'props' column on the edge frame")
            val withW = edF.withColumn("w", element_at(col("props"), p).cast("double"))
            // same loud probe as resolveWeightProp: a typo'd property
            // must never silently yield null distances
            require(withW.filter(col("w").isNull).limit(1).count() == 0,
              s"graft.sssp: weightProperty '$p' is missing or non-numeric " +
                "on at least one edge")
            withW
          case None if edF.columns.contains("w") => edF
          case None => edF.withColumn("w", lit(1L))
        }
        val e = orientEdges(ed2, cfg)
        GraphOps.sssp(e, seedFrame(ed, seeds), cfg.int("maxIterations", 10))
          .select(col("id"), col("dist").as("distance"))
      }),
    // GDS gds.shortestPath.dijkstra.stream parity: the PATH, not just
    // the distance — one materialized minimal-weight path per
    // (sourceNode, reached) pair, '>'-joined ids (the same path
    // encoding the Cypher shortestPath surface yields). Weight
    // resolution matches graft.sssp (weightProperty, default hop = 1).
    "shortestPath" -> Proc(Seq("root", "id", "distance", "path"),
      Set("sourceNodes", "sourceNode", "targetNode", "maxIterations",
        "weightProperty"),
      (n, ed, cfg) => {
        // GDS's single-pair spelling (r15, advice): `shortestPath.
        // dijkstra` aliases here but its config says sourceNode
        // (singular) + targetNode — accept the singular as a seed
        // alias and the target as an output filter, so a migrating
        // user's verbatim GDS call runs instead of erroring on an
        // unknown key. The engine still computes the one-source run
        // (single-pair early-exit is astar's job — use
        // graft.shortestPath.astar for goal-directed pruning).
        require(!(cfg.has("sourceNodes") && cfg.has("sourceNode")),
          "shortestPath: pass sourceNodes OR sourceNode, not both")
        val seeds = cfg.strs("sourceNodes").orElse(cfg.strs("sourceNode"))
          .getOrElse(throw new IllegalArgumentException(
            "shortestPath: config key 'sourceNodes' is required"))
        val edF = filterEdges(n, ed, cfg)
        val ed2 = cfg.str("weightProperty") match {
          case Some(p) =>
            require(edF.columns.contains("props"),
              "shortestPath: weightProperty needs a 'props' column on the edge frame")
            val withW = edF.withColumn("w", element_at(col("props"), p).cast("double"))
            require(withW.filter(col("w").isNull).limit(1).count() == 0,
              s"graft.shortestPath: weightProperty '$p' is missing or non-numeric " +
                "on at least one edge")
            withW
          case None if edF.columns.contains("w") => edF
          case None => edF.withColumn("w", lit(1L))
        }
        val e = orientEdges(ed2, cfg)
        val full = GraphOps.ssspPathsFrom(e, seedFrame(ed, seeds),
            cfg.int("maxIterations", 10))
          .select(col("root"), col("id"), col("dist").as("distance"), col("path"))
        cfg.str("targetNode") match {
          case Some(t) => full.filter(col("id") === lit(t))
          case None => full
        }
      }),
    // GDS gds.k1coloring parity (r12): deterministic Jones-Plassmann
    "k1coloring" -> Proc(Seq("id", "color"), Set("maxIterations"),
      (n, ed, cfg) =>
        GraphOps.k1Coloring(selectEdges(n, ed, cfg),
          cfg.int("maxIterations", 50))),
    // GDS gds.conductance parity (r12): per-community cut/min-volume
    // quality over a node-property community assignment
    "conductance" -> Proc(Seq("community", "conductance"),
      Set("communityProperty", "weightProperty"),
      (n, ed, cfg) => {
        val cp = cfg.str("communityProperty").getOrElse(
          throw new IllegalArgumentException(
            "conductance: config key 'communityProperty' is required"))
        val asg = n
          .select(col("id").cast("string").as("id"),
            element_at(col("props"), cp).as("community"))
          .filter(col("community").isNotNull).distinct()
        val edF = filterEdges(n, ed, cfg)
        cfg.str("weightProperty") match {
          case Some(p) =>
            require(edF.columns.contains("props"),
              "conductance: weightProperty needs a 'props' column on the edge frame")
            val withW = edF.withColumn("w2",
              element_at(col("props"), p).cast("double"))
            require(withW.filter(col("w2").isNull).limit(1).count() == 0,
              s"graft.conductance: weightProperty '$p' is missing or " +
                "non-numeric on at least one edge")
            GraphOps.conductance(withW, asg, Some("w2"))
          case None => GraphOps.conductance(edF, asg)
        }
      }),
    // GDS gds.modularity.stream parity (r14): per-community Newman
    // modularity for a GIVEN assignment (communityProperty node prop,
    // the conductance pattern); Σ over communities = the global Q
    // louvain optimizes (spec-pinned)
    "modularity" -> Proc(Seq("communityId", "modularity"),
      Set("communityProperty", "weightProperty"),
      (n, ed, cfg) => {
        val cp = cfg.str("communityProperty").getOrElse(
          throw new IllegalArgumentException(
            "modularity: config key 'communityProperty' is required"))
        val asg = n
          .select(col("id").cast("string").as("id"),
            element_at(col("props"), cp).as("community"))
          .filter(col("community").isNotNull).distinct()
        val edF = filterEdges(n, ed, cfg)
        val out = cfg.str("weightProperty") match {
          case Some(p) =>
            require(edF.columns.contains("props"),
              "modularity: weightProperty needs a 'props' column on the edge frame")
            val withW = edF.withColumn("w2",
              element_at(col("props"), p).cast("double"))
            require(withW.filter(col("w2").isNull).limit(1).count() == 0,
              s"graft.modularity: weightProperty '$p' is missing or " +
                "non-numeric on at least one edge")
            GraphOps.modularityByCommunity(withW, asg, Some("w2"))
          case None => GraphOps.modularityByCommunity(edF, asg)
        }
        out.select(col("community").as("communityId"), col("modularity"))
      }),
    // GDS gds.shortestPath.astar parity (r12): goal-directed single-
    // pair shortest path. latitudeProperty/longitudeProperty (node
    // props, degrees) build the haversine heuristic exactly as GDS;
    // omitting both runs plain dijkstra (empty heuristic). Result is
    // bit-identical to graft.shortestPath's row for the pair — the
    // heuristic only prunes, never changes the answer.
    "shortestPath.astar" -> Proc(Seq("root", "id", "distance", "path"),
      Set("sourceNode", "targetNode", "maxIterations", "weightProperty",
        "latitudeProperty", "longitudeProperty"),
      (n, ed, cfg) => {
        val src = cfg.str("sourceNode").getOrElse(
          throw new IllegalArgumentException(
            "astar: config key 'sourceNode' is required"))
        val tgt = cfg.str("targetNode").getOrElse(
          throw new IllegalArgumentException(
            "astar: config key 'targetNode' is required"))
        val edF = filterEdges(n, ed, cfg)
        val ed2 = cfg.str("weightProperty") match {
          case Some(p) =>
            require(edF.columns.contains("props"),
              "astar: weightProperty needs a 'props' column on the edge frame")
            val withW = edF.withColumn("w", element_at(col("props"), p).cast("double"))
            require(withW.filter(col("w").isNull).limit(1).count() == 0,
              s"graft.shortestPath.astar: weightProperty '$p' is missing or " +
                "non-numeric on at least one edge")
            withW
          case None if edF.columns.contains("w") => edF
          case None => edF.withColumn("w", lit(1L))
        }
        val e = orientEdges(ed2, cfg)
        val heur = (cfg.str("latitudeProperty"), cfg.str("longitudeProperty")) match {
          case (Some(la), Some(lo)) =>
            GraphOps.haversineHeuristic(
              n.select(col("id").cast("string").as("id"),
                  element_at(col("props"), la).cast("double").as("lat"),
                  element_at(col("props"), lo).cast("double").as("lon"))
                .filter(col("lat").isNotNull && col("lon").isNotNull), tgt)
          case (None, None) =>
            n.select(col("id").cast("string").as("id"), lit(0.0).as("h")).limit(0)
          case _ => throw new IllegalArgumentException(
            "astar: latitudeProperty and longitudeProperty come together")
        }
        GraphOps.astarPath(e, src, tgt, heur, cfg.int("maxIterations", 10))
          .select(col("root"), col("id"), col("dist").as("distance"), col("path"))
      }),
    // GDS gds.shortestPath.yens parity: the k minimal-weight LOOPLESS
    // paths between a pinned pair, ranked by the house total order
    // (dist, hops, path). Weight resolution matches graft.shortestPath.
    "yens" -> Proc(Seq("rank", "dist", "hops", "path"),
      Set("sourceNode", "targetNode", "k", "maxHops", "weightProperty"),
      (n, ed, cfg) => {
        val srcN = cfg.str("sourceNode").getOrElse(
          throw new IllegalArgumentException(
            "yens: config key 'sourceNode' is required"))
        val dstN = cfg.str("targetNode").getOrElse(
          throw new IllegalArgumentException(
            "yens: config key 'targetNode' is required"))
        val edF = filterEdges(n, ed, cfg)
        val ed2 = cfg.str("weightProperty") match {
          case Some(p) =>
            require(edF.columns.contains("props"),
              "yens: weightProperty needs a 'props' column on the edge frame")
            val withW = edF.withColumn("w",
              element_at(col("props"), p).cast("double"))
            require(withW.filter(col("w").isNull).limit(1).count() == 0,
              s"graft.yens: weightProperty '$p' is missing or non-numeric " +
                "on at least one edge")
            withW
          case None if edF.columns.contains("w") => edF
          case None => edF.withColumn("w", lit(1L))
        }
        GraphOps.kShortestPaths(orientEdges(ed2, cfg), srcN, dstN,
          cfg.int("k", 3), cfg.int("maxHops", 10), weightCol = Some("w"))
      }),
    // GDS gds.randomWalk shape, deterministic by the house rule (the
    // per-step neighbor choice is hash(walk, step, seed) mod outdeg)
    "randomWalk" -> Proc(Seq("walk_id", "start", "steps", "path"),
      Set("walksPerNode", "walkLength", "randomSeed",
        "returnFactor", "inOutFactor", "relationshipWeightProperty"),
      (n, ed, cfg) => {
        val p = cfg.dbl("returnFactor", 1.0)
        val q = cfg.dbl("inOutFactor", 1.0)
        // GDS's node2vec-biased sampling lives on this proc's
        // returnFactor/inOutFactor keys; 1.0/1.0 without a weight
        // keeps the unbiased rank-mod walk (and its r11 gate rows)
        // byte-stable. r14: relationshipWeightProperty routes to the
        // biased walker too — steps sample ∝ weight × α
        val (ed2, wcol) = resolveWeightProp(filterEdges(n, ed, cfg), cfg)
        if (p == 1.0 && q == 1.0 && wcol.isEmpty)
          GraphOps.randomWalk(orientEdges(ed2, cfg),
            cfg.int("walksPerNode", 1), cfg.int("walkLength", 5),
            cfg.int("randomSeed", 42).toLong)
        else
          GraphOps.node2vecWalk(orientEdges(ed2, cfg),
            cfg.int("walksPerNode", 1), cfg.int("walkLength", 5),
            p, q, cfg.int("randomSeed", 42).toLong, weightCol = wcol)
      }),
    // GDS gds.scaleProperties parity: numeric node properties scaled
    // under one scaler, yielded as an array in nodeProperties order
    // (GDS's scaledProperty). Multi-label ids collapse by min per
    // property (deterministic); a missing/non-numeric property is loud.
    "scaleProperties" -> Proc(Seq("id", "scaled"),
      Set("nodeProperties", "scaler"),
      (n, ed, cfg) => {
        val props = cfg.strs("nodeProperties").getOrElse(
          throw new IllegalArgumentException(
            "scaleProperties: config key 'nodeProperties' is required"))
        val scaler = cfg.str("scaler").getOrElse("minMax")
        val perId = n.select(col("id") +: props.map(p =>
            element_at(col("props"), p).cast("double").as(p)): _*)
          .groupBy(col("id"))
          .agg(min(col(props.head)).as(props.head),
            props.tail.map(p => min(col(p)).as(p)): _*)
        props.foreach(p => require(
          perId.filter(col(p).isNull).limit(1).count() == 0,
          s"graft.scaleProperties: node property '$p' is missing or " +
            "non-numeric on at least one node"))
        graft.operators.Curation.scaleProperties(perId, props, scaler)
          .select(col("id"),
            array(props.map(p => col(s"${p}_scaled")): _*).as("scaled"))
      }),
    // GDS gds.dag.topologicalSort parity: (id, level) with level =
    // longest-path distance from the sources; cycle vertices excluded
    // (requireDag = true raises instead)
    "topologicalSort" -> Proc(Seq("id", "level"),
      Set("maxIterations", "requireDag"),
      (n, ed, cfg) =>
        GraphOps.topologicalSort(selectEdges(n, ed, cfg),
          cfg.int("maxIterations", 50), cfg.bool("requireDag", false))),
    // r16: gds.dag.longestPath — critical path to every vertex of a
    // DAG (GDS yields per-path rows; here the path rides as a string
    // column, the house shortestPath convention — YIELD renames cover
    // the targetNode/totalCost spellings)
    "dag.longestPath" -> Proc(Seq("id", "distance", "path"),
      Set("maxIterations", "relationshipWeightProperty"),
      (n, ed, cfg) => {
        val (ed2, wcol) = resolveWeightProp(filterEdges(n, ed, cfg), cfg)
        GraphOps.dagLongestPath(orientEdges(ed2, cfg), wcol,
            cfg.int("maxIterations", 50))
          .select(col("id"), col("dist").as("distance"), col("path"))
      }),
    "eigenvector" -> Proc(Seq("id", "score"),
      Set("maxIterations", "relationshipWeightProperty"),
      (n, ed, cfg) => {
        val (ed2, wcol) = resolveWeightProp(filterEdges(n, ed, cfg), cfg)
        GraphOps.eigenvector(orientEdges(ed2, cfg),
          cfg.int("maxIterations", 8), weightCol = wcol)
      }),
    "hits" -> Proc(Seq("id", "hub", "auth"), Set("maxIterations"),
      (n, ed, cfg) =>
        GraphOps.hits(selectEdges(n, ed, cfg), cfg.int("maxIterations", 8))),
    "nodeSimilarity" -> Proc(Seq("id1", "id2", "similarity"),
      Set("similarityCutoff", "hubCap", "similarityMetric", "topK",
        "sourceNodeFilter", "targetNodeFilter"),
      (n, ed, cfg) => {
        val cut = cfg.dbl("similarityCutoff", 0.1)
        val cap = cfg.int("hubCap", 1000).toLong
        // GDS's similarityMetric config (r12): JACCARD (default) |
        // OVERLAP | COSINE, case-insensitive like GDS
        val metric = cfg.str("similarityMetric").map(_.toLowerCase)
          .getOrElse("jaccard")
        val k = cfg.int("topK", -1)
        val srcF = nodeFilterFrame(n, ed, cfg, "sourceNodeFilter")
        val tgtF = nodeFilterFrame(n, ed, cfg, "targetNodeFilter")
        // gds.nodeSimilarity.filtered (r13): either filter key routes
        // to the filtered variant — DIRECTED rows (id1 ∈ source,
        // id2 ∈ target), optional topK per source node
        if (srcF.nonEmpty || tgtF.nonEmpty)
          GraphOps.nodeSimilarityFiltered(selectEdges(n, ed, cfg), cut,
              srcF, tgtF, cap, metric, topK = math.max(k, 0))
            .select(col("id").as("id1"), col("neighbor").as("id2"),
              col("sim").as("similarity"))
        // GDS's own default shape: K best neighbors PER NODE as
        // directed rows (r12) — opt-in here so the canonical-pair
        // form (and its gate) stays the no-config default
        else if (k > 0)
          GraphOps.nodeSimilarityTopK(selectEdges(n, ed, cfg), cut, k,
              cap, metric)
            .select(col("id").as("id1"), col("neighbor").as("id2"),
              col("sim").as("similarity"))
        else
          GraphOps.nodeSimilarity(selectEdges(n, ed, cfg), cut, cap, metric)
            .select(col("id1"), col("id2"), col("sim").as("similarity"))
      }),
    // GDS gds.spanningTree parity (r13): minimum spanning forest by
    // deterministic Borůvka; sourceNode filters to that node's
    // component — Prim's tree, since the (w, src, dst)-minimal forest
    // is unique
    "spanningTree" -> Proc(Seq("src", "dst", "weight"),
      Set("relationshipWeightProperty", "sourceNode", "maxIterations",
        "objective"),
      (n, ed, cfg) => {
        val (ed2, wcol) = resolveWeightProp(filterEdges(n, ed, cfg), cfg)
        val forest = GraphOps.spanningTree(orientEdges(ed2, cfg), wcol,
          cfg.int("maxIterations", 30),
          cfg.str("objective").getOrElse("minimum"))
        val out = cfg.str("sourceNode") match {
          case Some(s0) =>
            val comps = GraphOps.connectedComponents(forest)
            val mine = comps.filter(col("id") === s0)
              .select(col("component"))
            forest.join(comps.withColumnRenamed("id", "src"), Seq("src"))
              .join(broadcast(mine), Seq("component"), "left_semi")
              .select(col("src"), col("dst"), col("w"))
          case None => forest
        }
        out.select(col("src"), col("dst"), col("w").as("weight"))
      }),
    // GDS gds.kSpanningTree parity (r14): the sourceNode tree split
    // into k sub-trees by cutting the k−1 objective-far edges
    "kSpanningTree" -> Proc(Seq("src", "dst", "weight"),
      Set("k", "sourceNode", "relationshipWeightProperty",
        "maxIterations", "objective"),
      (n, ed, cfg) => {
        require(cfg.has("k"), "kSpanningTree: config key 'k' is required")
        val src = cfg.str("sourceNode").getOrElse(
          throw new IllegalArgumentException(
            "kSpanningTree: config key 'sourceNode' is required"))
        val (ed2, wcol) = resolveWeightProp(filterEdges(n, ed, cfg), cfg)
        GraphOps.kSpanningTree(orientEdges(ed2, cfg), cfg.int("k", 1), src,
            wcol, cfg.int("maxIterations", 30),
            cfg.str("objective").getOrElse("minimum"))
          .select(col("src"), col("dst"), col("w").as("weight"))
      }),
    // GDS gds.bellmanFord parity (r13): negative weights allowed,
    // negative cycles loud. Weight resolution matches graft.sssp.
    "bellmanFord" -> Proc(Seq("id", "distance", "path"),
      Set("sourceNode", "weightProperty"),
      (n, ed, cfg) => {
        val src = cfg.str("sourceNode").getOrElse(
          throw new IllegalArgumentException(
            "bellmanFord: config key 'sourceNode' is required"))
        val edF = filterEdges(n, ed, cfg)
        val ed2 = cfg.str("weightProperty") match {
          case Some(p) =>
            require(edF.columns.contains("props"),
              "bellmanFord: weightProperty needs a 'props' column on the edge frame")
            edF.withColumn("w", element_at(col("props"), p).cast("double"))
          case None if edF.columns.contains("w") => edF
          case None => edF.withColumn("w", lit(1.0))
        }
        GraphOps.bellmanFord(orientEdges(ed2, cfg), src)
          .select(col("id"), col("dist").as("distance"), col("path"))
      }),
    // GDS gds.steinerTree parity (r13): shortest-path-tree heuristic
    // from sourceNode to targetNodes; unreachable targets omitted
    "steinerTree" -> Proc(Seq("src", "dst", "weight"),
      Set("sourceNode", "targetNodes", "relationshipWeightProperty",
        "maxIterations"),
      (n, ed, cfg) => {
        val src = cfg.str("sourceNode").getOrElse(
          throw new IllegalArgumentException(
            "steinerTree: config key 'sourceNode' is required"))
        val tgts = cfg.strs("targetNodes").getOrElse(
          throw new IllegalArgumentException(
            "steinerTree: config key 'targetNodes' is required"))
        val (ed2, wcol) = resolveWeightProp(filterEdges(n, ed, cfg), cfg)
        GraphOps.steinerTree(orientEdges(ed2, cfg), src, tgts,
            cfg.int("maxIterations", 10), wcol)
          .select(col("src"), col("dst"), col("w").as("weight"))
      }),
    // GDS gds.articulationPoints / gds.bridges parity (r13): exact
    // local Hopcroft-Tarjan under the bound; r14 — ABOVE it the
    // distributed Tarjan-Vishkin pass (B41) takes over, so the procs
    // no longer refuse at scale. biconnectedComponents exposes the
    // full block partition TV computes (beyond the GDS catalog — the
    // capability its articulationPoints/bridges derive from).
    "articulationPoints" -> Proc(Seq("id"), Set.empty,
      (n, ed, cfg) => GraphOps.articulationPoints(selectEdges(n, ed, cfg))),
    "bridges" -> Proc(Seq("src", "dst"), Set.empty,
      (n, ed, cfg) => GraphOps.bridges(selectEdges(n, ed, cfg))),
    "biconnectedComponents" -> Proc(Seq("src", "dst", "component"), Set.empty,
      (n, ed, cfg) => GraphOps.biconnectedComponents(selectEdges(n, ed, cfg))),
    // GDS gds.hashgnn parity (r13): hash-based deterministic embeddings
    // (min-hash message passing — no floats anywhere, bit-stable)
    "hashgnn" -> Proc(Seq("id", "features", "embedding"),
      Set("dimension", "densityLevel", "iterations", "embeddingDensity",
        "randomSeed"),
      (n, ed, cfg) =>
        HashGNN.embed(selectEdges(n, ed, cfg),
          dimension = cfg.int("dimension", 64),
          densityLevel = cfg.int("densityLevel", 4),
          iterations = cfg.int("iterations", 2),
          embeddingDensity = cfg.int("embeddingDensity", 8),
          seed = cfg.int("randomSeed", 42).toLong,
          nodes = Some(n.select(col("id"))))),
    // GDS gds.knn shape over GRAPH nodes: FastRP embeddings (the GDS
    // fastRP.mutate → knn idiom in one call) → banded hyperplane
    // candidates → exact cosine top-k per node. Approximate like GDS's
    // NN-Descent; deterministic by the FastRP/LSH seeds.
    "knn" -> Proc(Seq("id1", "id2", "rank", "similarity"),
      Set("topK", "embeddingDimension", "iterationWeights", "randomSeed",
        "nbits", "ntables"),
      (n, ed, cfg) => {
        val emb = FastRP.embed(selectEdges(n, ed, cfg),
          dim = cfg.int("embeddingDimension", 64),
          weights = cfg.dbls("iterationWeights").getOrElse(Seq(0.0, 1.0, 1.0)),
          seed = cfg.int("randomSeed", 42).toLong,
          nodes = Some(n.select(col("id"))))
        graft.operators.Similarity.knnGraph(
          emb.select(col("id"), col("embedding").as("v")),
          k = cfg.int("topK", 5), nbits = cfg.int("nbits", 3),
          ntables = cfg.int("ntables", 16))
      }),
    // GDS gds.alpha.sllpa parity (r14): speaker-listener label
    // propagation — OVERLAPPING communities (a vertex may yield
    // several rows), the shape the disjoint community procs can't
    // express; deterministic integer-exact draws (see [[Sllpa]])
    "sllpa" -> Proc(Seq("id", "communityId"),
      Set("maxIterations", "minAssociationStrength", "randomSeed"),
      (n, ed, cfg) => Sllpa.run(selectEdges(n, ed, cfg),
        cfg.int("maxIterations", 10),
        cfg.dbl("minAssociationStrength", 0.2),
        cfg.int("randomSeed", 42).toLong)),
    // GDS gds.kmeans parity (r14): GDS clusters on an array node
    // property; this engine's graphs carry no array node properties
    // (same divergence knn documents), so the vectors come from the
    // FastRP embedding knn already composes — then the E7 machinery
    // (deterministic hash-order init, distributed Lloyd, cosine
    // assignment). Yields (id, communityId, similarity).
    "kmeans" -> Proc(Seq("id", "communityId", "similarity"),
      Set("k", "maxIterations", "embeddingDimension", "iterationWeights",
        "randomSeed"),
      (n, ed, cfg) => {
        val emb = FastRP.embed(selectEdges(n, ed, cfg),
          dim = cfg.int("embeddingDimension", 64),
          weights = cfg.dbls("iterationWeights").getOrElse(Seq(0.0, 1.0, 1.0)),
          seed = cfg.int("randomSeed", 42).toLong,
          nodes = Some(n.select(col("id"))))
        graft.operators.Similarity.kmeans(
            emb.select(col("id"), col("embedding").as("v")),
            k = cfg.int("k", 10), iters = cfg.int("maxIterations", 2))
          .select(col("id"), col("cluster").cast("long").as("communityId"),
            col("sim").as("similarity"))
      }),
    // GDS gds.localClusteringCoefficient parity (r14): 2·Δ(v) /
    // (deg(v)·(deg(v)−1)) over the undirected simple projection —
    // B10's triangle core + a degree agg; degree-<2 vertices yield 0
    // (GDS convention), vertices appear iff they have an edge.
    "localClusteringCoefficient" ->
      Proc(Seq("id", "localClusteringCoefficient"), Set.empty,
      (n, ed, cfg) => {
        val e = selectEdges(n, ed, cfg)
        val sym = GraphOps.undirected(e).filter(col("src") =!= col("dst"))
        val deg = sym.groupBy(col("src").as("id"))
          .agg(countDistinct(col("dst")).as("deg"))
        deg.join(GraphOps.triangles(e), Seq("id"), "left")
          .select(col("id"),
            when(col("deg") < 2, lit(0.0))
              .otherwise(lit(2.0) * coalesce(col("n_tri"), lit(0L)) /
                (col("deg") * (col("deg") - 1)))
              .as("localClusteringCoefficient"))
      }),
    "fastRP" -> Proc(Seq("id", "embedding"),
      Set("embeddingDimension", "iterationWeights", "randomSeed"),
      (n, ed, cfg) => {
        val ws = cfg.dbls("iterationWeights").getOrElse(Seq(0.0, 1.0, 1.0))
        FastRP.embed(selectEdges(n, ed, cfg),
          dim = cfg.int("embeddingDimension", 64),
          weights = ws,
          seed = cfg.int("randomSeed", 42).toLong,
          nodes = Some(n.select(col("id"))))
      }))

  // ------------------------------------------------------------------ run

  private val PrefixRe =
    """(?is)^CALL\s+graft\.(\w+(?:\.\w+)*)\s*(?:\(\s*(\{.*?\})?\s*\))?\s*(.*)$""".r
  private val RetTailRe =
    """(?is)^RETURN\s+(DISTINCT\s+)?(.+?)(?:\s+ORDER\s+BY\s+(.+?))?(?:\s+SKIP\s+(\d+))?(?:\s+LIMIT\s+(\d+))?\s*$""".r
  private val ModTailRe =
    """(?is)^(?:ORDER\s+BY\s+(.+?))?(?:\s*\bSKIP\s+(\d+))?(?:\s*\bLIMIT\s+(\d+))?\s*$""".r

  /** Index of the first top-level occurrence of any of `kws` (outside
    * single-quoted literals), or the text length. `ORDER` only counts
    * followed by `BY`. */
  private def firstKeyword(s: String, kws: Set[String]): Int = {
    // identifier characters are \w (underscore INCLUDED — an alias
    // like deg_limit must not split at LIMIT)
    def wordChar(c: Char): Boolean = c.isLetterOrDigit || c == '_'
    var inStr = false
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (ch == '\'') inStr = !inStr
      else if (!inStr && (i == 0 || !wordChar(s.charAt(i - 1)))) {
        val rest = s.substring(i).toUpperCase
        kws.find(k => rest.startsWith(k) &&
            (i + k.length >= s.length || !wordChar(s.charAt(i + k.length))))
          .foreach { k =>
            if (k != "ORDER" || rest.substring(k.length).trim.startsWith("BY "))
              return i
          }
      }
      i += 1
    }
    s.length
  }

  private val TailKeywords =
    Set("WHERE", "MATCH", "WITH", "UNWIND", "RETURN", "ORDER", "SKIP", "LIMIT")

  /** GDS variant spellings (r14): the catalog names several procs
    * `<name>.<algorithm>` where the suffix picks Neo4j's INTERNAL
    * algorithm (delta-stepping vs dijkstra). This engine keeps ONE
    * scale-shaped implementation per semantic — the keyed Bellman-Ford
    * frontier ([[GraphOps.ssspPathsFrom]]) serves both spellings, the
    * way AQE picks a physical join for a logical one — so the variant
    * names alias to it rather than failing as typos. `shortestPath.
    * astar` stays a REAL proc (different semantics: a heuristic
    * frame), and `.stream` strips before aliasing. */
  private val ProcAliases = Map(
    "allShortestPaths.delta" -> "shortestPath",
    "allShortestPaths.dijkstra" -> "shortestPath",
    "shortestPath.dijkstra" -> "shortestPath",
    "shortestPath.yens" -> "yens",
    "closeness.harmonic" -> "harmonic", // GDS's dotted spelling
    // GDS names the filtered variants as distinct procs; here the
    // filters are config keys on the base proc (absent keys = the
    // unfiltered run, unknown keys stay loud)
    "nodeSimilarity.filtered" -> "nodeSimilarity",
    "knn.filtered" -> "knn",
    // r15: GDS's per-measure link-prediction function spellings all
    // land on the one streaming proc; YIELD narrows to the measure
    "linkprediction.adamicAdar" -> "linkprediction",
    "linkprediction.commonNeighbors" -> "linkprediction",
    "linkprediction.resourceAllocation" -> "linkprediction",
    "linkprediction.preferentialAttachment" -> "linkprediction",
    // r16: the two remaining alpha linkprediction function spellings
    "linkprediction.totalNeighbors" -> "linkprediction",
    "linkprediction.sameCommunity" -> "linkprediction",
    // r17: the gds.similarity.* per-metric function spellings land on
    // the one streaming proc; YIELD narrows to the measure
    "similarity.cosine" -> "similarity",
    "similarity.euclidean" -> "similarity",
    "similarity.euclideanDistance" -> "similarity",
    "similarity.pearson" -> "similarity")

  def run(nodes: DataFrame, edges: DataFrame, cypher: String): DataFrame = {
    val text = CypherLite.normalizeWs(cypher)
    text match {
      case PrefixRe(name0, cfgOrNull, tail0) =>
        // GDS catalog habits, in order: the `.stream` mode suffix and
        // the `alpha.`/`beta.` tier prefixes strip (a migrating user's
        // `gds.alpha.sllpa.stream` is spelled `graft.alpha.sllpa.
        // stream` and lands on sllpa), then variant spellings alias
        val stripped = name0.stripSuffix(".stream")
          .stripPrefix("alpha.").stripPrefix("beta.")
        val name = ProcAliases.getOrElse(stripped, stripped)
        val proc = procs.getOrElse(name, throw new IllegalArgumentException(
          s"unknown procedure graft.$name — available: " +
            procs.keys.toSeq.sorted.mkString(", ")))
        val cfgMap = Option(cfgOrNull).map(parseConfig).getOrElse(Map.empty)
        val badKeys = cfgMap.keySet -- proc.keys -- CommonKeys
        require(badKeys.isEmpty,
          s"graft.$name: unknown config key(s) ${badKeys.toSeq.sorted.mkString(", ")} — " +
            s"allowed: ${(proc.keys ++ CommonKeys).toSeq.sorted.mkString(", ")}")
        val cfg = new Cfg(s"graft.$name", cfgMap)

        var frame = proc.run(nodes, edges, cfg)
        var tail = tail0.trim

        // YIELD: projection + rename against the canonical schema
        if (tail.toUpperCase.startsWith("YIELD ")) {
          val body = tail.substring(6)
          val end = firstKeyword(body, TailKeywords)
          val items = splitTopLevel(body.substring(0, end).trim).map(_.trim).map { it =>
            val m = """(?i)^(\w+)(?:\s+AS\s+(\w+))?$""".r
            it match {
              case m(c0, aliasOrNull) =>
                require(proc.yields.contains(c0),
                  s"graft.$name yields ${proc.yields.mkString(", ")} — not '$c0'")
                (c0, Option(aliasOrNull).getOrElse(c0))
              case other => throw new IllegalArgumentException(
                s"bad YIELD item: $other (column [AS alias])")
            }
          }
          frame = frame.select(items.map { case (c0, a) => col(c0).as(a) }: _*)
          tail = body.substring(end).trim
        }

        compileTail(nodes, edges, frame, tail)
      case _ => throw new IllegalArgumentException(
        s"unsupported CALL statement: $cypher (expected CALL graft.<proc>({config}) " +
          "[YIELD cols] [WHERE ...] [MATCH …|RETURN ...] [ORDER BY ...] [SKIP n] [LIMIT n])")
    }
  }

  /** Compile a post-frame continuation — `[WHERE …] (MATCH … |
    * RETURN … | ORDER BY/SKIP/LIMIT)` — over a flat bound frame, with
    * the full Cypher expression machinery (bare identifiers resolve as
    * columns; RETURN takes aggregates with implicit grouping). Shared
    * by the procedure surface (after YIELD) and CypherLite's
    * `CALL { … }` subquery composition. */
  private[graph] def compileTail(nodes: DataFrame, edges: DataFrame,
                                 frame0: DataFrame, tail0: String): DataFrame = {
    var frame = frame0
    var tail = tail0.trim
    // the tail reuses the Cypher expression machinery over the flat
    // frame — bare identifiers resolve as columns
    val c = new Compiler(nodes, edges)
    var anonId = 0
    val anon = () => { anonId += 1; s"_callanon$anonId" }
    if (tail.toUpperCase.startsWith("WHERE ")) {
      val body = tail.substring(6)
      val end = firstKeyword(body, TailKeywords - "WHERE")
      frame = c.applyPred(frame, parseWhere(body.substring(0, end).trim, anon))
      tail = body.substring(end).trim
    }

    if (tail.isEmpty) frame
    else if (tail.toUpperCase.startsWith("MATCH ")) {
      // composition: the frame's columns are carried variables the
      // MATCH stage joins on (the WithStage.next mechanism) —
      // `CALL graft.pageRank YIELD id, score MATCH (id)-[:T]->(x)
      // RETURN …` runs the full read grammar
      CypherLite.runParsed(nodes, edges, CypherLite.parse(tail), Some(frame))
    }
    else tail match {
      case RetTailRe(distinctOrNull, retPart, orderOrNull, skipOrNull, limitOrNull) =>
        frame = c.project(frame, splitTopLevel(retPart).map(parseRetItem),
          distinct = distinctOrNull != null)
        if (orderOrNull != null)
          frame = frame.orderBy(parseOrder(orderOrNull).map { case (cn, desc) =>
            if (desc) col(cn).desc else col(cn).asc }: _*)
        Option(skipOrNull).foreach(n => frame = frame.offset(n.toInt))
        Option(limitOrNull).foreach(n => frame = frame.limit(n.toInt))
        frame
      case ModTailRe(orderOrNull, skipOrNull, limitOrNull)
          if orderOrNull != null || skipOrNull != null || limitOrNull != null =>
        if (orderOrNull != null)
          frame = frame.orderBy(parseOrder(orderOrNull).map { case (cn, desc) =>
            if (desc) col(cn).desc else col(cn).asc }: _*)
        Option(skipOrNull).foreach(n => frame = frame.offset(n.toInt))
        Option(limitOrNull).foreach(n => frame = frame.limit(n.toInt))
        frame
      case other => throw new IllegalArgumentException(
        s"unsupported CALL tail: $other (expected [WHERE …] then " +
          "MATCH …, RETURN …, or ORDER BY/SKIP/LIMIT)")
    }
  }
}
