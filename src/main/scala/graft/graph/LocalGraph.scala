package graft.graph

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType, StringType, StructField, StructType}

import scala.collection.parallel.CollectionConverters._
import scala.jdk.CollectionConverters._

/** Bounded driver-side finishers for the iterative graph algorithms —
  * the louvain/connectedComponents pattern (SURVEY §7.15/§7.16)
  * factored out and extended to the rest of the per-round family.
  *
  * WHY (measured at r8 on the Louvain investigation): one distributed
  * frontier/power-iteration round on a FEW-THOUSAND-node graph is
  * ~5–15 AQE query-stage jobs at ~65 ms of driver scheduling/replan
  * each — seconds of pure orchestration for microseconds of
  * arithmetic. Below `localFinishEdges` edge rows (a few MB — the
  * same bounded-collect class as IVF's nlist-row centroid frame) the
  * algorithm runs here, as an EXACT in-memory mirror of the
  * distributed semantics; above it, nothing changes. At 100 TB the
  * gate never fires and every operator stays fully distributed —
  * callers can force that locally with `localFinishEdges = 0`, which
  * the equivalence specs do on both paths.
  *
  * Exactness contract, per algorithm:
  *   - integer state (BFS distances, LPA counts, Brandes σ): bitwise
  *     equal to the distributed result;
  *   - float accumulations (PageRank sums, Brandes δ): same formula,
  *     deterministic (edge-order) summation — equal to the
  *     distributed result up to partial-aggregation-order float
  *     noise (~1e-12 relative), i.e. identical after the operators'
  *     own output rounding, which the specs pin.
  */
private[graft] object LocalGraph {

  /** Dense-int encoding of a collected edge list: first-appearance
    * order, out-adjacency, deduplicated. */
  final class Dense(pairs: Array[(Any, Any)]) {
    val index = new java.util.HashMap[Any, Int]()
    private val idBuf = scala.collection.mutable.ArrayBuffer.empty[Any]
    private def enc(x: Any): Int = {
      if (index.containsKey(x)) index.get(x)
      else { val i = idBuf.length; index.put(x, i); idBuf += x; i }
    }
    private val eSet = new java.util.HashSet[Long]()
    private val adjBuf = scala.collection.mutable.ArrayBuffer.empty[scala.collection.mutable.ArrayBuffer[Int]]
    pairs.foreach { case (s, d) =>
      val si = enc(s); val di = enc(d)
      while (adjBuf.length < idBuf.length) adjBuf += scala.collection.mutable.ArrayBuffer.empty[Int]
      val key = si.toLong << 32 | (di.toLong & 0xffffffffL)
      if (eSet.add(key)) adjBuf(si) += di
    }
    val ids: Array[Any] = idBuf.toArray
    val adj: Array[Array[Int]] = {
      while (adjBuf.length < idBuf.length) adjBuf += scala.collection.mutable.ArrayBuffer.empty[Int]
      adjBuf.map(_.toArray).toArray
    }
    def n: Int = ids.length
  }

  private def frame(spark: SparkSession, rows: Seq[Row], fields: StructField*): DataFrame =
    spark.createDataFrame(rows.asJava, StructType(fields))

  /** [[GraphOps.articleRank]] mirror (r16): the pageRank iteration
    * with contributions divided by `deg(u) + avgOutDeg`
    * (avg = |pairs|/|V| — pairs are the distinct edge set, exactly the
    * distributed scalar). Deterministic summation in dense-id order;
    * agrees with the distributed path within float-sum tolerance
    * (spec-pinned, the pageRank rule). */
  def articleRank(spark: SparkSession, pairs: Array[(Any, Any)], iters: Int,
                  damping: Double, idType: DataType): DataFrame = {
    val g = new Dense(pairs)
    val avg = pairs.length.toDouble / g.n
    var rank = Array.fill(g.n)(1.0)
    for (_ <- 1 to iters) {
      val msum = new Array[Double](g.n)
      var u = 0
      while (u < g.n) {
        val out = g.adj(u)
        if (out.nonEmpty) {
          val c = rank(u) / (out.length + avg)
          var j = 0
          while (j < out.length) { msum(out(j)) += c; j += 1 }
        }
        u += 1
      }
      rank = Array.tabulate(g.n)(v => (1 - damping) + damping * msum(v))
    }
    frame(spark, (0 until g.n).map(v => Row(g.ids(v), rank(v))),
      StructField("id", idType), StructField("rank", DoubleType))
  }

  /** [[GraphOps.pageRank]] mirror: iters rounds of
    * rank = (1−d) + d·Σ rank(u)/deg(u); dangling vertices receive
    * (1−d) (the distributed left-join/coalesce). Deterministic
    * summation in dense-id order. */
  def pageRank(spark: SparkSession, pairs: Array[(Any, Any)], iters: Int,
               damping: Double, idType: DataType): DataFrame = {
    val g = new Dense(pairs)
    var rank = Array.fill(g.n)(1.0)
    for (_ <- 1 to iters) {
      val msum = new Array[Double](g.n)
      var u = 0
      while (u < g.n) {
        val out = g.adj(u)
        if (out.nonEmpty) {
          val c = rank(u) / out.length
          var j = 0
          while (j < out.length) { msum(out(j)) += c; j += 1 }
        }
        u += 1
      }
      rank = Array.tabulate(g.n)(v => (1 - damping) + damping * msum(v))
    }
    frame(spark, (0 until g.n).map(v => Row(g.ids(v), rank(v))),
      StructField("id", idType), StructField("rank", DoubleType))
  }

  /** [[GraphOps.bfsDistancesFrom]] mirror: hop-bounded multi-source
    * BFS; every distinct source gets its self row (dist 0) whether or
    * not it touches the graph. Roots run in parallel (driver cores);
    * distances are integers — bitwise-equal to the keyed-frontier
    * result.
    *
    * Returns None (caller falls through to the distributed path) when
    * the edge gate alone under-predicts the cost: the OUTPUT is up to
    * |roots|·|V| rows of driver memory and the work |roots|·|E| edge
    * visits — both quadratic in shapes a small edge frame permits
    * (every-vertex roots over a 250k-edge graph). */
  def bfsDistancesFrom(spark: SparkSession, pairs: Array[(Any, Any)],
                       sources: Array[Any], maxIter: Int, idType: DataType,
                       // ~8M Rows ≈ 1 GB of driver objects — safe on a
                       // modest driver; sf0.1's all-roots closeness
                       // needs 4M
                       maxOutputRows: Long = 8L * 1000 * 1000,
                       maxEdgeVisits: Long = 2L * 1000 * 1000 * 1000): Option[DataFrame] = {
    val g = new Dense(pairs)
    val nRoots = sources.distinct.length.toLong
    if (nRoots * g.n > maxOutputRows || nRoots * pairs.length > maxEdgeVisits)
      return None
    val rows = sources.distinct.par.flatMap { root =>
      val out = scala.collection.mutable.ArrayBuffer.empty[Row]
      out += Row(root, root, 0)
      val ri = g.index.getOrDefault(root, -1)
      if (ri >= 0) {
        val dist = Array.fill(g.n)(-1)
        dist(ri) = 0
        var frontier = List(ri)
        var depth = 0
        while (depth < maxIter && frontier.nonEmpty) {
          depth += 1
          var next = List.empty[Int]
          frontier.foreach { u =>
            val nbrs = g.adj(u)
            var j = 0
            while (j < nbrs.length) {
              val v = nbrs(j)
              if (dist(v) < 0) { dist(v) = depth; next ::= v; out += Row(root, g.ids(v), depth) }
              j += 1
            }
          }
          frontier = next
        }
      }
      out
    }.seq.toSeq
    Some(frame(spark, rows, StructField("root", idType), StructField("id", idType),
      StructField("dist", IntegerType)))
  }

  /** [[GraphOps.ssspFrom]] mirror: synchronous hop-bounded
    * Bellman-Ford per root — per round the frontier's candidates
    * aggregate (min per target) BEFORE comparing to state, exactly the
    * distributed groupBy-min-then-filter. Off-graph roots keep their
    * self row (the distributed seed is a plain union; null-weight
    * edges are filtered out on both paths). */
  def ssspFrom(spark: SparkSession, triples: Array[(Any, Any, Double)],
               sources: Array[Any], maxIter: Int, idType: DataType,
               maxOutputRows: Long = 8L * 1000 * 1000,
               maxEdgeVisits: Long = 2L * 1000 * 1000 * 1000): Option[DataFrame] = {
    val index = new java.util.HashMap[Any, Int]()
    val idBuf = scala.collection.mutable.ArrayBuffer.empty[Any]
    def enc(x: Any): Int =
      if (index.containsKey(x)) index.get(x)
      else { val i = idBuf.length; index.put(x, i); idBuf += x; i }
    triples.foreach { case (s, d, _) => enc(s); enc(d) }
    val nV = idBuf.length
    val srcs = sources.distinct
    val nRoots = srcs.length.toLong
    // Bellman-Ford re-relaxes per round: |roots|·|E|·rounds work bound
    if (nRoots * nV > maxOutputRows ||
        nRoots * triples.length * math.max(1, maxIter) > maxEdgeVisits)
      return None
    val outTo = Array.fill(nV)(scala.collection.mutable.ArrayBuffer.empty[Int])
    val outW = Array.fill(nV)(scala.collection.mutable.ArrayBuffer.empty[Double])
    triples.foreach { case (s, d, w) =>
      val si = index.get(s); outTo(si) += index.get(d); outW(si) += w
    }
    val ids = idBuf.toArray
    val rows = srcs.par.flatMap { root =>
      val out = scala.collection.mutable.ArrayBuffer.empty[Row]
      out += Row(root, root, 0.0)
      val ri = index.getOrDefault(root, -1)
      if (ri >= 0) {
        val dist = Array.fill(nV)(Double.PositiveInfinity)
        dist(ri) = 0.0
        var frontier = Array(ri)
        var iter = 0
        while (iter < maxIter && frontier.nonEmpty) {
          iter += 1
          val cand = new java.util.HashMap[Int, Double]()
          frontier.foreach { u =>
            val ts = outTo(u); val ws = outW(u)
            var j = 0
            while (j < ts.length) {
              val v = ts(j); val nd = dist(u) + ws(j)
              if (nd < cand.getOrDefault(v, Double.PositiveInfinity)) cand.put(v, nd)
              j += 1
            }
          }
          val improved = scala.collection.mutable.ArrayBuffer.empty[Int]
          cand.forEach { (v, nd) =>
            if (nd < dist(v)) { dist(v) = nd; improved += v }
          }
          frontier = improved.toArray
        }
        var v = 0
        while (v < nV) {
          if (v != ri && dist(v) < Double.PositiveInfinity)
            out += Row(root, ids(v), dist(v))
          v += 1
        }
      }
      out
    }.seq.toSeq
    Some(frame(spark, rows, StructField("root", idType), StructField("id", idType),
      StructField("dist", DoubleType)))
  }

  /** Weighted [[GraphOps.pageRank]] mirror: rank·w/Σ_out w
    * contributions over the TRIPLE-deduplicated edge list (parallel
    * edges with distinct weights keep separate rows — their
    * contributions sum, like the distributed distinct on
    * (src, dst, w)). Caller pre-dedups; no pair-dedup here. */
  def pageRankWeighted(spark: SparkSession, triples: Array[(Any, Any, Double)],
                       iters: Int, damping: Double, idType: DataType): DataFrame = {
    val index = new java.util.HashMap[Any, Int]()
    val ids = scala.collection.mutable.ArrayBuffer.empty[Any]
    def enc(x: Any): Int =
      if (index.containsKey(x)) index.get(x)
      else { val i = ids.length; index.put(x, i); ids += x; i }
    val es = triples.map { case (s, d, w) => (enc(s), enc(d), w) }
    val n = ids.length
    val wdeg = new Array[Double](n)
    // NaN marks a null stored weight: ignored in sums (the SQL-null
    // semantics of the distributed aggregations), endpoint still a
    // vertex
    es.foreach { case (s, _, w) => if (!w.isNaN) wdeg(s) += w }
    var rank = Array.fill(n)(1.0)
    for (_ <- 1 to iters) {
      val msum = new Array[Double](n)
      es.foreach { case (s, d, w) =>
        if (!w.isNaN && wdeg(s) != 0.0) msum(d) += rank(s) * w / wdeg(s)
      }
      rank = Array.tabulate(n)(v => (1 - damping) + damping * msum(v))
    }
    frame(spark, (0 until n).map(v => Row(ids(v), rank(v))),
      StructField("id", idType), StructField("rank", DoubleType))
  }

  /** [[GraphOps.bfs]] mirror: ONE wave from the whole source set
    * (dist = min hops from any source), hop-bounded; every distinct
    * source keeps its dist-0 row. Linear work — no overrun bound
    * needed beyond the edge gate. */
  def bfs(spark: SparkSession, pairs: Array[(Any, Any)],
          sources: Array[Any], maxIter: Int, idType: DataType): DataFrame = {
    val g = new Dense(pairs)
    val dist = new java.util.HashMap[Any, Integer]()
    var frontier = List.empty[Int]
    sources.distinct.foreach { s =>
      if (!dist.containsKey(s)) {
        dist.put(s, 0)
        val i = g.index.getOrDefault(s, -1)
        if (i >= 0) frontier ::= i
      }
    }
    var depth = 0
    while (depth < maxIter && frontier.nonEmpty) {
      depth += 1
      var next = List.empty[Int]
      frontier.foreach { u =>
        val nbrs = g.adj(u)
        var j = 0
        while (j < nbrs.length) {
          val v = nbrs(j)
          if (!dist.containsKey(g.ids(v))) { dist.put(g.ids(v), depth); next ::= v }
          j += 1
        }
      }
      frontier = next
    }
    val rows = dist.entrySet().asScala.toSeq.map(e => Row(e.getKey, e.getValue.intValue))
    frame(spark, rows, StructField("id", idType), StructField("dist", IntegerType))
  }

  /** [[GraphOps.labelPropagation]] mirror: synchronous rounds, label =
    * most frequent neighbor label, ties to the SMALLER label (the
    * min_by(−cnt, label) struct ordering). Counts are integers, the
    * tie ordering is total — bitwise-equal results. */
  def labelPropagation(spark: SparkSession, pairs: Array[(Any, Any)], iters: Int,
                       idType: DataType, lt: (Any, Any) => Boolean): DataFrame = {
    val g = new Dense(pairs) // caller passes the symmetrized frame
    var label = Array.tabulate[Any](g.n)(v => g.ids(v))
    for (_ <- 1 to iters) {
      val next = new Array[Any](g.n)
      var v = 0
      while (v < g.n) {
        // messages into v = labels of u for every edge u→v; on the
        // symmetrized dedup'd frame that is exactly the neighbor set.
        // Count via a small map per vertex.
        val cnt = new java.util.HashMap[Any, Long]()
        val nbrs = g.adj(v)
        var j = 0
        while (j < nbrs.length) { cnt.merge(label(nbrs(j)), 1L, _ + _); j += 1 }
        if (cnt.isEmpty) next(v) = label(v) // isolated keeps its own
        else {
          var best: Any = null; var bestC = -1L
          val it = cnt.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            if (e.getValue > bestC || (e.getValue == bestC && lt(e.getKey, best)))
              { best = e.getKey; bestC = e.getValue }
          }
          next(v) = best
        }
        v += 1
      }
      label = next
    }
    frame(spark, (0 until g.n).map(v => Row(g.ids(v), label(v))),
      StructField("id", idType), StructField("community", idType))
  }

  /** [[GraphOps.betweenness]] mirror: hop-bounded Brandes over the
    * directed edge list (string ids — the distributed path casts
    * first). Per root: BFS with σ (long, exact), then the standard
    * reverse-depth δ sweep δ(u) = σ_u·Σ_{w∈succ(u)} (1+δ_w)/σ_w —
    * the same factored formula the backward join computes. Roots
    * outside the graph contribute nothing (the distributed inner
    * encode-join drops them). Output: EVERY vertex, score = Σ_roots δ
    * (excluding δ at the root itself), halved if `halve`, rounded 6. */
  def betweenness(spark: SparkSession, pairs: Array[(Any, Any)],
                  roots: Array[String], maxIter: Int, halve: Boolean,
                  maxEdgeVisits: Long = 2L * 1000 * 1000 * 1000): Option[DataFrame] = {
    val g = new Dense(pairs.map { case (a, b) => (a: Any, b: Any) })
    val rootIdx = roots.distinct.filter(g.index.containsKey(_)).map(g.index.get(_))
    // Brandes is |roots|·|E| work: a small edge frame with every-vertex
    // roots can still be billions of visits — fall through if so
    if (rootIdx.length.toLong * pairs.length > maxEdgeVisits) return None
    // chunk roots across cores; each chunk accumulates one double[]
    val nChunks = math.max(1, math.min(rootIdx.length, Runtime.getRuntime.availableProcessors))
    val chunks = rootIdx.grouped(math.max(1, (rootIdx.length + nChunks - 1) / nChunks)).toArray
    val partials = chunks.par.map { chunk =>
      val acc = new Array[Double](g.n)
      val dist = new Array[Int](g.n)
      val sigma = new Array[Long](g.n)
      val delta = new Array[Double](g.n)
      val order = new Array[Int](g.n) // BFS visit order (by depth)
      chunk.foreach { s =>
        java.util.Arrays.fill(dist, -1)
        java.util.Arrays.fill(sigma, 0L)
        java.util.Arrays.fill(delta, 0.0)
        dist(s) = 0; sigma(s) = 1L
        var head = 0; var tail = 0
        order(tail) = s; tail += 1
        while (head < tail) {
          val u = order(head); head += 1
          if (dist(u) < maxIter) {
            val nbrs = g.adj(u)
            var j = 0
            while (j < nbrs.length) {
              val w = nbrs(j)
              if (dist(w) < 0) { dist(w) = dist(u) + 1; order(tail) = w; tail += 1 }
              if (dist(w) == dist(u) + 1) sigma(w) += sigma(u)
              j += 1
            }
          }
        }
        // reverse visit order = non-increasing depth: δ sweep
        var k = tail - 1
        while (k >= 0) {
          val u = order(k)
          val nbrs = g.adj(u)
          var s2 = 0.0
          var j = 0
          while (j < nbrs.length) {
            val w = nbrs(j)
            if (dist(w) == dist(u) + 1) s2 += (1.0 + delta(w)) / sigma(w).toDouble
            j += 1
          }
          delta(u) = sigma(u).toDouble * s2
          if (u != s) acc(u) += delta(u)
          k -= 1
        }
      }
      acc
    }.seq
    val total = new Array[Double](g.n)
    partials.foreach { p => var v = 0; while (v < g.n) { total(v) += p(v); v += 1 } }
    val div = if (halve) 2.0 else 1.0
    // rounding = Num.roundTies(…, 6) in double arithmetic — the SAME
    // floor(x·1e6 + 0.5)/1e6 the distributed path and the DuckDB
    // oracle compute, so all three agree bit-for-bit on rational δ sums
    Some(frame(spark, (0 until g.n).map { v =>
      Row(g.ids(v).asInstanceOf[String],
        math.floor(total(v) / div * 1e6 + 0.5) / 1e6)
    }, StructField("id", StringType), StructField("betweenness", DoubleType)))
  }

  /** [[GraphOps]] WEIGHTED-betweenness mirror: the same four phases as
    * the distributed path — synchronous hop-bounded Bellman-Ford
    * carrying (dist, max-hops), shortest-path DAG membership by exact
    * double equality dist(u)+w == dist(v) (identical operands on both
    * paths → identical doubles), σ as DAG-path counts by layer, δ by
    * layer descending — on driver arrays. Triples arrive already
    * min-collapsed per (src, dst). */
  def betweennessWeighted(spark: SparkSession,
                          triples: Array[(String, String, Double)],
                          roots: Array[String], maxIter: Int, halve: Boolean,
                          maxEdgeVisits: Long = 2L * 1000 * 1000 * 1000): Option[DataFrame] = {
    val index = new java.util.HashMap[String, Int]()
    val idBuf = scala.collection.mutable.ArrayBuffer.empty[String]
    def enc(x: String): Int =
      if (index.containsKey(x)) index.get(x)
      else { val i = idBuf.length; index.put(x, i); idBuf += x; i }
    triples.foreach { case (s, d, _) => enc(s); enc(d) }
    val nV = idBuf.length
    val rootIdx = roots.distinct.filter(index.containsKey(_)).map(index.get(_))
    // Bellman-Ford re-relaxes edges each round: |roots|·|E|·rounds work
    if (rootIdx.length.toLong * triples.length * math.max(1, maxIter) > maxEdgeVisits)
      return None
    val outTo = Array.fill(nV)(scala.collection.mutable.ArrayBuffer.empty[Int])
    val outW = Array.fill(nV)(scala.collection.mutable.ArrayBuffer.empty[Double])
    val inFrom = Array.fill(nV)(scala.collection.mutable.ArrayBuffer.empty[Int])
    val inW = Array.fill(nV)(scala.collection.mutable.ArrayBuffer.empty[Double])
    triples.foreach { case (s, d, w) =>
      val si = index.get(s); val di = index.get(d)
      outTo(si) += di; outW(si) += w; inFrom(di) += si; inW(di) += w
    }
    val ids = idBuf.toArray
    val nChunks = math.max(1, math.min(rootIdx.length,
      Runtime.getRuntime.availableProcessors))
    val chunks = rootIdx.grouped(
      math.max(1, (rootIdx.length + nChunks - 1) / nChunks)).toArray
    // set when a root exhibits the hop-bound pathology (see
    // GraphOps.hopBoundMsg) — checked after the parallel sweep so the
    // refusal is deterministic regardless of chunk scheduling
    val badBound = new java.util.concurrent.atomic.AtomicBoolean(false)
    val partials = chunks.par.map { chunk =>
      val acc = new Array[Double](nV)
      val dist = new Array[Double](nV)
      val hops = new Array[Int](nV)
      val sigma = new Array[Long](nV)
      val delta = new Array[Double](nV)
      chunk.foreach { s =>
        java.util.Arrays.fill(dist, Double.PositiveInfinity)
        java.util.Arrays.fill(hops, -1)
        dist(s) = 0.0; hops(s) = 0
        // phase A: synchronous rounds — candidates aggregate (min nd,
        // then max nh) per target BEFORE comparing to state, exactly
        // like the distributed groupBy-then-filter
        var frontier = Array(s)
        var iter = 0
        while (iter < maxIter && frontier.nonEmpty) {
          iter += 1
          val candD = new java.util.HashMap[Int, Double]()
          val candH = new java.util.HashMap[Int, Int]()
          frontier.foreach { u =>
            val ts = outTo(u); val ws = outW(u)
            var j = 0
            while (j < ts.length) {
              val v = ts(j); val nd = dist(u) + ws(j); val nh = hops(u) + 1
              val od = candD.getOrDefault(v, Double.PositiveInfinity)
              if (nd < od || (nd == od && nh > candH.get(v))) {
                candD.put(v, nd); candH.put(v, nh)
              }
              j += 1
            }
          }
          val improved = scala.collection.mutable.ArrayBuffer.empty[Int]
          candD.forEach { (v, nd) =>
            val nh = candH.get(v)
            if (nd < dist(v) || (nd == dist(v) && nh > hops(v))) {
              dist(v) = nd; hops(v) = nh; improved += v
            }
          }
          frontier = improved.toArray
        }
        // layer buckets (reached only)
        var maxLvl = 0
        var v = 0
        while (v < nV) { if (hops(v) > maxLvl) maxLvl = hops(v); v += 1 }
        val buckets = Array.fill(maxLvl + 1)(scala.collection.mutable.ArrayBuffer.empty[Int])
        v = 0
        while (v < nV) { if (hops(v) >= 0) buckets(hops(v)) += v; v += 1 }
        // phase C: σ = DAG paths of ≤ maxIter edges, by p_k frontier
        // propagation — the EXACT distributed formulation (a layer-DP
        // over the full DAG would also count longer-than-maxIter DAG
        // paths, which exist when the hop bound binds on
        // prefix-suboptimal minimal walks)
        java.util.Arrays.fill(sigma, 0L)
        sigma(s) = 1L
        var pfront = new java.util.HashMap[Int, Long]()
        pfront.put(s, 1L)
        var kk = 0
        while (kk < maxIter && !pfront.isEmpty) {
          kk += 1
          val nxt = new java.util.HashMap[Int, Long]()
          pfront.forEach { (u, p) =>
            val ts = outTo(u); val ws = outW(u)
            var j = 0
            while (j < ts.length) {
              val w0 = ts(j)
              if (hops(w0) >= 0 && dist(u) + ws(j) == dist(w0))
                nxt.merge(w0, p, (a: Long, b: Long) => a + b)
              j += 1
            }
          }
          nxt.forEach { (v2, p) => sigma(v2) += p }
          pfront = nxt
        }
        // hop-bound pathology probes — the exact mirror of the
        // distributed refusals (GraphOps.hopBoundMsg): (i) a DAG edge
        // that does not strictly increase the hops layering, (ii) a
        // reached non-root vertex with σ = 0. Either makes the
        // layer-synchronized sweeps ill-defined; refuse, don't
        // under-credit (or divide by zero).
        var bad = false
        v = 0
        while (v < nV && !bad) {
          if (hops(v) >= 0 && v != s && sigma(v) == 0L) bad = true
          v += 1
        }
        var u0 = 0
        while (u0 < nV && !bad) {
          if (hops(u0) >= 0) {
            val ts = outTo(u0); val ws = outW(u0)
            var j = 0
            while (j < ts.length && !bad) {
              val w0 = ts(j)
              if (hops(w0) >= 0 && dist(u0) + ws(j) == dist(w0) &&
                  hops(w0) <= hops(u0)) bad = true
              j += 1
            }
          }
          u0 += 1
        }
        if (bad) badBound.set(true)
        else {
          // phase D: δ by layer descending; only STRICTLY deeper-layer
          // successors contribute (the distributed pool only ever holds
          // emissions from layers already finalized — i.e. deeper ones)
          java.util.Arrays.fill(delta, 0.0)
          var lvl = maxLvl
          while (lvl >= 1) {
            buckets(lvl).foreach { u =>
              var s2 = 0.0
              val ts = outTo(u); val ws = outW(u)
              var j = 0
              while (j < ts.length) {
                val w0 = ts(j)
                if (hops(w0) > hops(u) && dist(u) + ws(j) == dist(w0))
                  s2 += (1.0 + delta(w0)) / sigma(w0).toDouble
                j += 1
              }
              delta(u) = sigma(u).toDouble * s2
              if (u != s) acc(u) += delta(u)
            }
            lvl -= 1
          }
        }
      }
      acc
    }.seq
    if (badBound.get) throw new IllegalStateException(GraphOps.hopBoundMsg)
    val total = new Array[Double](nV)
    partials.foreach { p => var v = 0; while (v < nV) { total(v) += p(v); v += 1 } }
    val div = if (halve) 2.0 else 1.0
    Some(frame(spark, (0 until nV).map { v =>
      Row(ids(v), math.floor(total(v) / div * 1e6 + 0.5) / 1e6)
    }, StructField("id", StringType), StructField("betweenness", DoubleType)))
  }

  /** [[GraphOps.eigenvector]] mirror: power iteration over the
    * (symmetrized) edge list, L2-normalized per iteration — the same
    * per-round normalization the distributed loop and the DuckDB
    * recursive-CTE oracle apply, so magnitudes stay bounded at any
    * iteration count. Deterministic dense-id summation order. */
  def eigenvector(spark: SparkSession, pairs: Array[(Any, Any)], iters: Int,
                  idType: DataType): DataFrame = {
    val g = new Dense(pairs)
    var x = Array.fill(g.n)(1.0)
    for (_ <- 1 to iters) {
      val s = new Array[Double](g.n)
      var u = 0
      while (u < g.n) {
        val out = g.adj(u)
        var j = 0
        while (j < out.length) { s(out(j)) += x(u); j += 1 }
        u += 1
      }
      var norm2 = 0.0
      var v = 0
      while (v < g.n) { norm2 += s(v) * s(v); v += 1 }
      val norm = math.sqrt(norm2)
      x = if (norm == 0.0) s else s.map(_ / norm)
    }
    frame(spark, (0 until g.n).map(v => Row(g.ids(v), x(v))),
      StructField("id", idType), StructField("score", DoubleType))
  }

  /** Weighted [[GraphOps.eigenvector]] mirror: s(v) = Σ w(u,v)·x(u)
    * over the caller's (already weighted-symmetrized, triple-dedup'd)
    * edge list; same per-iteration L2 normalization. */
  def eigenvectorWeighted(spark: SparkSession, triples: Array[(Any, Any, Double)],
                          iters: Int, idType: DataType): DataFrame = {
    val index = new java.util.HashMap[Any, Int]()
    val ids = scala.collection.mutable.ArrayBuffer.empty[Any]
    def enc(a: Any): Int =
      if (index.containsKey(a)) index.get(a)
      else { val i = ids.length; index.put(a, i); ids += a; i }
    val es = triples.map { case (s0, d0, w) => (enc(s0), enc(d0), w) }
    val n = ids.length
    var x = Array.fill(n)(1.0)
    for (_ <- 1 to iters) {
      val s = new Array[Double](n)
      es.foreach { case (u, v, w) => s(v) += w * x(u) }
      var n2 = 0.0; var v = 0
      while (v < n) { n2 += s(v) * s(v); v += 1 }
      val norm = math.sqrt(n2)
      x = if (norm == 0.0) s else s.map(_ / norm)
    }
    frame(spark, (0 until n).map(v => Row(ids(v), x(v))),
      StructField("id", idType), StructField("score", DoubleType))
  }

  /** [[GraphOps.hits]] mirror — JACOBI update (both scores advance
    * from the previous iteration's values, the single-recursive-
    * reference form the DuckDB oracle can express):
    * a_{t+1} = normalize(Aᵀ h_t), h_{t+1} = normalize(A a_t). */
  def hits(spark: SparkSession, pairs: Array[(Any, Any)], iters: Int,
           idType: DataType): DataFrame = {
    val g = new Dense(pairs)
    var h = Array.fill(g.n)(1.0)
    var a = Array.fill(g.n)(1.0)
    for (_ <- 1 to iters) {
      val sa = new Array[Double](g.n) // auth: in-neighbor hub sums
      val sh = new Array[Double](g.n) // hub: out-neighbor auth sums
      var u = 0
      while (u < g.n) {
        val out = g.adj(u)
        var j = 0
        while (j < out.length) {
          val w = out(j)
          sa(w) += h(u)
          sh(u) += a(w)
          j += 1
        }
        u += 1
      }
      def normed(s: Array[Double]): Array[Double] = {
        var n2 = 0.0; var v = 0
        while (v < s.length) { n2 += s(v) * s(v); v += 1 }
        val n = math.sqrt(n2)
        if (n == 0.0) s else s.map(_ / n)
      }
      a = normed(sa)
      h = normed(sh)
    }
    frame(spark, (0 until g.n).map(v => Row(g.ids(v), h(v), a(v))),
      StructField("id", idType), StructField("hub", DoubleType),
      StructField("auth", DoubleType))
  }

  /** Union-find with MIN-MEMBER canonical labels over String pairs —
    * the shared refinement primitive (louvain's interleaved-Leiden
    * branch and leidenRefine's local gate must keep the same
    * canonicalization contract: it is load-bearing for the "a coarse
    * label is always a refined label" invariant). Returns the label
    * function: id → smallest member of its component, identity for
    * ids no pair touched. */
  def unionFindMinLabel(pairs: Iterator[(String, String)]): String => String = {
    import scala.collection.mutable
    val parent = mutable.Map.empty[String, String]
    def find(x: String): String = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    pairs.foreach { case (s, d) =>
      parent.getOrElseUpdate(s, s); parent.getOrElseUpdate(d, d)
      val rs = find(s); val rd = find(d)
      if (rs != rd) parent(rd) = rs
    }
    val minRep = mutable.Map.empty[String, String]
    parent.keys.foreach { n =>
      val r = find(n)
      if (!minRep.contains(r) || n < minRep(r)) minRep(r) = n
    }
    n => if (parent.contains(n)) minRep(find(n)) else n
  }

  /** Id types the driver-side HashMaps can key on: every Catalyst
    * external type EXCEPT Array[Byte] (BinaryType), whose
    * equals/hashCode are reference-based — a binary-id graph would
    * silently shatter into singleton edges in the local mirrors while
    * the distributed joins compare it by value. Gates decline and
    * fall through to the distributed path instead. */
  def equatableId(t: DataType): Boolean =
    t != org.apache.spark.sql.types.BinaryType

  /** Comparable-type guard + ordering for label/tie semantics (the
    * same three types the connectedComponents finisher accepts). */
  def orderingFor(t: DataType): Option[(Any, Any) => Boolean] = t match {
    case StringType  => Some((a, b) => a.asInstanceOf[String] < b.asInstanceOf[String])
    case IntegerType => Some((a, b) => a.asInstanceOf[Int] < b.asInstanceOf[Int])
    case LongType    => Some((a, b) => a.asInstanceOf[Long] < b.asInstanceOf[Long])
    case _ => None
  }
}
