package graft

import graft.operators.Relational

/** Physical-plan audits: the scale claims in SURVEY §2/§5 pinned as
  * assertions, so a regression in pushdown/broadcast/partial-agg shows
  * up as a test failure, not a slow cluster job. */
class PlanAuditSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("C2: filter and projection reach the parquet scan") {
    val p = plan(Relational.q2Pushdown(spark, sf))
    assert(p.contains("PushedFilters: [IsNotNull(l_returnflag), IsNotNull(l_quantity)"), p)
    assert(p.contains("EqualTo(l_returnflag,R)"), p)
    assert(p.contains("GreaterThan(l_quantity,"), p) // value truncated in plan toString
    // narrow ReadSchema: exactly the three needed columns
    val rs = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(rs.contains("l_partkey") && rs.contains("l_quantity") &&
      rs.contains("l_returnflag") && !rs.contains("l_extendedprice"), rs)
  }

  test("C3: all dimension joins broadcast; fact scanned once") {
    val p = plan(Relational.q3Join(spark, sf))
    val nBroadcast = p.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(nBroadcast == 3, s"expected 3 broadcast joins:\n$p")
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("C1: aggregation is partial (map-side combine before the shuffle)") {
    val p = plan(Relational.q1Agg(spark, sf))
    val aggs = p.linesIterator.count(_.contains("HashAggregate"))
    assert(aggs >= 2, s"expected partial+final HashAggregate:\n$p")
  }

  test("C9: global sort+limit plans as TakeOrderedAndProject (no full sort)") {
    val p = plan(Relational.q9Sort(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("C4: EXISTS / NOT EXISTS plan as semi/anti joins (no row multiplication)") {
    assert(plan(Relational.q4Semi(spark, sf)).contains("LeftSemi"))
    assert(plan(Relational.q4Anti(spark, sf)).contains("LeftAnti"))
  }

  test("C11: as-of join is a single shuffle + window, no range cross join") {
    val p = plan(Relational.q11Asof(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Window"), p)
  }

  test("C23: range join is an equi-join on buckets, never a nested loop") {
    val p = plan(Relational.q23Range(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("B10: triangle wedge/closure joins are equi-joins, never a nested loop") {
    val p = plan(graft.graph.GraphOps.triangles(
      graft.graph.TestGraph.coPurchaseEdges(spark, sf)))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("D4: prefix-filtered candidate generation joins only on shingles (equi)") {
    // reclaim=false: the audit needs the full lazy plan — the default
    // reclaim path checkpoints the (already-executed) result, which
    // would hide the joins from this assertion
    val p = plan(graft.operators.Dedup.d4Jaccard(spark, sf, reclaim = false))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("P4: shard packing never funnels the corpus through one partition") {
    // a Window.orderBy without partitionBy would plan an Exchange
    // SinglePartition under the window — the two-pass prefix sum must not
    val df = graft.operators.Curation.packShards(spark, sf)
    val p = plan(df)
    val winIdx = p.linesIterator.indexWhere(l => l.contains("Window"))
    assert(winIdx >= 0, p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("P4bpe r16: the tokenizer-true pack keeps the two-pass prefix-sum " +
      "shape (no single-partition funnel)") {
    val p = plan(graft.operators.Curation.p4ShardsBpe(spark, sf))
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("C12: percentile rank windows partition on (pid, group), never group alone") {
    // a Window.partitionBy(l_returnflag) would sort the whole table
    // through ~|groups| tasks; the distributed-rank formulation windows
    // over (pid, g) — every window partition spec must include pid
    val p = plan(Relational.q12Pctl(spark, sf))
    val winSpecs = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(winSpecs.nonEmpty, p)
    winSpecs.foreach(w => assert(w.contains("pid"), s"window without pid:\n$w"))
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("F7: the eval gram set joins broadcast (never shuffles the training side)") {
    val p = plan(graft.operators.TextAnalysis.f7Decontam(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("P5: weighted sampling is pure per-row arithmetic — no shuffle at all") {
    val df = graft.operators.Curation.p5WeightedSample(spark, sf)
    // the only allowed exchange is the final presentation orderBy's
    // range partitioning; nothing upstream of it may shuffle
    val p = plan(df)
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.forall(_.contains("rangepartitioning")), p)
  }

  test("E5: kNN labeling broadcasts the query side; corpus is never shuffled pre-topk") {
    val p = plan(graft.operators.Similarity.e5KnnLabel(spark, sf))
    // the query matrix is broadcast (nested-loop against the corpus scan)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    // no sort-merge join anywhere: the only shuffles are the per-query
    // top-k windows and the tiny vote aggregation
    assert(!p.contains("SortMergeJoin"), p)
    // the top-k is TWO-STAGE: a stage-1 window partitioning on
    // (pid, q_id) must exist — a bare partitionBy(q_id) alone funnels
    // the corpus into |q| tasks (the low-cardinality-window trap)
    val winSpecs = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(winSpecs.size >= 2, p)
    assert(winSpecs.exists(_.contains("pid")), s"no (pid, q_id) stage-1 window:\n$p")
  }

  test("E1: brute-force top-k is two-stage; merge exchange ships no vectors") {
    val p = plan(graft.operators.Similarity.e1TopK(spark, sf))
    val winSpecs = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(winSpecs.size >= 2, p)
    assert(winSpecs.exists(_.contains("pid")), s"no (pid, q_id) stage-1 window:\n$p")
    // vector payloads are projected away before the window exchanges: no
    // hashpartitioning exchange may carry v/qv array columns
    val exch = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    exch.foreach(l => assert(!l.matches(".*(?<![a-zA-Z_])(v|qv)#.*"),
      s"vector payload in a shuffle:\n$l"))
  }

  test("E3: centroid assignment is a scalar expression — no crossJoin, no argmin shuffle") {
    // the r4 shape this pins out: crossJoin(broadcast(centroids)) +
    // row_number() argmin window — an Exchange of the corpus×nlist frame
    // carrying full vector payloads, twice. The quantizer is nlist rows,
    // so assignment must be inline literals: zero joins before the probe
    val p = plan(graft.operators.Similarity.e3IvfTopK(spark, sf, reclaim = false))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the only windows left are the two-stage final top-k (stage 1 on pid)
    val winSpecs = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(winSpecs.size >= 2, p)
    assert(winSpecs.exists(_.contains("pid")), s"no (pid, q_id) stage-1 window:\n$p")
  }

  test("E3: Lloyd refinement never aggregates vector arrays over corpus rows") {
    // the scale-killer shape this pins out: groupBy(cid).agg(
    // collect_list(v)) — one aggregation buffer holding ~corpus/nlist
    // full vectors. The refinement must explode to (cid, dim, x) scalar
    // rows, average per (cid, dim), and only re-assemble the nlist×dim
    // MEANS into arrays
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val assigned = Seq((0, Seq(1.0, 2.0)), (0, Seq(3.0, 4.0)), (1, Seq(5.0, 6.0)))
      .toDF("cid", "v")
    val refined = graft.operators.Similarity.lloydRefine(assigned)
    val p = plan(refined)
    // collect_list must aggregate the (dim, mean) scalars, never `v`
    assert(!p.matches("(?s).*collect_list\\(v[,#].*"),
      s"corpus vectors inside an aggregation buffer:\n$p")
    assert(p.contains("posexplode"), p)
    assert(p.linesIterator.exists(l => l.contains("avg(") || l.contains("partial_avg")), p)
    // and it computes the right means
    val got = refined.collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(got == Map(0 -> Seq(2.0, 3.0), 1 -> Seq(5.0, 6.0)))
  }

  test("E2: ANN candidate dedup keys on ids only, never on embedding payloads") {
    val df = graft.operators.Similarity.e2AnnTopK(spark, sf)
    val p = plan(df)
    // the distinct's HashAggregate must group on (q_id/tbl/bucket/vec_id)
    // ids; a `v#…` or `qv#…` in any aggregate grouping key means the
    // candidate shuffle is hashing vector arrays again
    val aggLines = p.linesIterator.filter(_.contains("HashAggregate")).toSeq
    assert(aggLines.nonEmpty, p)
    aggLines.foreach { l =>
      assert(!l.matches(".*keys=\\[[^\\]]*(?<![a-zA-Z_])(v|qv)#.*"),
        s"vector payload in an aggregate key:\n$l")
    }
  }

  test("P3: stage-1 sample window partitions on (pid, lang); merge input is pruned") {
    val p = plan(graft.operators.Curation.stratifiedSample(spark, sf))
    val winSpecs = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    // two windows: local (pid, lang) top-k then merge over survivors
    assert(winSpecs.size >= 2, p)
    assert(winSpecs.exists(_.contains("pid")), s"no (pid, lang) stage-1 window:\n$p")
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("J5 r10: pattern comprehension compiles to the aggregated semi-join shape") {
    // the [(p)-[:T]->(x) | expr] term must plan as walk → aggregate →
    // equi-join-back (the COUNT{} shape) — never a nested-loop or
    // cartesian pairing of the outer frame with the pattern matches
    val (n, e) = graft.graph.SysmonGraph.buildCached(spark,
      "/root/reference/malware/*.json")
    val df = graft.graph.CypherLite.run(n, e,
      "MATCH (p:Process) RETURN p, [(p)-[:CREATED_FILE]->(f:File) | f] AS fs")
    val pl = plan(df)
    assert(!pl.contains("CartesianProduct") &&
      !pl.contains("BroadcastNestedLoopJoin"), pl)
    assert(pl.linesIterator.count(_.contains("HashAggregate")) >= 2,
      s"expected partial+final aggregation of the comprehension:\n$pl")
  }

  test("B13w r10: ssspPathsFrom round plan is equi-join + keyed struct-min, no cartesian") {
    import spark.implicits._
    val g = Seq(("a", "b", 1.0), ("b", "c", 2.0), ("a", "c", 5.0))
      .toDF("src", "dst", "w")
    val out = graft.graph.GraphOps.ssspPathsFrom(g, Seq("a").toDF("id"), maxIter = 3)
    val pl = plan(out)
    assert(!pl.contains("CartesianProduct") &&
      !pl.contains("BroadcastNestedLoopJoin"), pl)
  }

  test("P6 r11: scaleProperties is one moments pass broadcast back, no shuffle of the data") {
    import spark.implicits._
    val df = Seq(1.0, 2.0, 3.0).toDF("x")
    val out = graft.operators.Curation.scaleProperties(df, Seq("x"), "stdScore")
    val pl = plan(out)
    // the 1-row stats join is the intended broadcast-nested-loop cross;
    // the data side must NOT shuffle (no Exchange hashpartitioning)
    assert(pl.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) == 1, pl)
    assert(!pl.contains("Exchange hashpartitioning"), pl)
  }

  test("F9 r12: redaction is a pure projection — scans documents, no shuffle, no join") {
    val out = graft.operators.TextAnalysis.f9Redact(spark, sf)
    val pl = plan(out)
    assert(!pl.contains("Exchange hashpartitioning"), pl)
    assert(!pl.contains("Join"), pl)
  }

  test("B32 r12: conductance attaches the total via broadcast; no second data pass") {
    import spark.implicits._
    val e = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val asg = Seq(("a", "x"), ("b", "x"), ("c", "y")).toDF("id", "community")
    // reclaim = false keeps the full lazy plan for inspection (the
    // JaccardJoin audit convention)
    val out = graft.graph.GraphOps.conductance(e, asg, reclaim = false)
    val pl = plan(out)
    // the 1-row total joins as a broadcast nested loop (the P6 shape)
    assert(pl.contains("BroadcastNestedLoopJoin"), pl)
  }

  test("B12k r13: nodeSimilarityTopK is two-stage — the first rank window " +
      "partitions on (id, bucket), never id alone") {
    import spark.implicits._
    val e = Seq(("p1", "x"), ("p1", "y"), ("p2", "x"), ("p2", "y"),
      ("p3", "y")).toDF("src", "dst")
    val pl = plan(graft.graph.GraphOps.nodeSimilarityTopK(e, 0.1, topK = 2))
    val windows = pl.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.nonEmpty, pl)
    // the staged prune: at least one window keyed on the hash bucket;
    // the r12 single Window.partitionBy(id) had none
    assert(windows.exists(_.contains("__bkt")),
      s"expected a (id, __bkt) pruning window:\n$pl")
  }

}
