package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints one JSON line {"metric":…,"queries":{…}}. Driver runs this
  * per-round at sf0.1 → BENCH_r{N}.json. */
object Bench {
  // Headline set: the shuffling/joining/iterating queries that dominate
  // cost at scale (not every correctness query).
  val headline: Seq[String] = Seq(
    "q1_agg", "q3_join", "q5_window", "q9_sort", "q11_asof", "q13_pivot",
    "q15_skew", "g_tree", "g_cc", "g_degree", "g_triangles", "d1_exact",
    "d2_minhash", "d4_jaccard", "d6_boilerplate", "e1_topk", "e2_ann",
    "f1_tokens", "f2_quality", "f7_decontam", "f8_repetition", "p5_weighted",
    // the iterative graph analytics (oracle-upgraded in r3)
    "g_pagerank", "g_kcore", "g_lpa", "g_eigen", "g_hits",
    // r4 centralities: multi-source-BFS closeness + Brandes betweenness
    "g_closeness", "g_betweenness",
    // r7: Louvain local-move + contraction rounds; FastRP embeddings
    // r8: Leiden = Louvain + connectivity refinement
    "g_louvain", "g_leiden", "g_fastrp",
    // IVF: quantizer training (distributed Lloyd) + probe search
    "e3_ivf",
    // r9: forced-distributed twins (localFinishEdges = 0) of the three
    // heaviest iterative families — every sf0.1 graph falls under the
    // local-finisher gate, so without these the bench would no longer
    // exercise the distributed plans that actually run at 100 TB
    "g_pagerank_dist", "g_betweenness_dist", "g_louvain_dist",
    // r10: the scale-hardened four-phase Dijkstra-Brandes, forced
    // distributed (dense-long keys + single running pending frame)
    "g_wbetweenness_dist",
    // the reference's core workload: full 1202-trace corpus → property
    // graph, rebuilt from the JSON every timed run
    "sg_build",
    // r12 additions (accounting note in SURVEY §7): the three new
    // shuffle/iteration-heavy operators — overlap-metric similarity
    // (min-side-prefix × full join), goal-directed A*, biased walks
    "g_nodesim_overlap", "g_astar", "g_node2vec",
    // r13 additions: Borůvka forest (min-agg + contraction rounds),
    // hashgnn (edge-join × K min-hash rounds), winnow-seeded
    // substring dedup (the D8 full pipeline on the synthesized corpus)
    "g_mst", "g_hashgnn", "d8_substr",
    // r14 additions: weighted LPA (always-distributed rounds), the
    // SemDeDup composition (kmeans + within-cluster pairs + CC), and
    // the BPE replace-chain scan (12 chained replaces per word)
    "g_wlpa", "d9_semdedup", "f10_bpe",
    // r14: distributed Tarjan-Vishkin biconnectivity (Borůvka forest +
    // Euler tour + list ranking + RMQ + aux-graph CC — the log-round
    // join stack that replaces the r13 local-only cut pass at scale),
    // SLLPA overlapping communities (5 edge×memory join rounds), and
    // the forced-distributed H-index coreness fixpoint
    "g_bicc", "g_sllpa", "g_kcoredec",
    // r15 additions: the wedge-join link-prediction suite, the
    // substring-dedup APPLY composition (spans → interval merge →
    // HOF splice), DSIR model fit + scoring, the KN trigram LM
    // (count tables + per-token probability joins), and node2vec
    // SGNS training (d-exploded dot/gradient joins × epochs)
    "g_linkpred", "d8_apply", "p7_dsir", "f11_ppl", "g_node2vec_emb",
    // r16 additions: articleRank power iteration, the flat modularity
    // move phase, the longest-path level DP, CN-weighted walk sampling
    // (triangle join + static interval index), IVF-PQ (subspace Lloyd
    // + ADC join + exact refine), and the CCNet composition (KN LM +
    // langid + DSIR + tercile thresholds)
    "g_articlerank", "g_modopt", "g_longestpath", "g_cnarw", "e8_pq",
    "p8_ccnet", "p9_pack")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    // an explicit query list as args = micro-bench mode (iterating on
    // one operator without paying for the whole headline set)
    val queries = if (args.nonEmpty) args.toSeq else headline
    val loadAtStart =
      try new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get("/proc/loadavg")),
          java.nio.charset.StandardCharsets.UTF_8)
        .split("\\s+").headOption.getOrElse("-1")
      catch { case _: Throwable => "-1" }
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup pass: JIT + codegen caches + file listing, untimed
    queries.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
      }
    }
    // min of three timed runs (this machine shows 2-3× wall-clock
    // swings from neighboring load — min-of-2 still caught a 6.7 s
    // outlier for a 2.1 s query; three samples bound the damage for
    // ~25 s extra total), escalating to five when the three disagree
    // by >1.5× (the r4 artifact recorded 2.8×/6.4× load outliers for
    // queries whose plans hadn't changed — extra samples only where
    // the variance proves the machine was busy); a failed query
    // reports -1.0, never a flattering partial time
    def timeOnce(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
      catch { case _: Throwable => -1.0 }
    }
    val results = queries.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        // operators persist intermediates internally; drop them between
        // queries so later measurements don't fight a full block store.
        // The GC matters too: localCheckpoint blocks (Borrow.reclaim,
        // iterative frontiers) are freed by the ContextCleaner only
        // when their RDDs are collected — without it they accumulate
        // across queries and push later persists to disk
        spark.catalog.clearCache()
        System.gc()
        val three = Seq(timeOnce(fn), timeOnce(fn), timeOnce(fn))
        val ts = if (three.exists(_ < 0) || three.max <= 1.5 * three.min) three
                 else three ++ Seq(timeOnce(fn), timeOnce(fn))
        name -> (if (ts.exists(_ < 0)) -1.0 else ts.min)
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // host fingerprint (r15, verdict task 8): the r13→r14 comparison
    // had to be adjudicated by diffstat argument because nothing
    // recorded the box state — emit cpu model hash, core count, and
    // the loadavg sampled at START (captured before the warmup pass
    // below would pollute it) so cross-round shifts are mechanically
    // attributable to environment vs code
    val host = {
      def slurp(p: String): String =
        try new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(p)), java.nio.charset.StandardCharsets.UTF_8)
        catch { case _: Throwable => "" }
      val model = slurp("/proc/cpuinfo").linesIterator
        .find(_.startsWith("model name")).map(_.split(":", 2).last.trim)
        .getOrElse("unknown")
      val cores = Runtime.getRuntime.availableProcessors()
      val load = slurp("/proc/loadavg").split("\\s+").headOption.getOrElse("-1")
      val memGb = Runtime.getRuntime.maxMemory() / (1024L * 1024 * 1024)
      // r16 (verdict task 10): `loaded` flags a noisy run so
      // cross-round tables can auto-exclude it instead of adjudicating
      // in prose — true when the box already carried more than
      // cores/4 runnable tasks BEFORE the warmup pass (r15 ran at
      // loadavg 6.85 on 32 cores and the verdict spent a paragraph on
      // it). SURVEY §8 documents the convention.
      val loaded =
        try loadAtStart.toDouble > cores / 4.0 catch { case _: Throwable => false }
      s"""{"cpuModelHash":"${Integer.toHexString(model.hashCode)}","cores":$cores,""" +
        s""""loadavgAtStart":$loadAtStart,"loadavgAtEnd":$load,"heapGb":$memGb,""" +
        s""""loaded":$loaded}"""
    }
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","host":$host}"""
    // pre-stop copy goes to STDERR (r13, advice): a consumer that greps
    // every {"metric":"total"...} stdout line must see exactly ONE —
    // the final post-stop line below — never a double-counted pair
    System.err.println(line)
    // r12: the driver's BENCH_r11.json recorded parsed:null — the JSON
    // line only survived interleaved in the sbt log tail. Persist it to
    // a file too so the artifact can be parsed structurally.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case e: Throwable =>
      System.err.println(s"bench: could not write $outPath: $e")
    }
    spark.stop()
    // last stdout line after the Spark shutdown chatter, for log-tail
    // parsers that take the final line
    println(line)
  }
}
