package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2/§6.
  *
  * Every oracle-checked capability has a `queries` entry and a matching
  * `oracleSql` entry with identical column names and value semantics
  * (doubles rounded, ints sized consistently: see Relational's
  * conventions). Non-SQL-expressible operators (LSH/ANN/PageRank/
  * fingerprints) appear in `queries` only → rows-only check, with
  * ScalaTest specs carrying their correctness story.
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q3Join(spark, "/root/testdata/sf0.001")

  /** Project LIST-valued result columns to JSON strings. The driver's
    * rows-only check sorts result values with pandas, which cannot
    * hash ndarray cells — so any driver row returning an array column
    * records NO rows (r10/r11 artifacts: `unhashable type:
    * numpy.ndarray` for sg_cypher10/11/12). The Cypher query still
    * computes and orders on the real lists; only the driver-facing
    * projection is stringified, so the gate records and hashes real
    * rows. */
  private def stringifyArrays(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, to_json}
    df.select(df.schema.fields.map { f =>
      f.dataType match {
        case _: org.apache.spark.sql.types.ArrayType =>
          to_json(col(f.name)).as(f.name)
        case _ => col(f.name)
      }
    }.toIndexedSeq: _*)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // C. relational core
    "q1_agg"       -> (Relational.q1Agg _),
    "q2_pushdown"  -> (Relational.q2Pushdown _),
    "q3_join"      -> (Relational.q3Join _),
    "q4_semi"      -> (Relational.q4Semi _),
    "q4_anti"      -> (Relational.q4Anti _),
    "q5_window"    -> (Relational.q5Window _),
    "q6_rollup"    -> (Relational.q6Rollup _),
    "q7_topk"      -> (Relational.q7Topk _),
    "q8_distinct"  -> (Relational.q8Distinct _),
    "q9_sort"      -> (Relational.q9Sort _),
    "q10_union"    -> (Relational.q10Union _),
    "q11_asof"     -> (Relational.q11Asof _),
    "q12_pctl"     -> (Relational.q12Pctl _),
    "q13_pivot"    -> (Relational.q13Pivot _),
    "q14_timeagg"  -> (Relational.q14Timeagg _),
    "q15_skew"     -> (Relational.q15Skew _),
    "q16_setops"   -> (Relational.q16Setops _),
    "q17_scalar"   -> (Relational.q17Scalar _),
    "q18_json"     -> (Relational.q18Json _),
    "q19_approx"   -> (Relational.q19Approx _),
    "q20_strings"  -> (Relational.q20Strings _),
    "q22_sessions" -> (Relational.q22Sessions _),
    "q23_range"    -> (Relational.q23Range _),
    "q24_rank"     -> (Relational.q24Rank _),
    "q25_rangeframe" -> (Relational.q25RangeFrame _),
    "m1_media"     -> ((s, d) => {
      import s.implicits._
      val n = graft.Tables.documents(s, d).count().toInt.min(500)
      graft.multimodal.Multimodal.extractFeatures(
        graft.multimodal.Multimodal.syntheticBlobs(s, n)).toDF()
        .select(org.apache.spark.sql.functions.col("media_id"),
          org.apache.spark.sql.functions.col("kind"),
          org.apache.spark.sql.functions.col("n_frames"))
    }),
    "q21_dates"    -> (Relational.q21Dates _),
    "f9_redact"    -> (TextAnalysis.f9Redact _),
    "f9_luhn"      -> (TextAnalysis.f9Luhn _), // r14: SSN + Luhn cards
    // r14 — F10: BPE-true token counts under the fixed merge table
    // (sql) + the distributed trainer's learned merges (rows)
    "f10_bpe"      -> ((s, d) => TextAnalysis.f10Bpe(s, d)),
    "f11_ppl"      -> (TextAnalysis.f11Ppl _), // r15: KN n-gram perplexity
    "f10_bpe_train" -> ((s, d) => TextAnalysis.f10BpeTrain(s, d)),
    "m2_mediasim"  -> ((s, d) => {
      val n = graft.Tables.documents(s, d).count().toInt.min(500)
      graft.multimodal.Multimodal.mediaTopK(
        graft.multimodal.Multimodal.syntheticBlobs(s, n), queryIds = Seq(0L, 1L, 2L))
    }),
    "p1_curate"    -> ((s, d) => Curation.curate(s, d)),
    "p2_split"     -> (Curation.hashSplit _),
    "p3_sample"    -> ((s, d) => Curation.stratifiedSample(s, d)),
    "p4_shards"    -> ((s, d) => Curation.packShards(s, d)),
    "p4_shards_bpe" -> ((s, d) => Curation.p4ShardsBpe(s, d)), // r16
    "p6_scale"     -> (Curation.p6Scale _),
    "p7_dsir"      -> (Curation.p7Dsir _), // r15: DSIR importance weights
    "p8_ccnet"     -> (Curation.p8Ccnet _), // r16: CCNet-composed pass
    "p9_pack"      -> ((s, d) => Curation.packSequences(s, d)), // r16
    "p1_curate_sql" -> (Curation.p1CurateSql _),
    "e6_knn"       -> ((s, d) => Similarity.e6Knn(s, d)),
    "f4_fp_sql"    -> ((s, d) => TextAnalysis.f4FingerprintSql(s, d)),
    // B. graph
    "g_lookup"     -> (GraphQueries.gLookup _),
    "g_motif"      -> (GraphQueries.gMotif _),
    "g_tree"       -> (GraphQueries.gTree _),
    "g_reach"      -> (GraphQueries.gReach _),
    "g_toposort"   -> (GraphQueries.gToposort _),
    "g_longestpath" -> (GraphQueries.gLongestpath _),
    "g_cc"         -> (GraphQueries.gCc _),
    "g_degree"     -> (GraphQueries.gDegree _),
    "g_wdegree"    -> (GraphQueries.gWDegree _),
    "g_topdeg"     -> (GraphQueries.gTopdeg _),
    "g_pagerank"   -> (GraphQueries.gPagerank _),
    "g_articlerank" -> (GraphQueries.gArticlerank _),
    // forced-distributed twins (localFinishEdges = 0): the plans that
    // run at 100 TB, bench-guarded now that sf0.1 graphs all fall
    // under the local-finisher gate; g_pagerank_dist shares
    // g_pagerank's oracle (the paths are equivalence-spec'd equal)
    "g_pagerank_dist" -> (GraphQueries.gPagerankDist _),
    "g_betweenness_dist" -> (GraphQueries.gBetweennessDist _),
    "g_louvain_dist" -> (GraphQueries.gLouvainDist _),
    "g_ppr"        -> (GraphQueries.gPpr _),
    "g_triangles"  -> (GraphQueries.gTriangles _),
    "g_sssp"       -> (GraphQueries.gSssp _),
    "g_nodesim"    -> (GraphQueries.gNodesim _),
    "g_nodesim_overlap" -> (GraphQueries.gNodesimOverlap _),
    "g_nodesim_cosine"  -> (GraphQueries.gNodesimCosine _),
    "g_nodesim_topk"    -> (GraphQueries.gNodesimTopK _),
    "g_paths"      -> (GraphQueries.gPaths _),
    "g_allpaths"   -> (GraphQueries.gAllPaths _),
    "g_louvain"    -> (GraphQueries.gLouvain _),
    "g_modopt"     -> (GraphQueries.gModopt _),
    "g_modopt_ok"  -> (GraphQueries.gModoptOk _),
    "g_modularity" -> (GraphQueries.gModularity _),
    "g_leiden"     -> (GraphQueries.gLeiden _),
    "g_fastrp"     -> (GraphQueries.gFastrp _),
    "sg_merge"     -> (GraphQueries.sgMerge _),
    "sg_delete"    -> (GraphQueries.sgDelete _),
    "sg_where"     -> (GraphQueries.sgWhere _),
    "sg_compose"   -> (GraphQueries.sgCompose _),
    "g_call"       -> (GraphQueries.gCall _),
    "g_eigen"      -> (GraphQueries.gEigen _),
    "g_hits"       -> (GraphQueries.gHits _),
    "g_wpagerank"  -> (GraphQueries.gWPagerank _),
    "g_lpa"        -> (GraphQueries.gLpa _),
    "g_wlpa"       -> (GraphQueries.gWLpa _), // r14: weighted LPA
    "g_clustercoef" -> (GraphQueries.gClusterCoef _),
    "g_closeness"  -> (GraphQueries.gCloseness _),
    "g_harmonic"   -> (GraphQueries.gHarmonic _),
    // hop-10 full run stays rows-only (bench entry); the hop-4 twin
    // below is DuckDB-gated via an unrolled level-by-level Brandes
    "g_betweenness" -> (GraphQueries.gBetweenness _),
    "g_betweenness_sql" -> (GraphQueries.gBetweennessSql _),
    // r10: the forced-distributed sweeps hash-gated too — hop-4
    // distributed Brandes vs the same unrolled CTE, and the
    // distributed Louvain vs the modularity quality floor
    "g_betweenness_dist_sql" -> (GraphQueries.gBetweennessDistSql _),
    "g_modularity_dist" -> (GraphQueries.gModularityDist _),
    "g_modularity_leiden" -> (GraphQueries.gModularityLeiden _),
    "g_wcloseness"  -> (GraphQueries.gWCloseness _),
    "g_wbetweenness" -> (GraphQueries.gWBetweenness _),
    "g_wbetweenness_dist" -> (GraphQueries.gWBetweennessDist _),
    "g_wpaths"     -> (GraphQueries.gWPaths _),
    "g_astar"      -> (GraphQueries.gAstar _),
    "g_conductance" -> (GraphQueries.gConductance _),
    "g_k1coloring" -> (GraphQueries.gK1Coloring _),
    "g_k1_valid"   -> (GraphQueries.gK1Valid _),
    "g_kpaths"     -> (GraphQueries.gKPaths _),
    "g_randomwalk" -> (GraphQueries.gRandomWalk _),
    "g_node2vec"   -> (GraphQueries.gNode2vec _),
    // r13: filtered nodeSimilarity, Borůvka MSF, cut structure,
    // hashgnn embeddings, exact substring dedup
    "g_nodesim_filtered" -> (GraphQueries.gNodesimFiltered _),
    "g_linkpred"   -> (GraphQueries.gLinkpred _), // r15: B44 link prediction
    "g_mst"        -> (GraphQueries.gMst _),
    "g_maxst"      -> (GraphQueries.gMaxst _), // r14: objective=maximum
    "g_kmst"       -> (GraphQueries.gKmst _),  // r14: kSpanningTree
    "g_steiner"    -> (GraphQueries.gSteiner _),
    "g_bellman"    -> (GraphQueries.gBellman _),
    "g_articulation" -> (GraphQueries.gArticulation _),
    "g_bridges"    -> (GraphQueries.gBridges _),
    "g_articulation_dist" -> (GraphQueries.gArticulationDist _), // r14: B41
    "g_bridges_dist" -> (GraphQueries.gBridgesDist _),           // r14: B41
    "g_bicc"       -> (GraphQueries.gBicc _),                    // r14: B41
    "g_hashgnn"    -> (GraphQueries.gHashgnn _),
    "g_hashgnn_ok" -> (GraphQueries.gHashgnnOk _),
    "g_node2vec_emb" -> (GraphQueries.gNode2vecEmb _), // r15: B45 SGNS vectors
    "g_n2v_ok"     -> (GraphQueries.gN2vOk _),         // r15: B45 invariants
    "g_rwr"        -> (GraphQueries.gRwr _),           // r15: B46 RWR sampling
    "g_cnarw"      -> (GraphQueries.gCnarw _),         // r16: B52 CNARW sampling
    "g_celf"       -> (GraphQueries.gCelf _),          // r15: B47 influence max
    "g_celf_ok"    -> (GraphQueries.gCelfOk _),        // r15: B47 invariants
    "g_maxkcut"    -> (GraphQueries.gMaxkcut _),       // r15: B48 max-k-cut
    "g_maxkcut_ok" -> (GraphQueries.gMaxkcutOk _),     // r15: B48 invariants
    "g_sllpa"      -> (GraphQueries.gSllpa _),   // r14: B42 overlapping
    "g_sllpa_ok"   -> (GraphQueries.gSllpaOk _), // r14: B42 invariants
    "g_kcoredec"   -> (GraphQueries.gKcoreDec _),   // r14: B43 coreness
    "g_kcoredec_ok" -> (GraphQueries.gKcoreDecOk _), // r14: B43 invariants
    "d8_substr"    -> (Dedup.d8Substr _),
    "d8_apply"     -> (Dedup.d8ApplyGate _), // r15: substring-dedup apply
    "g_kcore"      -> ((s, d) => GraphQueries.gKcore(s, d)),
    "g_dfs"        -> (GraphQueries.gDfs _), // r14: gds.dfs preorder
    "n1_nodemerge" -> (GraphQueries.n1NodeMerge _),
    "n2_edgemerge" -> (GraphQueries.n2EdgeMerge _),
    // reference-corpus graph queries (rows-only: the trace corpus is
    // fixed input, not derivable from sfDir, so no SQL oracle)
    "sg_summary"   -> ((s, _) => {
      val (n, e) = graft.graph.SysmonGraph.buildCached(s, "/root/reference/malware/*.json")
      graft.graph.Detections.summary(n, e)
    }),
    // full reference-corpus ETL (the reference's core workload): fresh
    // build each call (deliberately NOT buildCached) → per-label/type
    // counts. Bench times this; Verify records rows.
    "sg_build"     -> ((s, _) => {
      import org.apache.spark.sql.functions._
      val (n, e) = graft.graph.SysmonGraph.build(s, "/root/reference/malware/*.json")
      n.groupBy(col("label").as("kind")).agg(count(lit(1)).as("n"))
        .unionByName(e.groupBy(col("etype").as("kind")).agg(count(lit(1)).as("n")))
        .orderBy(col("kind"))
    }),
    "sg_ppr"       -> ((s, _) => {
      import org.apache.spark.sql.functions._
      val (_, e) = graft.graph.SysmonGraph.buildCached(s, "/root/reference/malware/*.json")
      val hp = e.filter(col("etype") === "HAS_PROCESS")
      // seeds: processes of the lexicographically-first trace (deterministic)
      val seeds = hp.join(hp.agg(min(col("src")).as("src")), Seq("src"))
        .select(col("dst").as("id"))
      graft.graph.GraphOps.personalizedPageRank(
          e.select(col("src"), col("dst")), seeds, iters = 10)
        .filter(col("rank") > 0)
        .select(col("id"), round(col("rank"), 6).as("rank"))
        .orderBy(col("rank").desc, col("id")).limit(25)
    }),
    "sg_cypher"    -> ((s, _) => {
      val (n, e) = graft.graph.SysmonGraph.buildCached(s, "/root/reference/malware/*.json")
      graft.graph.CypherLite.run(n, e,
        "MATCH (t:Trace)-[:HAS_PROCESS]->(p:Process)-[:CONNECTED_TO]->(ip:Ip) " +
          "WHERE p.image ENDS WITH '.exe' RETURN DISTINCT t, ip")
        .orderBy(org.apache.spark.sql.functions.col("t"),
          org.apache.spark.sql.functions.col("ip"))
    }),
    // the r3 Cypher surface end-to-end: WITH pipeline (aggregate +
    // having) feeding a second MATCH — beacon fan-out per process,
    // joined back to traces, purely textual
    "sg_cypher2"   -> ((s, _) => {
      val (n, e) = graft.graph.SysmonGraph.buildCached(s, "/root/reference/malware/*.json")
      graft.graph.CypherLite.run(n, e,
        "MATCH (p:Process)-[:CONNECTED_TO]->(ip:Ip) " +
          "WITH p, count(*) AS n_ips WHERE n_ips >= 2 " +
          "MATCH (t:Trace)-[:HAS_PROCESS]->(p) " +
          "RETURN DISTINCT t, p, n_ips ORDER BY n_ips DESC, t, p")
    }),
    // the expression surface end-to-end: arithmetic + coercion in
    // WHERE (non-ephemeral high ports) and prop-to-prop equality
    // (self-image spawns), purely textual
    "sg_cypher3"   -> ((s, _) => {
      val (n, e) = graft.graph.SysmonGraph.buildCached(s, "/root/reference/malware/*.json")
      graft.graph.CypherLite.run(n, e,
        "MATCH (p:Process)-[r:CONNECTED_TO]->(ip:Ip) " +
          "WHERE (toInteger(r.dport) + 1) * 2 > 500 " +
          "RETURN DISTINCT p, ip, r.dport ORDER BY p, ip")
    }),
    // pattern predicates end-to-end: spawning processes that never
    // beacon (exists + NOT exists → semi/anti shapes)
    "sg_cypher4"   -> ((s, _) => {
      val (n, e) = graft.graph.SysmonGraph.buildCached(s, "/root/reference/malware/*.json")
      graft.graph.CypherLite.run(n, e,
        "MATCH (t:Trace)-[:HAS_PROCESS]->(p:Process) " +
          "WHERE exists((p)-[:SPAWNS]->()) AND NOT exists((p)-[:CONNECTED_TO]->()) " +
          "RETURN DISTINCT t, p ORDER BY t, p")
    }),
    // the r4 Cypher surface end-to-end: DISTINCT aggregate, quantified
    // predicate, list comprehension + reduce, CASE, IN, ORDER BY —
    // beacon port profile per process, purely textual
    "sg_cypher5"   -> ((s, _) => {
      val (n, e) = graft.graph.SysmonGraph.buildCached(s, "/root/reference/malware/*.json")
      graft.graph.CypherLite.run(n, e,
        "MATCH (p:Process)-[r:CONNECTED_TO]->(ip:Ip) " +
          "WITH p, collect(DISTINCT toInteger(r.dport)) AS ports, count(*) AS n " +
          "WHERE any(x IN ports WHERE x > 1024) " +
          "RETURN p, n, size([x IN ports WHERE x > 1024]) AS high, " +
          "reduce(acc = 0, x IN ports | acc + x) AS port_sum, " +
          "CASE WHEN size(ports) > 1 THEN 'multi' ELSE 'single' END AS kind " +
          "ORDER BY p")
    }),
    // r5: Cypher-5 brace subqueries with inner WHERE + UNION between
    // full queries — the triage idioms a Neo4j-5 analyst writes verbatim
    "sg_cypher6"   -> ((s, _) => {
      val (n, e) = graft.graph.SysmonGraph.buildCached(s, "/root/reference/malware/*.json")
      graft.graph.CypherLite.run(n, e,
        "MATCH (p:Process) " +
          "WHERE EXISTS { MATCH (p)-[r:CONNECTED_TO]->(i) WHERE r.dport = '443' } " +
          "RETURN DISTINCT p, 'https' AS why, " +
          "COUNT { (p)-[c:CONNECTED_TO]->(x) WHERE c.dport = '443' } AS hits " +
          "UNION " +
          "MATCH (p:Process)-[:INJECTED_THREAD]->() " +
          "RETURN DISTINCT p, 'inject' AS why, " +
          "COUNT { (p)-[:INJECTED_THREAD]->(x) } AS hits " +
          "ORDER BY p")
    }),
    "sg_cypher7"   -> ((s, _) => {
      // inline property maps — the reference's own MERGE idiom
      // (events.py:75-257): node {image:} + edge {dport:} constraints
      // compile to filters pushed into the node/edge scans
      val (n, e) = graft.graph.SysmonGraph.buildCached(s, "/root/reference/malware/*.json")
      graft.graph.CypherLite.run(n, e,
        "MATCH (t:Trace)-[:HAS_PROCESS]->(p:Process)" +
          "-[r:CONNECTED_TO {dport: '443'}]->(ip:Ip) " +
          "RETURN DISTINCT t, p, ip ORDER BY t, p, ip")
    }),
    "sg_cypher8"   -> ((s, _) => {
      // CALL { … } subquery composition (Cypher-5): the post-UNION
      // aggregation idiom — collect two dropped-artifact populations,
      // then aggregate over the COMBINED rows (plain UNION's RETURN is
      // per-part, so this is inexpressible without the subquery)
      val (n, e) = graft.graph.SysmonGraph.buildCached(s, "/root/reference/malware/*.json")
      graft.graph.CypherLite.run(n, e,
        """CALL {
          |  MATCH (p:Process)-[:CREATED_FILE]->(f:File) RETURN p, f AS obj
          |  UNION
          |  MATCH (p:Process)-[:SET_REG_VALUE]->(rv:RegistryValue) RETURN p, rv AS obj
          |}
          |RETURN p, count(obj) AS artifacts ORDER BY artifacts DESC, p LIMIT 25""".stripMargin)
    }),
    "sg_cypher9"   -> ((s, _) => {
      // mid-query CORRELATED CALL subquery (Cypher-5): per-injected-
      // process beacon counts with Cypher's zero-fill — the injected
      // process keeps its row even when it never connected out
      val (n, e) = graft.graph.SysmonGraph.buildCached(s, "/root/reference/malware/*.json")
      graft.graph.CypherLite.run(n, e,
        """MATCH (p:Process)-[:INJECTED_THREAD]->(q:Process)
          |CALL { WITH q MATCH (q)-[:CONNECTED_TO]->(ip:Ip) RETURN count(ip) AS beacons }
          |RETURN p, q, beacons ORDER BY beacons DESC, p, q""".stripMargin)
    }),
    "sg_cypher10"  -> ((s, _) => {
      // r10: edge variables on VAR-LENGTH hops — the spawn-chain edge
      // list bound as `r`, per-path rows (Neo4j multiplicity), the
      // chain length read with size(r) and the first hop with head(r)
      val (n, e) = graft.graph.SysmonGraph.buildCached(s, "/root/reference/malware/*.json")
      stringifyArrays(graft.graph.CypherLite.run(n, e,
        """MATCH (a:Process)-[r:SPAWNS*2..3]->(b:Process)
          |RETURN a, b, size(r) AS hops, head(r) AS first_spawn, r
          |ORDER BY a, b, hops, r LIMIT 200""".stripMargin))
    }),
    "sg_cypher11"  -> ((s, _) => {
      // r10: pattern comprehension + simple CASE + list subscript in
      // one corpus query — per-trace process list, its first element,
      // and a CASE-classified beacon count
      val (n, e) = graft.graph.SysmonGraph.buildCached(s, "/root/reference/malware/*.json")
      stringifyArrays(graft.graph.CypherLite.run(n, e,
        """MATCH (t:Trace)
          |RETURN t, [(t)-[:HAS_PROCESS]->(q:Process) | q] AS procs,
          |  [(t)-[:HAS_PROCESS]->(q:Process) | q][0] AS first_proc,
          |  CASE size([(t)-[:HAS_PROCESS]->(q:Process)-[:CONNECTED_TO]->(ip:Ip) | ip])
          |    WHEN 0 THEN 'quiet' ELSE 'beacons' END AS net
          |ORDER BY t LIMIT 300""".stripMargin))
    }),
    "sg_cypher12"  -> ((s, _) => {
      // r11: the Cypher-5 pattern-surface tail in one corpus query —
      // label expression (File|RegistryKey), inline pattern predicate,
      // type disjunction, COLLECT{} subquery, and a quantified path
      // pattern spelling of the spawn chain
      val (n, e) = graft.graph.SysmonGraph.buildCached(s, "/root/reference/malware/*.json")
      stringifyArrays(graft.graph.CypherLite.run(n, e,
        """MATCH (p:Process WHERE p.image ENDS WITH '.exe')-[:SPAWNS]->{1,2}(q:Process)
          |RETURN p, q,
          |  COLLECT { MATCH (q)-[:CREATED_FILE|SET_REG_VALUE]->(x:File|RegistryValue)
          |            RETURN x } AS artifacts
          |ORDER BY p, q LIMIT 300""".stripMargin))
    }),
    "sg_spawntree" -> ((s, _) => {
      val (_, e) = graft.graph.SysmonGraph.buildCached(s, "/root/reference/malware/*.json")
      graft.graph.Detections.deepSpawnChains(e, minDepth = 1)
        .groupBy(org.apache.spark.sql.functions.col("dist"))
        .count().orderBy(org.apache.spark.sql.functions.col("dist"))
    }),
    // D. dedup
    "d1_exact"     -> (Dedup.d1Exact _),
    "d2_minhash"   -> ((s, d) => Dedup.d2MinhashLsh(s, d)),
    "d3_simhash"   -> ((s, d) => Dedup.d3Simhash(s, d)),
    "d4_jaccard"   -> ((s, d) => Dedup.d4Jaccard(s, d)),
    // d5_embdup = the exact twin (oracle-checkable); d5_lsh = the LSH-
    // candidate scale path (rows-only: recall < 1 by design, spec-bound)
    "d5_embdup"    -> ((s, d) => Dedup.d5EmbDupExact(s, d)),
    // near-dup cluster assignment: CC over the d4 pair graph
    "d7_clusters"  -> ((s, d) => Dedup.d7DupClusters(s, d)),
    "d5_lsh"       -> ((s, d) => Dedup.d5EmbDup(s, d)),
    // sketch-banded candidate variant (deterministic pigeonhole recall
    // condition on the 64-bit sign sketch); rows-only like d5_lsh
    "d5_simhash"   -> ((s, d) => Dedup.d5EmbDupSimhash(s, d)),
    // r14 — D9 SemDeDup: the kmeans-composed pass on the real corpus
    // (rows-only), the closed-form planted twin (hash-gated end to
    // end), and the invariant flags (oracle pins 1s)
    "d9_semdedup"  -> ((s, d) => Dedup.d9SemDedup(s, d)),
    "d9_planted"   -> ((s, d) => Dedup.d9Planted(s, d)),
    "d9_gate"      -> ((s, d) => Dedup.d9SoundGate(s, d)),
    // E. similarity search
    "e1_topk"      -> ((s, d) => Similarity.e1TopK(s, d)),
    "e2_ann"       -> ((s, d) => Similarity.e2AnnTopK(s, d)),
    // IVF path (rows-only: nprobe < nlist trades recall by design;
    // recall + determinism are spec-bound, the Lloyd step plan-audited)
    "e3_ivf"       -> ((s, d) => Similarity.e3IvfTopK(s, d)),
    // r16: IVF-PQ — codes-only ADC scoring (rows-only: float-order
    // sums; the e8_recall_ok floor in e_recall is the quality gate)
    "e8_pq"        -> ((s, d) => Similarity.e8PqIvf(s, d)),
    "e_recall"     -> ((s, d) => Similarity.eRecallGate(s, d)),
    "e7_kmeans"    -> ((s, d) => Similarity.e7Kmeans(s, d)),
    "g_tri_enum"   -> (GraphQueries.gTriEnum _),
    "d_recall"     -> ((s, d) => Dedup.dRecallGate(s, d)),
    "e4_radius"    -> ((s, d) => Similarity.e4Radius(s, d)),
    // kNN majority-label prediction (weak labeling); exact-scan kNN is
    // oracle-checkable, the scale path swaps in the E2 candidate set
    "e5_knnlabel"  -> ((s, d) => Similarity.e5KnnLabel(s, d)),
    // F. text analysis
    "f1_tokens"    -> (TextAnalysis.f1Tokens _),
    "f2_quality"   -> (TextAnalysis.f2Quality _),
    "f3_langid"    -> (TextAnalysis.f3LangId _),
    "f4_fingerprint" -> ((s, d) => TextAnalysis.f4Fingerprint(s, d)),
    "f5_corpus"    -> (TextAnalysis.f5Corpus _),
    "f6_ngrams"    -> ((s, d) => TextAnalysis.f6TopNgrams(s, d)),
    "f7_decontam"  -> ((s, d) => TextAnalysis.f7Decontam(s, d)),
    "f8_repetition" -> ((s, d) => TextAnalysis.f8Repetition(s, d)),
    "d6_boilerplate" -> ((s, d) => Dedup.d6Boilerplate(s, d)),
    "p5_weighted"  -> ((s, d) => Curation.p5WeightedSample(s, d)),
  )

  /** DuckDB twins of the SQL-expressible queries above. */
  private val pagerankOracle: String =
    """WITH RECURSIVE e AS (
      |  SELECT DISTINCT src, dst FROM (
      |    SELECT 'p:'||l_partkey AS src, 's:'||l_suppkey AS dst FROM lineitem WHERE l_partkey % 20 = 0
      |    UNION ALL
      |    SELECT 's:'||l_suppkey, 'p:'||l_partkey FROM lineitem WHERE l_partkey % 20 = 0)),
      |v AS (SELECT DISTINCT src AS id FROM e),
      |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
      |pr AS (
      |  SELECT 0 AS it, id, CAST(1.0 AS DOUBLE) AS rank FROM v
      |  UNION ALL
      |  SELECT it+1, dst AS id, 0.15 + 0.85*msum AS rank FROM (
      |    SELECT p.it AS it, e.dst AS dst, sum(p.rank/deg.deg) AS msum
      |    FROM pr p JOIN e ON e.src = p.id JOIN deg ON deg.src = e.src
      |    WHERE p.it < 10 GROUP BY 1,2) s)
      |SELECT id, round(rank,4) AS rank FROM pr WHERE it=10
      |ORDER BY rank DESC, id LIMIT 20""".stripMargin

  /** B49 articleRank twin: the pagerank oracle with the GDS divisor
    * `deg + avg_out_degree` (avg = |E|/|V| over the distinct
    * symmetrized edge set — every vertex counts, danglers included). */
  private val articlerankOracle: String =
    """WITH RECURSIVE e AS (
      |  SELECT DISTINCT src, dst FROM (
      |    SELECT 'p:'||l_partkey AS src, 's:'||l_suppkey AS dst FROM lineitem WHERE l_partkey % 20 = 0
      |    UNION ALL
      |    SELECT 's:'||l_suppkey, 'p:'||l_partkey FROM lineitem WHERE l_partkey % 20 = 0)),
      |v AS (SELECT DISTINCT src AS id FROM e),
      |avgdeg AS (SELECT count(*)*1.0/(SELECT count(*) FROM v) AS a FROM e),
      |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
      |pr AS (
      |  SELECT 0 AS it, id, CAST(1.0 AS DOUBLE) AS rank FROM v
      |  UNION ALL
      |  SELECT it+1, dst AS id, 0.15 + 0.85*msum AS rank FROM (
      |    SELECT p.it AS it, e.dst AS dst, sum(p.rank/(deg.deg + avgdeg.a)) AS msum
      |    FROM pr p JOIN e ON e.src = p.id JOIN deg ON deg.src = e.src CROSS JOIN avgdeg
      |    WHERE p.it < 10 GROUP BY 1,2) s)
      |SELECT id, round(rank,4) AS rank FROM pr WHERE it=10
      |ORDER BY rank DESC, id LIMIT 20""".stripMargin

  /** Level-unrolled Brandes oracle, GENERATED for any hop bound:
    * forward σ-levels l0..lN (σ_v = Σ over depth-(d−1) predecessors,
    * anti-joined against the two prior levels — the undirected-graph
    * dedup rule), backward δ sweep dN−1..d1 (δ_u = σ_u·Σ (1+δ_w)/σ_w).
    * Halved (undirected), tie-safe floor-nudge rounding. Every level
    * is `AS MATERIALIZED` — DuckDB inlines plain CTEs, and each level
    * references two prior levels, so un-materialized unrolling
    * re-scans exponentially (hop-10 exhausted file handles before the
    * r10 switch). Shared by the hop-4 gates (`g_betweenness_sql`,
    * `g_betweenness_dist_sql`) and — r10 — the full hop-10 runs
    * (`g_betweenness`, `g_betweenness_dist`), which moves the two
    * last graph rows-only bench entries onto real hash gates. */
  private def betweennessOracle(maxHops: Int): String = {
    val header =
      """WITH e0 AS MATERIALIZED (
        |  SELECT DISTINCT 'p:'||l_partkey AS src, 's:'||l_suppkey AS dst
        |  FROM lineitem WHERE l_partkey % 20 = 0),
        |e AS MATERIALIZED (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
        |v AS MATERIALIZED (SELECT DISTINCT src AS id FROM e),
        |r AS MATERIALIZED (SELECT DISTINCT 'p:'||l_partkey AS id FROM lineitem WHERE l_partkey % 200 = 0),
        |l0 AS MATERIALIZED (SELECT r.id AS root, r.id AS id, CAST(1 AS DOUBLE) AS sigma
        |       FROM r JOIN v USING (id))""".stripMargin
    val fwd = (1 to maxHops).map { k =>
      val anti = Seq(k - 2, k - 1).filter(_ >= 0)
        .map(j => s"NOT EXISTS (SELECT 1 FROM l$j p WHERE p.root = f.root AND p.id = f.id)")
        .mkString("\n       WHERE ", "\n         AND ", "")
      s"""f$k AS MATERIALIZED (SELECT l.root, e.dst AS id, sum(l.sigma) AS sigma
         |       FROM l${k - 1} l JOIN e ON e.src = l.id GROUP BY 1, 2),
         |l$k AS MATERIALIZED (SELECT f.* FROM f$k f$anti)""".stripMargin
    }
    val bwd = (maxHops - 1 to 1 by -1).map { k =>
      if (k == maxHops - 1)
        s"""d$k AS MATERIALIZED (SELECT u.root, u.id, u.sigma * sum(1.0 / w.sigma) AS delta
           |       FROM l$k u JOIN e ON e.src = u.id
           |       JOIN l${k + 1} w ON w.root = u.root AND w.id = e.dst
           |       GROUP BY 1, 2, u.sigma)""".stripMargin
      else
        s"""d$k AS MATERIALIZED (SELECT u.root, u.id,
           |         u.sigma * sum((1.0 + coalesce(d.delta, 0.0)) / w.sigma) AS delta
           |       FROM l$k u JOIN e ON e.src = u.id
           |       JOIN l${k + 1} w ON w.root = u.root AND w.id = e.dst
           |       LEFT JOIN d${k + 1} d ON d.root = u.root AND d.id = w.id
           |       GROUP BY 1, 2, u.sigma)""".stripMargin
    }
    val union = (1 until maxHops).map(k => s"SELECT * FROM d$k").mkString(" UNION ALL ")
    val tail =
      s"""b AS (SELECT id, sum(delta) AS b FROM (
         |        $union)
         |      WHERE id <> root GROUP BY id)
         |SELECT id, floor(b / 2 * 1000000 + 0.5) / 1000000 AS betweenness
         |FROM b WHERE floor(b / 2 * 1000000 + 0.5) / 1000000 > 0
         |ORDER BY id""".stripMargin
    (Seq(header) ++ fwd ++ bwd :+ tail).mkString(",\n")
  }
  private val betweennessHop4Oracle: String = betweennessOracle(4)
  private val betweennessHop10Oracle: String = betweennessOracle(10)

  /** Modularity of the SQL-replayable LPA partition (Q = internal/2m −
    * Σtot²/(2m)² from exact integer counts) + the louvain≥lpa quality
    * floor pinned to 1 — shared by `g_modularity` (local-finisher
    * louvain) and `g_modularity_dist` (forced-distributed louvain). */
  /** Weighted shortest-path EXTRACTION oracle (`g_wpaths`): the
    * round-synchronous Bellman-Ford with path carry UNROLLED — stage
    * s_k is the full (root, id, best-dist, greedy-path) state after k
    * rounds; x_k holds the round's extension candidates reduced to the
    * within-round struct-min (dist, path) by window; the s_k merge
    * applies the STRICT-improvement acceptance (fewest-hops
    * preference). Full-state unrolling is provably identical to the
    * engine's frontier version (a stale candidate can never win an
    * accepting round — its value was already ≤-matched when first
    * offered), so this replays the engine's determinism rule exactly —
    * a plain "min over all walks" oracle would diverge on reconvergent
    * tie shapes where the per-round greedy path is not the global
    * lexicographic minimum. */
  private val wPathsOracle: String = wPathsOracleSql("")

  // r12: g_astar reuses the SAME unrolled Bellman-Ford replay filtered
  // to its pinned pair — A*'s contract is a bit-identical dijkstra row
  private def wPathsStages: String =
    (1 to 6).map { k =>
      s"""x$k AS (SELECT s.root, e.dst AS id, s.d + e.w AS d,
         |       s.path || '>' || e.dst AS path
         |     FROM s${k - 1} s JOIN e ON s.id = e.src
         |     QUALIFY row_number() OVER (PARTITION BY s.root, e.dst
         |       ORDER BY s.d + e.w, s.path || '>' || e.dst) = 1),
         |s$k AS (SELECT coalesce(p.root, x.root) AS root,
         |       coalesce(p.id, x.id) AS id,
         |       CASE WHEN p.d IS NULL OR x.d < p.d THEN x.d ELSE p.d END AS d,
         |       CASE WHEN p.d IS NULL OR x.d < p.d THEN x.path ELSE p.path END AS path
         |     FROM s${k - 1} p FULL JOIN x$k x ON p.root = x.root AND p.id = x.id)""".stripMargin
    }.mkString(",\n")

  private def wPathsOracleSql(where: String): String =
    s"""WITH base AS (
       |  SELECT DISTINCT 'p:'||l_partkey AS a, 's:'||l_suppkey AS b,
       |    CAST((l_partkey + l_suppkey) % 5 + 1 AS BIGINT) AS w
       |  FROM lineitem WHERE l_partkey % 20 = 0),
       |e AS (SELECT a AS src, b AS dst, w FROM base UNION SELECT b, a, w FROM base),
       |r AS (SELECT DISTINCT b AS id FROM base WHERE CAST(substr(b, 3) AS INT) % 40 = 0),
       |s0 AS (SELECT id AS root, id, CAST(0 AS DOUBLE) AS d, id AS path FROM r),
       |$wPathsStages
       |SELECT root, id, d AS dist, path FROM s6 $where ORDER BY root, id""".stripMargin

  // B38 (r13): the steiner oracle UNIONS the same tie-broken oracle
  // paths (single root s:40, the three pinned targets) and explodes
  // them to traversal edges — path-exact, so the edge set is forced
  private def steinerOracleSql: String =
    s"""WITH base AS (
       |  SELECT DISTINCT 'p:'||l_partkey AS a, 's:'||l_suppkey AS b,
       |    CAST((l_partkey + l_suppkey) % 5 + 1 AS BIGINT) AS w
       |  FROM lineitem WHERE l_partkey % 20 = 0),
       |e AS (SELECT a AS src, b AS dst, w FROM base UNION SELECT b, a, w FROM base),
       |s0 AS (SELECT 's:40' AS root, 's:40' AS id, CAST(0 AS DOUBLE) AS d,
       |       's:40' AS path),
       |$wPathsStages,
       |fin AS (SELECT path FROM s6 WHERE id IN ('p:20', 'p:40', 'p:60')),
       |toks AS (SELECT path, unnest(string_split(path, '>')) AS node,
       |    unnest(generate_series(1, len(string_split(path, '>')))) AS i
       |  FROM fin),
       |steps AS (SELECT path, node, i,
       |    lead(node) OVER (PARTITION BY path ORDER BY i) AS nxt FROM toks),
       |te AS (SELECT DISTINCT node AS src, nxt AS dst FROM steps
       |  WHERE nxt IS NOT NULL)
       |SELECT te.src, te.dst, e.w AS w
       |FROM te JOIN e ON te.src = e.src AND te.dst = e.dst
       |ORDER BY 1, 2""".stripMargin

  /** F10 oracle (r14): GENERATED from the same
    * [[TextAnalysis.f10Merges]] table the Spark side applies, so the
    * two can't drift — per word the identical chr(1)-separator encode,
    * the identical replace chain in rank order, the identical
    * symbol-count, summed per document. */
  private val f10BpeOracle: String = {
    val enc =
      "chr(1) || array_to_string(string_split(w, ''), chr(1)||chr(1)) || chr(1)"
    val merged = graft.operators.TextAnalysis.f10Merges.foldLeft(enc) {
      case (acc, (a, b)) =>
        s"replace($acc, chr(1)||'$a'||chr(1)||chr(1)||'$b'||chr(1), " +
          s"chr(1)||'$a$b'||chr(1))"
    }
    s"""WITH w AS (SELECT doc_id,
       |    unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
       |  FROM documents),
       |t AS (SELECT doc_id,
       |    len(string_split($merged, chr(1)||chr(1))) AS t
       |  FROM w WHERE w <> '')
       |SELECT doc_id, CAST(sum(t) AS BIGINT) AS n_tokens
       |FROM t GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** r16: the f10 merge-chain counts COMPOSED with the p4 prefix-sum
    * pack — tokenizer-true shard budgets, generated from the same
    * merge table so the two sides cannot drift. */
  private val p4ShardsBpeOracle: String = {
    val enc =
      "chr(1) || array_to_string(string_split(w, ''), chr(1)||chr(1)) || chr(1)"
    val merged = graft.operators.TextAnalysis.f10Merges.foldLeft(enc) {
      case (acc, (a, b)) =>
        s"replace($acc, chr(1)||'$a'||chr(1)||chr(1)||'$b'||chr(1), " +
          s"chr(1)||'$a$b'||chr(1))"
    }
    s"""WITH w AS (SELECT doc_id,
       |    unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
       |  FROM documents),
       |bt AS (SELECT doc_id,
       |    len(string_split($merged, chr(1)||chr(1))) AS t
       |  FROM w WHERE w <> ''),
       |t0 AS (SELECT doc_id, CAST(sum(t) AS BIGINT) AS n_tokens
       |  FROM bt GROUP BY doc_id),
       |t AS (SELECT d.doc_id, coalesce(t0.n_tokens, 0) AS n_tokens
       |  FROM (SELECT doc_id FROM documents) d LEFT JOIN t0 USING (doc_id)),
       |c AS (SELECT doc_id, n_tokens,
       |  coalesce(sum(n_tokens) OVER (ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 2000 AS shard
       |  FROM t)
       |SELECT CAST(shard AS BIGINT) AS shard, count(*) AS n_docs,
       | CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
       | min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM c GROUP BY 1 ORDER BY 1""".stripMargin
  }

  private val modularityOracle: String =
      """WITH RECURSIVE e AS (
        |  SELECT DISTINCT src, dst FROM (
        |    SELECT 'p:'||l_partkey AS src, 's:'||l_suppkey AS dst FROM lineitem WHERE l_partkey % 20 = 0
        |    UNION ALL
        |    SELECT 's:'||l_suppkey, 'p:'||l_partkey FROM lineitem WHERE l_partkey % 20 = 0)),
        |v AS (SELECT DISTINCT src AS id FROM e),
        |lp AS (
        |  SELECT 0 AS it, id, id AS community FROM v
        |  UNION ALL
        |  SELECT it+1 AS it, dst AS id, community FROM (
        |    SELECT p.it AS it, e.dst AS dst, p.community AS community, count(*) AS cnt
        |    FROM lp p JOIN e ON e.src = p.id
        |    WHERE p.it < 5 GROUP BY 1,2,3) c
        |  QUALIFY row_number() OVER (PARTITION BY it, dst ORDER BY cnt DESC, community) = 1),
        |assign AS (SELECT id, community FROM lp WHERE it = 5),
        |m AS (SELECT CAST(count(*) AS DOUBLE) AS m2 FROM e),
        |i AS (SELECT CAST(count(*) AS DOUBLE) AS intw FROM e
        |      JOIN assign a1 ON a1.id = e.src JOIN assign a2 ON a2.id = e.dst
        |      WHERE a1.community = a2.community),
        |deg AS (SELECT src AS id, CAST(count(*) AS DOUBLE) AS k FROM e GROUP BY 1),
        |tot AS (SELECT a.community, sum(d.k) AS t FROM deg d JOIN assign a ON a.id = d.id GROUP BY 1),
        |t2 AS (SELECT sum(t*t) AS s FROM tot)
        |SELECT floor((i.intw/m.m2 - t2.s/(m.m2*m.m2)) * 1000000 + 0.5)/1000000 AS q_lpa,
        |       CAST(1 AS BIGINT) AS louvain_ge_lpa
        |FROM i, m, t2""".stripMargin

  /** Weighted Brandes oracle: walk-CTE distances → SP DAG → DAG-path
    * enumeration (≤ 6 edges, the engine's σ bound) → pair dependencies
    * Σ (paths through v)/σ_st — shared by `g_wbetweenness` (local
    * mirror) and `g_wbetweenness_dist` (four-phase distributed). */
  private val wBetweennessOracle: String =
      """WITH RECURSIVE base AS (
        |  SELECT DISTINCT 'p:'||l_partkey AS a, 's:'||l_suppkey AS b,
        |    CAST((l_partkey + l_suppkey) % 5 + 1 AS BIGINT) AS w
        |  FROM lineitem WHERE l_partkey % 20 = 0),
        |e AS (SELECT a AS src, b AS dst, w FROM base UNION SELECT b, a, w FROM base),
        |r AS (SELECT DISTINCT b AS id FROM base WHERE CAST(substr(b, 3) AS INT) % 40 = 0),
        |walk AS (
        |  SELECT id AS root, id, CAST(0 AS DOUBLE) AS d, 0 AS hops FROM r
        |  UNION
        |  SELECT wk.root, e.dst, wk.d + e.w, wk.hops + 1
        |  FROM walk wk JOIN e ON wk.id = e.src WHERE wk.hops < 6),
        |dist AS (SELECT root, id, min(d) AS d FROM walk GROUP BY 1, 2),
        |dag AS (
        |  SELECT du.root, e.src AS u, e.dst AS v
        |  FROM e
        |  JOIN dist du ON du.id = e.src
        |  JOIN dist dv ON dv.root = du.root AND dv.id = e.dst
        |  WHERE du.d + e.w = dv.d),
        |dpath AS (
        |  SELECT id AS root, id, 0 AS hops, id AS path FROM r
        |  UNION ALL
        |  SELECT p.root, g.v, p.hops + 1, p.path || '>' || g.v
        |  FROM dpath p JOIN dag g ON g.root = p.root AND g.u = p.id
        |  WHERE p.hops < 6),
        |sig AS (SELECT root, id AS t, CAST(count(*) AS DOUBLE) AS sigma
        |        FROM dpath GROUP BY 1, 2),
        |ints AS (
        |  SELECT root, id AS t,
        |    UNNEST(list_slice(string_split(path, '>'), 2,
        |      len(string_split(path, '>')) - 1)) AS v
        |  FROM dpath),
        |thr AS (SELECT root, t, v, CAST(count(*) AS DOUBLE) AS cnt
        |        FROM ints GROUP BY 1, 2, 3),
        |bb AS (SELECT thr.v AS id, sum(thr.cnt / sig.sigma) AS b
        |       FROM thr JOIN sig ON sig.root = thr.root AND sig.t = thr.t
        |       GROUP BY 1)
        |SELECT id, floor(b / 2 * 1000000 + 0.5) / 1000000 AS betweenness
        |FROM bb WHERE floor(b / 2 * 1000000 + 0.5) / 1000000 > 0
        |ORDER BY id""".stripMargin

  /** B37/B41 shared avoidance oracles: vertex cut-ness by walking from
    * the min neighbor while avoiding the vertex; edge bridge-ness by
    * tail→head reachability with both directions of the edge itself
    * forbidden. Used verbatim for the local (g_articulation/g_bridges)
    * and forced-distributed (…_dist) gates — the two Spark paths share
    * no machinery, the oracle is independent of both. */
  private val articulationOracle: String =
    """WITH RECURSIVE base AS (SELECT DISTINCT 'p:'||l_partkey AS a,
      |    's:'||l_suppkey AS b
      |  FROM lineitem WHERE l_partkey % 20 = 0 AND l_suppkey % 7 = 0),
      |sym AS (SELECT a AS src, b AS dst FROM base UNION ALL SELECT b, a FROM base),
      |seeds AS (SELECT src AS v, min(dst) AS node FROM sym GROUP BY 1),
      |walk AS (
      |  SELECT v, node FROM seeds
      |  UNION
      |  SELECT wk.v, s.dst FROM walk wk JOIN sym s ON s.src = wk.node
      |  WHERE s.dst <> wk.v AND s.src <> wk.v)
      |SELECT DISTINCT sym.src AS id FROM sym
      |WHERE NOT EXISTS (SELECT 1 FROM walk WHERE v = sym.src AND node = sym.dst)
      |ORDER BY 1""".stripMargin

  private val bridgesOracle: String =
    """WITH RECURSIVE base AS (SELECT DISTINCT 'p:'||l_partkey AS a,
      |    's:'||l_suppkey AS b
      |  FROM lineitem WHERE l_partkey % 20 = 0 AND l_suppkey % 7 = 0),
      |sym AS (SELECT a AS src, b AS dst FROM base UNION ALL SELECT b, a FROM base),
      |walk AS (
      |  SELECT a AS ea, b AS eb, a AS node FROM base
      |  UNION
      |  SELECT wk.ea, wk.eb, s.dst FROM walk wk JOIN sym s ON s.src = wk.node
      |  WHERE NOT (s.src = wk.ea AND s.dst = wk.eb)
      |    AND NOT (s.src = wk.eb AND s.dst = wk.ea))
      |SELECT e.a AS src, e.b AS dst FROM base e
      |WHERE NOT EXISTS (SELECT 1 FROM walk
      |  WHERE ea = e.a AND eb = e.b AND node = e.b)
      |ORDER BY 1, 2""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) AS sum_qty,
        | round(sum(l_extendedprice),2) AS sum_base_price,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
        | round(avg(l_quantity),2) AS avg_qty,
        | round(avg(l_discount),2) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1997-09-01'
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q2_pushdown" ->
      """SELECT l_partkey, round(sum(l_quantity),2) AS qty, count(*) AS n
        |FROM lineitem WHERE l_returnflag='R' AND l_quantity>25
        |GROUP BY 1 HAVING count(*)>1 ORDER BY 1""".stripMargin,
    "q3_join" ->
      """SELECT r_name, n_name, round(sum(o_totalprice),2) AS revenue, count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey=c_custkey
        |JOIN nation ON c_nationkey=n_nationkey JOIN region ON n_regionkey=r_regionkey
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q4_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey=c_custkey AND o_totalprice>400000)
        |ORDER BY 1""".stripMargin,
    "q4_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey=c_custkey AND o_totalprice>450000)
        |ORDER BY 1""".stripMargin,
    "q5_window" ->
      """SELECT o_custkey, rn, o_orderkey, price, prev_price, running_spend FROM (
        | SELECT o_custkey,
        |  CAST(row_number() OVER w AS INT) AS rn,
        |  o_orderkey,
        |  round(o_totalprice,2) AS price,
        |  round(coalesce(lag(o_totalprice) OVER w, 0),2) AS prev_price,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS UNBOUNDED PRECEDING),2) AS running_spend
        | FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |) t WHERE rn<=3 ORDER BY o_custkey, rn""".stripMargin,
    "q6_rollup" ->
      """SELECT coalesce(l_returnflag,'ALL') AS flag, coalesce(l_linestatus,'ALL') AS status,
        | round(sum(l_extendedprice),2) AS rev, count(*) AS n,
        | CAST(grouping(l_returnflag)*2+grouping(l_linestatus) AS INT) AS gid
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY gid, flag, status""".stripMargin,
    "q7_topk" ->
      """SELECT o_custkey, rk, o_orderkey, price FROM (
        | SELECT o_custkey,
        |  CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rk,
        |  o_orderkey, round(o_totalprice,2) AS price FROM orders
        |) t WHERE rk<=2 ORDER BY o_custkey, rk""".stripMargin,
    "q8_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        | count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q9_sort" ->
      """SELECT o_orderkey, round(o_totalprice,2) AS price, o_orderpriority
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,
    "q10_union" ->
      """SELECT nationkey, side, round(sum(bal),2) AS total_bal, count(*) AS n FROM (
        | SELECT c_nationkey AS nationkey, c_acctbal AS bal, 'customer' AS side FROM customer
        | UNION ALL
        | SELECT s_nationkey, s_acctbal, 'supplier' FROM supplier
        |) t GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q11_asof" ->
      """WITH od AS (
        | SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
        | FROM orders GROUP BY 1,2)
        |SELECT e.event_id, e.user_id, o.o_orderkey AS asof_order
        |FROM events e ASOF LEFT JOIN od o
        |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        |ORDER BY e.event_id""".stripMargin,
    "q12_pctl" ->
      """WITH g AS (SELECT l_returnflag, list_sort(list(l_extendedprice)) AS vs, count(*) AS n
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag,
        | vs[(n*50+99)//100] AS p50,
        | vs[(n*90+99)//100] AS p90,
        | vs[(n*99+99)//100] AS p99
        |FROM g ORDER BY 1""".stripMargin,
    "q13_pivot" ->
      """SELECT user_id,
        | count(*) FILTER (event_type='click') AS click,
        | count(*) FILTER (event_type='error') AS error,
        | count(*) FILTER (event_type='purchase') AS purchase,
        | count(*) FILTER (event_type='signup') AS signup,
        | count(*) FILTER (event_type='view') AS view
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q14_timeagg" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
        | count(*) AS n, round(sum(value),2) AS total_value
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q15_skew" ->
      """SELECT c_mktsegment, count(*) AS n_events, round(sum(value),2) AS total_value
        |FROM events JOIN customer ON user_id=c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q16_setops" ->
      """WITH high AS (SELECT o_custkey FROM orders WHERE o_totalprice > 200000),
        |low AS (SELECT o_custkey FROM orders WHERE o_totalprice < 50000),
        |u AS (
        | SELECT o_custkey, 'both' AS segment FROM (SELECT * FROM high INTERSECT SELECT * FROM low) t1
        | UNION ALL
        | SELECT o_custkey, 'high_only' AS segment FROM (SELECT * FROM high EXCEPT SELECT * FROM low) t2
        |)
        |SELECT segment, count(*) AS n_customers FROM u GROUP BY 1 ORDER BY 1""".stripMargin,
    "q17_scalar" ->
      """SELECT o_custkey, count(*) AS n_above, round(max(o_totalprice),2) AS max_price
        |FROM orders o
        |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders i
        |                      WHERE i.o_custkey = o.o_custkey)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q18_json" ->
      """SELECT event_type,
        | CAST(CAST(json_extract(props, '$.k') AS INT) // 10 AS INT) AS k_bucket,
        | count(*) AS n, round(sum(value),2) AS total_value
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q24_rank" ->
      """SELECT c_custkey, c_nationkey, round(c_acctbal,2) AS bal,
        | CAST(ntile(4) OVER w AS INT) AS quartile,
        | floor(percent_rank() OVER w * 1000000 + 0.5) / 1000000 AS pr,
        | floor(cume_dist() OVER w * 1000000 + 0.5) / 1000000 AS cd,
        | CAST(dense_rank() OVER w AS INT) AS dr
        |FROM customer WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q25_rangeframe" ->
      """SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS od,
        | round(sum(o_totalprice) OVER w, 2) AS spend_90d,
        | count(*) OVER w AS n_orders_90d
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY date_diff('day', DATE '1990-01-01', o_orderdate)
        |  RANGE BETWEEN 89 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, od, o_orderkey""".stripMargin,
    "q23_range" ->
      """SELECT p.event_id AS purchase_id, count(*) AS n_prior_24h
        |FROM events p JOIN events x
        |  ON x.user_id = p.user_id
        | AND epoch_ms(x.ts) >= epoch_ms(p.ts) - 86400000
        | AND epoch_ms(x.ts) <  epoch_ms(p.ts)
        |WHERE p.event_type = 'purchase'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q22_sessions" ->
      """WITH g AS (
        | SELECT user_id, ts, event_id, value,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |         OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
        |       THEN 1 ELSE 0 END AS new_session
        | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), s AS (
        | SELECT user_id, ts, value,
        |  CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS INT) AS session_seq
        | FROM g
        |)
        |SELECT user_id, session_seq, count(*) AS n_events,
        | round(sum(value),2) AS session_value,
        | strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start
        |FROM s GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q20_strings" ->
      """SELECT p_partkey,
        | upper(substring(p_name, 1, 5)) AS head5,
        | CAST(length(p_name) AS BIGINT) AS name_len,
        | CAST(instr(p_name, 'a') AS BIGINT) AS first_a,
        | regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
        | concat_ws('|', p_brand, p_type) AS brand_type,
        | lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded_key
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q21_dates" ->
      """SELECT o_orderkey,
        | CAST(year(o_orderdate) AS INT) AS y,
        | CAST(month(o_orderdate) AS INT) AS m,
        | CAST(day(o_orderdate) AS INT) AS d,
        | CAST(quarter(o_orderdate) AS INT) AS q,
        | strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m,
        | strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "g_lookup" ->
      """SELECT 'c:'||c_custkey AS id, c_name AS name, round(c_acctbal,2) AS acctbal
        |FROM customer WHERE c_nationkey=3 AND c_acctbal>1000 ORDER BY 1""".stripMargin,
    "g_motif" ->
      """SELECT c_custkey, count(*) AS n_paths, count(DISTINCT p_partkey) AS n_parts
        |FROM customer JOIN orders ON c_custkey=o_custkey
        |JOIN lineitem ON o_orderkey=l_orderkey JOIN part ON l_partkey=p_partkey
        |WHERE c_mktsegment='BUILDING' AND p_size>40
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "g_tree" ->
      """WITH RECURSIVE edges AS (
        |  SELECT 'r:'||n_regionkey AS src, 'n:'||n_nationkey AS dst FROM nation
        |  UNION ALL SELECT 'n:'||c_nationkey, 'c:'||c_custkey FROM customer
        |  UNION ALL SELECT 'c:'||o_custkey, 'o:'||o_orderkey FROM orders
        |), bfs AS (
        |  SELECT 'r:0' AS id, 0 AS dist
        |  UNION
        |  SELECT e.dst, b.dist+1 FROM bfs b JOIN edges e ON b.id=e.src WHERE b.dist<10
        |)
        |SELECT dist, count(*) AS n FROM (SELECT id, min(dist) AS dist FROM bfs GROUP BY 1) t
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "g_toposort" ->
      // longest-path level from the DAG's sources: enumerate every
      // root-anchored walk (the supply-chain DAG is stage-ordered, so
      // walks are ≤ 5 hops) and take max(level) per vertex — an
      // independent recomputation of the Kahn layering
      """WITH RECURSIVE e AS (
        |  SELECT 'r:'||n_regionkey AS src, 'n:'||n_nationkey AS dst FROM nation
        |  UNION ALL SELECT 'n:'||c_nationkey, 'c:'||c_custkey FROM customer
        |  UNION ALL SELECT 'c:'||o_custkey, 'o:'||o_orderkey FROM orders
        |  UNION ALL SELECT DISTINCT 'o:'||l_orderkey, 'p:'||l_partkey
        |    FROM lineitem WHERE l_partkey % 20 = 0
        |  UNION ALL SELECT DISTINCT 'p:'||l_partkey, 's:'||l_suppkey
        |    FROM lineitem WHERE l_partkey % 20 = 0
        |), walk AS (
        |  SELECT src AS id, 0 AS lvl
        |  FROM (SELECT DISTINCT src FROM e WHERE src NOT IN (SELECT dst FROM e)) r
        |  UNION ALL
        |  SELECT e.dst, w.lvl + 1 FROM walk w JOIN e ON e.src = w.id
        |  WHERE w.lvl < 10
        |)
        |SELECT id, CAST(max(lvl) AS BIGINT) AS level FROM walk
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "g_longestpath" ->
      // the toposort walk CTE carrying path strings: per vertex the
      // argmax walk (max level, then lex-smallest path) — an
      // independent recomputation of the DP's dist AND critical path
      """WITH RECURSIVE e AS (
        |  SELECT 'r:'||n_regionkey AS src, 'n:'||n_nationkey AS dst FROM nation
        |  UNION ALL SELECT 'n:'||c_nationkey, 'c:'||c_custkey FROM customer
        |  UNION ALL SELECT 'c:'||o_custkey, 'o:'||o_orderkey FROM orders
        |  UNION ALL SELECT DISTINCT 'o:'||l_orderkey, 'p:'||l_partkey
        |    FROM lineitem WHERE l_partkey % 20 = 0
        |  UNION ALL SELECT DISTINCT 'p:'||l_partkey, 's:'||l_suppkey
        |    FROM lineitem WHERE l_partkey % 20 = 0
        |), walk AS (
        |  SELECT src AS id, 0 AS lvl, src AS path
        |  FROM (SELECT DISTINCT src FROM e WHERE src NOT IN (SELECT dst FROM e)) r
        |  UNION ALL
        |  SELECT e.dst, w.lvl + 1, w.path || '>' || e.dst
        |  FROM walk w JOIN e ON e.src = w.id
        |  WHERE w.lvl < 10
        |)
        |SELECT id, CAST(lvl AS BIGINT) AS dist, path FROM walk
        |QUALIFY row_number() OVER (PARTITION BY id ORDER BY lvl DESC, path) = 1
        |ORDER BY id""".stripMargin,
    "g_reach" ->
      """WITH RECURSIVE base AS (
        |  SELECT DISTINCT 'p:'||l_partkey AS a, 's:'||l_suppkey AS b
        |  FROM lineitem WHERE l_partkey%20=0
        |), edges AS (SELECT a AS src, b AS dst FROM base UNION SELECT b, a FROM base
        |), bfs AS (
        |  SELECT 's:1' AS id, 0 AS dist
        |  UNION
        |  SELECT e.dst, b.dist+1 FROM bfs b JOIN edges e ON b.id=e.src WHERE b.dist<8
        |)
        |SELECT dist, count(*) AS n FROM (SELECT id, min(dist) AS dist FROM bfs GROUP BY 1) t
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "g_closeness" ->
      """WITH RECURSIVE base AS (
        |  SELECT DISTINCT 'p:'||l_partkey AS a, 's:'||l_suppkey AS b
        |  FROM lineitem WHERE l_partkey%20=0
        |), edges AS (SELECT a AS src, b AS dst FROM base UNION SELECT b, a FROM base
        |), roots AS (SELECT DISTINCT 'p:'||l_partkey AS id
        |  FROM lineitem WHERE l_partkey%200=0
        |), reach AS (
        |  SELECT id AS root, id, 0 AS d FROM roots
        |  UNION
        |  SELECT r.root, e.dst, r.d+1 FROM reach r JOIN edges e ON e.src = r.id
        |  WHERE r.d < 10
        |), md AS (
        |  SELECT root, id, min(d) AS d FROM reach GROUP BY 1, 2
        |)
        |SELECT root AS id,
        | floor(CAST(count(*) AS DOUBLE)/sum(d) * 1000000 + 0.5) / 1000000 AS closeness
        |FROM md WHERE d > 0 GROUP BY 1 ORDER BY 1""".stripMargin,
    "g_harmonic" ->
      """WITH RECURSIVE base AS (
        |  SELECT DISTINCT 'p:'||l_partkey AS a, 's:'||l_suppkey AS b
        |  FROM lineitem WHERE l_partkey%20=0
        |), edges AS (SELECT a AS src, b AS dst FROM base UNION SELECT b, a FROM base
        |), roots AS (SELECT DISTINCT 'p:'||l_partkey AS id
        |  FROM lineitem WHERE l_partkey%200=0
        |), reach AS (
        |  SELECT id AS root, id, 0 AS d FROM roots
        |  UNION
        |  SELECT r.root, e.dst, r.d+1 FROM reach r JOIN edges e ON e.src = r.id
        |  WHERE r.d < 10
        |), md AS (
        |  SELECT root, id, min(d) AS d FROM reach GROUP BY 1, 2
        |)
        |SELECT root AS id,
        | round(CAST(sum(2520//d) AS DOUBLE)/2520.0, 6) AS harmonic
        |FROM md WHERE d > 0 GROUP BY 1 ORDER BY 1""".stripMargin,
    "g_cc" ->
      """WITH RECURSIVE base AS (
        |  SELECT DISTINCT 'p:'||l_partkey AS a, 's:'||l_suppkey AS b
        |  FROM lineitem WHERE l_partkey%20=0
        |), edges AS (SELECT a AS src, b AS dst FROM base UNION SELECT b, a FROM base
        |), reach AS (
        |  SELECT src AS id, src AS r FROM edges
        |  UNION
        |  SELECT e.dst, r.r FROM reach r JOIN edges e ON r.id=e.src
        |)
        |SELECT component, count(*) AS size FROM
        | (SELECT id, min(r) AS component FROM reach GROUP BY 1) t
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "g_degree" ->
      """WITH base AS (SELECT DISTINCT 'p:'||l_partkey AS src, 's:'||l_suppkey AS dst
        |  FROM lineitem WHERE l_partkey%20=0),
        |o AS (SELECT src AS id, count(*) AS out_deg FROM base GROUP BY 1),
        |i AS (SELECT dst AS id, count(*) AS in_deg FROM base GROUP BY 1)
        |SELECT coalesce(o.id, i.id) AS id, coalesce(out_deg,0) AS out_deg,
        | coalesce(in_deg,0) AS in_deg, coalesce(out_deg,0)+coalesce(in_deg,0) AS deg
        |FROM o FULL OUTER JOIN i ON o.id=i.id ORDER BY 1""".stripMargin,
    "g_triangles" ->
      """WITH lp AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e AS (SELECT DISTINCT a.p AS u, b.p AS v FROM lp a JOIN lp b ON a.o=b.o AND a.p<b.p),
        |tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |        FROM e e1 JOIN e e2 ON e2.u = e1.v
        |                  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
        |x AS (SELECT a AS id FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri)
        |SELECT id AS l_partkey, count(*) AS n_tri FROM x GROUP BY 1 ORDER BY 1""".stripMargin,
    // B34 (r12): coloring invariants — validity + greedy palette bound
    "g_k1_valid" ->
      """SELECT CAST(1 AS BIGINT) AS no_conflict_ok,
        |       CAST(1 AS BIGINT) AS bound_ok""".stripMargin,
    // B7w (r12): weighted degrees = weight sums over the shared
    // weighted symmetric graph recipe
    "g_wdegree" ->
      """WITH base AS (SELECT DISTINCT 'p:'||l_partkey AS a, 's:'||l_suppkey AS b,
        |    CAST((l_partkey + l_suppkey) % 5 + 1 AS BIGINT) AS w
        |  FROM lineitem WHERE l_partkey % 20 = 0),
        |e AS (SELECT a AS src, b AS dst, w FROM base UNION SELECT b, a, w FROM base),
        |o AS (SELECT src AS id, CAST(sum(w) AS DOUBLE) AS out_deg FROM e GROUP BY 1),
        |i AS (SELECT dst AS id, CAST(sum(w) AS DOUBLE) AS in_deg FROM e GROUP BY 1)
        |SELECT coalesce(o.id, i.id) AS id, coalesce(out_deg, 0) AS out_deg,
        |  coalesce(in_deg, 0) AS in_deg,
        |  coalesce(out_deg, 0) + coalesce(in_deg, 0) AS deg
        |FROM o FULL JOIN i ON o.id = i.id ORDER BY 1""".stripMargin,
    // B33 (r12): the count oracle's own tri CTE, streamed
    "g_tri_enum" ->
      """WITH lp AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e AS (SELECT DISTINCT a.p AS u, b.p AS v FROM lp a JOIN lp b ON a.o=b.o AND a.p<b.p),
        |tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |        FROM e e1 JOIN e e2 ON e2.u = e1.v
        |                  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
        |SELECT a, b, c FROM tri ORDER BY 1, 2, 3 LIMIT 5000""".stripMargin,
    "g_clustercoef" ->
      """WITH lp AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e AS (SELECT DISTINCT a.p AS u, b.p AS v FROM lp a JOIN lp b ON a.o=b.o AND a.p<b.p),
        |sym AS (SELECT u, v FROM e UNION SELECT v, u FROM e),
        |deg AS (SELECT u AS id, count(*) AS deg FROM sym GROUP BY 1),
        |tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |        FROM e e1 JOIN e e2 ON e2.u = e1.v
        |                  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
        |x AS (SELECT a AS id FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri),
        |nt AS (SELECT id, count(*) AS n_tri FROM x GROUP BY 1)
        |SELECT nt.id AS l_partkey, n_tri, deg,
        | floor(2.0*n_tri/(deg*(deg-1)) * 10000 + 0.5) / 10000 AS coef
        |FROM nt JOIN deg ON nt.id = deg.id ORDER BY 1""".stripMargin,
    "g_pagerank" -> pagerankOracle,
    "g_articlerank" -> articlerankOracle,
    // forced-distributed twin: SAME oracle — the distributed plan must
    // produce exactly what the local finisher produces
    "g_pagerank_dist" -> pagerankOracle,
    "g_betweenness_sql" -> betweennessHop4Oracle,
    // r10: the FULL hop-10 runs (local-finisher and forced-distributed)
    // gated on the generated 10-level unrolling — no more rows-only
    // betweenness anywhere
    "g_betweenness" -> betweennessHop10Oracle,
    "g_betweenness_dist" -> betweennessHop10Oracle,
    // forced-distributed hop-4 Brandes: SAME oracle — the distributed
    // sweep must reproduce the local mirror's numbers exactly
    "g_betweenness_dist_sql" -> betweennessHop4Oracle,
    "g_ppr" ->
      """WITH RECURSIVE e AS (
        |  SELECT DISTINCT src, dst FROM (
        |    SELECT 'p:'||l_partkey AS src, 's:'||l_suppkey AS dst FROM lineitem WHERE l_partkey % 20 = 0
        |    UNION ALL
        |    SELECT 's:'||l_suppkey, 'p:'||l_partkey FROM lineitem WHERE l_partkey % 20 = 0)),
        |v AS (SELECT DISTINCT src AS id FROM e),
        |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
        |s AS (SELECT id FROM v WHERE id LIKE 'p:%' AND CAST(substr(id,3) AS INT) % 5 = 0),
        |ns AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM s),
        |pr AS (
        |  SELECT 0 AS it, id,
        |    CASE WHEN id IN (SELECT id FROM s) THEN 1.0/(SELECT n FROM ns) ELSE 0.0 END AS rank
        |  FROM v
        |  UNION ALL
        |  SELECT it+1, dst AS id,
        |    CASE WHEN dst IN (SELECT id FROM s) THEN 0.15/(SELECT n FROM ns) ELSE 0.0 END
        |      + 0.85*msum AS rank
        |  FROM (
        |    SELECT p.it AS it, e.dst AS dst, sum(p.rank/deg.deg) AS msum
        |    FROM pr p JOIN e ON e.src = p.id JOIN deg ON deg.src = e.src
        |    WHERE p.it < 10 GROUP BY 1,2) q)
        |SELECT id, round(rank,6) AS rank FROM pr WHERE it=10 AND rank > 0
        |ORDER BY rank DESC, id LIMIT 25""".stripMargin,
    "g_kcore" ->
      """WITH RECURSIVE e AS (
        |  SELECT DISTINCT src, dst FROM (
        |    SELECT 'p:'||l_partkey AS src, 's:'||l_suppkey AS dst FROM lineitem WHERE l_partkey % 20 = 0
        |    UNION ALL
        |    SELECT 's:'||l_suppkey, 'p:'||l_partkey FROM lineitem WHERE l_partkey % 20 = 0)),
        |ecore AS (
        |  SELECT 0 AS it, src, dst FROM e WHERE src <> dst
        |  UNION ALL
        |  SELECT it+1, src, dst FROM (
        |    SELECT it, src, dst,
        |      count(*) OVER (PARTITION BY src) AS sdeg,
        |      count(*) OVER (PARTITION BY dst) AS ddeg
        |    FROM ecore WHERE it < 30) x
        |  WHERE sdeg >= 3 AND ddeg >= 3)
        |SELECT src AS id, count(*) AS deg FROM ecore WHERE it = 30
        |GROUP BY src HAVING count(*) >= 3 ORDER BY id""".stripMargin,
    "g_lpa" ->
      """WITH RECURSIVE e AS (
        |  SELECT DISTINCT src, dst FROM (
        |    SELECT 'p:'||l_partkey AS src, 's:'||l_suppkey AS dst FROM lineitem WHERE l_partkey % 20 = 0
        |    UNION ALL
        |    SELECT 's:'||l_suppkey, 'p:'||l_partkey FROM lineitem WHERE l_partkey % 20 = 0)),
        |v AS (SELECT DISTINCT src AS id FROM e),
        |lp AS (
        |  SELECT 0 AS it, id, id AS community FROM v
        |  UNION ALL
        |  SELECT it+1 AS it, dst AS id, community FROM (
        |    SELECT p.it AS it, e.dst AS dst, p.community AS community, count(*) AS cnt
        |    FROM lp p JOIN e ON e.src = p.id
        |    WHERE p.it < 5 GROUP BY 1,2,3) c
        |  QUALIFY row_number() OVER (PARTITION BY it, dst ORDER BY cnt DESC, community) = 1)
        |SELECT community, count(*) AS size FROM lp WHERE it = 5
        |GROUP BY 1 ORDER BY size DESC, community""".stripMargin,
    // r14 — weighted LPA: the g_lpa CTE with votes weighted by
    // edgeWeight((p+s)%5+1) × voterNodeWeight(key%3+1); all-BIGINT vote
    // sums, so the (cnt DESC, community) winner is tie-safe exact
    "g_wlpa" ->
      """WITH RECURSIVE base AS (
        |  SELECT DISTINCT 'p:'||l_partkey AS a, 's:'||l_suppkey AS b,
        |    CAST((l_partkey + l_suppkey) % 5 + 1 AS BIGINT) AS w
        |  FROM lineitem WHERE l_partkey % 20 = 0),
        |e AS (SELECT a AS src, b AS dst, w FROM base
        |      UNION ALL SELECT b, a, w FROM base),
        |nw AS (SELECT id, CAST(CAST(substr(id, 3) AS INT) % 3 + 1 AS BIGINT) AS nw
        |  FROM (SELECT DISTINCT src AS id FROM e) t),
        |v AS (SELECT DISTINCT src AS id FROM e),
        |lp AS (
        |  SELECT 0 AS it, id, id AS community FROM v
        |  UNION ALL
        |  SELECT it+1 AS it, dst AS id, community FROM (
        |    SELECT p.it AS it, e.dst AS dst, p.community AS community,
        |      sum(e.w * nw.nw) AS cnt
        |    FROM lp p JOIN e ON e.src = p.id JOIN nw ON nw.id = e.src
        |    WHERE p.it < 5 GROUP BY 1,2,3) c
        |  QUALIFY row_number() OVER (PARTITION BY it, dst ORDER BY cnt DESC, community) = 1)
        |SELECT community, count(*) AS size FROM lp WHERE it = 5
        |GROUP BY 1 ORDER BY size DESC, community""".stripMargin,
    // weighted closeness: multi-root state-dedup walk CTE distances →
    // reached / Σ weighted dist, tie-safe rounded
    "g_wcloseness" ->
      """WITH RECURSIVE base AS (
        |  SELECT DISTINCT 'p:'||l_partkey AS a, 's:'||l_suppkey AS b,
        |    CAST((l_partkey + l_suppkey) % 5 + 1 AS BIGINT) AS w
        |  FROM lineitem WHERE l_partkey % 20 = 0),
        |e AS (SELECT a AS src, b AS dst, w FROM base UNION SELECT b, a, w FROM base),
        |r AS (SELECT DISTINCT b AS id FROM base WHERE CAST(substr(b, 3) AS INT) % 40 = 0),
        |walk AS (
        |  SELECT id AS root, id, CAST(0 AS DOUBLE) AS d, 0 AS hops FROM r
        |  UNION
        |  SELECT wk.root, e.dst, wk.d + e.w, wk.hops + 1
        |  FROM walk wk JOIN e ON wk.id = e.src WHERE wk.hops < 6),
        |dist AS (SELECT root, id, min(d) AS d FROM walk GROUP BY 1, 2)
        |SELECT root AS id,
        |  floor(CAST(count(*) AS DOUBLE) / sum(d) * 1000000 + 0.5)/1000000 AS closeness
        |FROM dist WHERE d > 0 GROUP BY root ORDER BY id""".stripMargin,
    "g_wbetweenness" -> wBetweennessOracle,
    // forced-distributed four-phase Dijkstra-Brandes: SAME oracle
    "g_wbetweenness_dist" -> wBetweennessOracle,
    "g_wpaths" -> wPathsOracle,
    "g_astar" -> wPathsOracleSql("WHERE root = 's:40' AND id = 'p:20'"),
    "g_steiner" -> steinerOracleSql,
    // B39 (r13): negative-weight shortest distances on the supply-chain
    // DAG — min over every enumerated r:0-anchored walk (the DAG is
    // stage-ordered, walks ≤ 5 hops; negative-safe by construction)
    "g_bellman" ->
      """WITH RECURSIVE e AS (
        |  SELECT src, dst,
        |    (CAST(substr(src, 3) AS INT) + CAST(substr(dst, 3) AS INT)) % 5 - 2 AS w
        |  FROM (
        |    SELECT 'r:'||n_regionkey AS src, 'n:'||n_nationkey AS dst FROM nation
        |    UNION ALL SELECT 'n:'||c_nationkey, 'c:'||c_custkey FROM customer
        |    UNION ALL SELECT 'c:'||o_custkey, 'o:'||o_orderkey FROM orders
        |    UNION ALL SELECT DISTINCT 'o:'||l_orderkey, 'p:'||l_partkey
        |      FROM lineitem WHERE l_partkey % 20 = 0
        |    UNION ALL SELECT DISTINCT 'p:'||l_partkey, 's:'||l_suppkey
        |      FROM lineitem WHERE l_partkey % 20 = 0)
        |), walk AS (
        |  SELECT 'r:0' AS id, 0 AS d, 0 AS hops
        |  UNION ALL
        |  SELECT e.dst, w.d + e.w, w.hops + 1 FROM walk w JOIN e ON e.src = w.id
        |  WHERE w.hops < 6
        |)
        |SELECT id, CAST(min(d) AS BIGINT) AS dist FROM walk
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // B32 (r12): conductance = cut / min(vol, total - vol) of the
    // (key % 4) partition, unweighted symmetrized part—supplier graph
    "g_conductance" ->
      """WITH base AS (SELECT DISTINCT 'p:'||l_partkey AS a, 's:'||l_suppkey AS b
        |  FROM lineitem WHERE l_partkey % 20 = 0),
        |e AS (SELECT a AS src, b AS dst FROM base UNION SELECT b, a FROM base),
        |asg AS (SELECT src AS id,
        |    CAST(CAST(substr(src, 3) AS BIGINT) % 4 AS VARCHAR) AS c
        |  FROM (SELECT src FROM e UNION SELECT dst FROM e) t(src)),
        |deg AS (SELECT src AS id, CAST(count(*) AS DOUBLE) AS k FROM e GROUP BY 1),
        |vols AS (SELECT c, sum(k) AS vol FROM deg JOIN asg USING (id) GROUP BY 1),
        |m2 AS (SELECT sum(vol) AS tot FROM vols),
        |cut AS (SELECT x.c AS c, CAST(count(*) AS DOUBLE) AS cut FROM e
        |  JOIN asg x ON e.src = x.id JOIN asg y ON e.dst = y.id
        |  WHERE x.c <> y.c GROUP BY 1)
        |SELECT vols.c AS community,
        |  floor(coalesce(cut, 0) / least(vol, tot - vol) * 1000000 + 0.5)
        |    / 1000000 AS conductance
        |FROM vols LEFT JOIN cut USING (c) CROSS JOIN m2
        |WHERE least(vol, tot - vol) > 0 ORDER BY 1""".stripMargin,
    // B35 (r13): the MSF via the CYCLE PROPERTY — an edge is in the
    // unique (w,a,b)-minimal spanning forest iff its head is NOT
    // reachable from its tail through strictly (w,a,b)-smaller edges.
    // Genuinely independent of Borůvka: no rounds, no contraction.
    "g_mst" ->
      """WITH RECURSIVE base AS (
        |  SELECT DISTINCT 'p:'||l_partkey AS a, 's:'||l_suppkey AS b,
        |    CAST((l_partkey + l_suppkey) % 5 + 1 AS BIGINT) AS w
        |  FROM lineitem WHERE l_partkey % 20 = 0 AND l_suppkey % 3 = 0),
        |ed AS (SELECT a, b, min(w) AS w FROM base GROUP BY 1, 2),
        |sym AS (SELECT a AS src, b AS dst, w, a AS ka, b AS kb FROM ed
        |        UNION ALL SELECT b, a, w, a, b FROM ed),
        |walk AS (
        |  SELECT a AS ea, b AS eb, w AS ew, a AS node FROM ed
        |  UNION
        |  SELECT wk.ea, wk.eb, wk.ew, s.dst
        |  FROM walk wk JOIN sym s ON s.src = wk.node
        |  WHERE (s.w, s.ka, s.kb) < (wk.ew, wk.ea, wk.eb))
        |SELECT e.a AS src, e.b AS dst, e.w AS w FROM ed e
        |WHERE NOT EXISTS (SELECT 1 FROM walk
        |  WHERE ea = e.a AND eb = e.b AND node = e.b)
        |ORDER BY 1, 2""".stripMargin,
    // B40 (r14): DFS preorder on a forest ≡ component-wise root-path
    // order — the oracle enumerates paths and sorts their SPLIT lists
    // (never runs a DFS; a parent's list is a strict prefix of its
    // children's, siblings order by first differing id)
    "g_dfs" ->
      """WITH RECURSIVE e AS (
        |  SELECT 'r:'||n_regionkey AS src, 'n:'||n_nationkey AS dst FROM nation
        |  UNION ALL SELECT 'n:'||c_nationkey, 'c:'||c_custkey FROM customer
        |  UNION ALL SELECT 'c:'||o_custkey, 'o:'||o_orderkey FROM orders),
        |walk AS (
        |  SELECT 'r:0' AS id, 'r:0' AS path
        |  UNION ALL
        |  SELECT e.dst, w.path || '>' || e.dst FROM walk w JOIN e ON e.src = w.id)
        |SELECT id,
        |  CAST(row_number() OVER (ORDER BY string_split(path, '>')) - 1
        |    AS BIGINT) AS ord
        |FROM walk ORDER BY ord""".stripMargin,
    // B35 objective=maximum (r14): the INVERTED cycle property — an
    // edge is in the max-forest iff its endpoints are NOT connected
    // via edges strictly greater under the (−w, a, b) total order
    "g_maxst" ->
      """WITH RECURSIVE base AS (
        |  SELECT DISTINCT 'p:'||l_partkey AS a, 's:'||l_suppkey AS b,
        |    CAST((l_partkey + l_suppkey) % 5 + 1 AS BIGINT) AS w
        |  FROM lineitem WHERE l_partkey % 20 = 0 AND l_suppkey % 3 = 0),
        |ed AS (SELECT a, b, max(w) AS w FROM base GROUP BY 1, 2),
        |sym AS (SELECT a AS src, b AS dst, w, a AS ka, b AS kb FROM ed
        |        UNION ALL SELECT b, a, w, a, b FROM ed),
        |walk AS (
        |  SELECT a AS ea, b AS eb, w AS ew, a AS node FROM ed
        |  UNION
        |  SELECT wk.ea, wk.eb, wk.ew, s.dst
        |  FROM walk wk JOIN sym s ON s.src = wk.node
        |  WHERE (-s.w, s.ka, s.kb) < (-wk.ew, wk.ea, wk.eb))
        |SELECT e.a AS src, e.b AS dst, e.w AS w FROM ed e
        |WHERE NOT EXISTS (SELECT 1 FROM walk
        |  WHERE ea = e.a AND eb = e.b AND node = e.b)
        |ORDER BY 1, 2""".stripMargin,
    // B35k (r14): the g_mst forest → the min-vertex source's component
    // by reachability over FOREST edges → minus the 2 heaviest under
    // (w, src, dst) — tree and cut both independently recomputed
    "g_kmst" ->
      """WITH RECURSIVE base AS (
        |  SELECT DISTINCT 'p:'||l_partkey AS a, 's:'||l_suppkey AS b,
        |    CAST((l_partkey + l_suppkey) % 5 + 1 AS BIGINT) AS w
        |  FROM lineitem WHERE l_partkey % 20 = 0 AND l_suppkey % 3 = 0),
        |ed AS (SELECT a, b, min(w) AS w FROM base GROUP BY 1, 2),
        |sym AS (SELECT a AS src, b AS dst, w, a AS ka, b AS kb FROM ed
        |        UNION ALL SELECT b, a, w, a, b FROM ed),
        |walk AS (
        |  SELECT a AS ea, b AS eb, w AS ew, a AS node FROM ed
        |  UNION
        |  SELECT wk.ea, wk.eb, wk.ew, s.dst
        |  FROM walk wk JOIN sym s ON s.src = wk.node
        |  WHERE (s.w, s.ka, s.kb) < (wk.ew, wk.ea, wk.eb)),
        |mst AS (SELECT e.a AS src, e.b AS dst, e.w AS w FROM ed e
        |  WHERE NOT EXISTS (SELECT 1 FROM walk
        |    WHERE ea = e.a AND eb = e.b AND node = e.b)),
        |msym AS (SELECT src, dst FROM mst UNION ALL SELECT dst, src FROM mst),
        |reach AS (
        |  SELECT min(a) AS node FROM ed
        |  UNION
        |  SELECT m.dst FROM reach r JOIN msym m ON m.src = r.node),
        |tree AS (SELECT mst.src, mst.dst, mst.w FROM mst
        |  JOIN reach ON reach.node = mst.src),
        |cut AS (SELECT src, dst FROM tree
        |  ORDER BY w DESC, src DESC, dst DESC LIMIT 2)
        |SELECT t.src, t.dst, t.w FROM tree t
        |WHERE NOT EXISTS (SELECT 1 FROM cut c
        |  WHERE c.src = t.src AND c.dst = t.dst)
        |ORDER BY 1, 2""".stripMargin,
    // B12f (r13): the g_nodesim directed expansion + the two filters
    "g_nodesim_filtered" ->
      """WITH e AS (SELECT DISTINCT 'p:'||l_partkey AS p, 's:'||l_suppkey AS s
        |  FROM lineitem WHERE l_partkey%20=0),
        |sz AS (SELECT p, count(*) AS n FROM e GROUP BY 1),
        |i AS (SELECT a.p AS id1, b.p AS id2, count(*) AS i
        |  FROM e a JOIN e b ON a.s=b.s AND a.p<b.p GROUP BY 1,2),
        |pr AS (SELECT id1, id2,
        |    floor(CAST(i AS DOUBLE)/(x.n+y.n-i) * 10000 + 0.5) / 10000 AS sim
        |  FROM i JOIN sz x ON id1=x.p JOIN sz y ON id2=y.p
        |  WHERE CAST(i AS DOUBLE)/(x.n+y.n-i) >= 0.2),
        |d AS (SELECT id1 AS id, id2 AS neighbor, sim FROM pr
        |  UNION ALL SELECT id2, id1, sim FROM pr)
        |SELECT id, neighbor, sim FROM d
        |WHERE CAST(substr(id, 3) AS INT) % 3 = 0
        |  AND CAST(substr(neighbor, 3) AS INT) % 3 = 1
        |ORDER BY id, neighbor""".stripMargin,
    // B37 (r13): a vertex is an articulation point iff, walking from
    // its minimum neighbor while AVOIDING the vertex, some neighbor
    // stays unreached — an independent formulation of cut-ness (the
    // Spark side computes it via Tarjan lowlinks).
    "g_articulation" -> articulationOracle,
    // B37b (r13): an edge is a bridge iff its head is unreachable from
    // its tail when BOTH directions of the edge itself are forbidden
    "g_bridges" -> bridgesOracle,
    // B41 (r14): the SAME avoidance oracles, with the Spark side
    // FORCED through the distributed Tarjan-Vishkin pass — the oracle
    // knows nothing about spanning trees, Euler tours or RMQs, so this
    // is a full independent recomputation of the distributed path
    "g_articulation_dist" -> articulationOracle,
    "g_bridges_dist" -> bridgesOracle,
    // B36 (r13): hashgnn quality flags — Spark-side deterministic
    // invariants (homophily / rerun / coverage), oracle pins three 1s
    // (the e_recall pattern for non-SQL-expressible checks)
    "g_hashgnn_ok" ->
      """SELECT CAST(1 AS BIGINT) AS homophily_ok,
        |       CAST(1 AS BIGINT) AS rerun_ok,
        |       CAST(1 AS BIGINT) AS coverage_ok""".stripMargin,
    // B45 (r15): node2vec SGNS quality flags — homophily beats the
    // rotation baseline, rerun within float tolerance, full coverage
    "g_n2v_ok" ->
      """SELECT CAST(1 AS BIGINT) AS homophily_ok,
        |       CAST(1 AS BIGINT) AS rerun_ok,
        |       CAST(1 AS BIGINT) AS coverage_ok""".stripMargin,
    // B47 (r15): influence-maximization invariants — k ranked seeds,
    // monotone bounded spread, real distinct vertices, bit-exact rerun
    "g_celf_ok" ->
      """SELECT CAST(1 AS BIGINT) AS k_ok,
        |       CAST(1 AS BIGINT) AS monotone_ok,
        |       CAST(1 AS BIGINT) AS seeds_ok,
        |       CAST(1 AS BIGINT) AS rerun_ok""".stripMargin,
    // B48 (r15): max-k-cut invariants — coverage in [0,k), the gated
    // local search never loses to its own init, bit-exact rerun
    "g_maxkcut_ok" ->
      """SELECT CAST(1 AS BIGINT) AS cover_ok,
        |       CAST(1 AS BIGINT) AS monotone_ok,
        |       CAST(1 AS BIGINT) AS rerun_ok""".stripMargin,
    // B42 (r14): sllpa invariant flags — coverage (every vertex holds
    // >= 1 membership), same-component labels (propagation can't leak
    // across components), overlap non-vacuity; Spark-side
    // deterministic, oracle pins three 1s (the g_hashgnn_ok pattern)
    "g_sllpa_ok" ->
      """SELECT CAST(1 AS BIGINT) AS coverage_ok,
        |       CAST(1 AS BIGINT) AS samecomp_ok,
        |       CAST(1 AS BIGINT) AS overlap_ok""".stripMargin,
    // B43 (r14): coreness invariant flags — level-3 set equality vs
    // the hash-gated g_kcore operator (a transitive DuckDB check),
    // core <= degree, local peel == distributed H-index; oracle pins 1s
    "g_kcoredec_ok" ->
      """SELECT CAST(1 AS BIGINT) AS level_ok,
        |       CAST(1 AS BIGINT) AS bound_ok,
        |       CAST(1 AS BIGINT) AS paths_ok""".stripMargin,
    // D8 (r13): the planted-passage corpus is closed-form — the pair
    // list (and exactly ONE passage-length span per pair) follows from
    // the construction; the Spark side has to find them through the
    // full winnow→align→extend→verify pipeline
    "d8_substr" ->
      """WITH p AS (SELECT doc_id FROM documents WHERE doc_id % 97 = 0)
        |SELECT a.doc_id AS doc1, b.doc_id AS doc2, CAST(1 AS BIGINT) AS n_long
        |FROM p a JOIN p b ON a.doc_id < b.doc_id
        |ORDER BY 1, 2""".stripMargin,
    // D8a (r15): the apply pass — the oracle rebuilds the guarded
    // corpus and cuts the passage from every planted doc except the
    // earliest (the Lee et al. keep-first policy, closed-form because
    // the unique guard chars pin each span to exactly the passage)
    "d8_apply" ->
      s"""WITH b AS (
        |  SELECT doc_id,
        |    repeat(' f' || CAST(doc_id AS VARCHAR) || 'x ', 6) AS f,
        |    repeat(' h' || CAST(doc_id AS VARCHAR) || 'x ', 6) AS h,
        |    (doc_id % 97 = 0 AND doc_id < 2522) AS planted,
        |    chr(97 + CAST(doc_id // 97 AS INT)) AS g
        |  FROM documents),
        |t AS (SELECT doc_id, planted, lower(trim(
        |    f || CASE WHEN planted THEN g || '${Dedup.d8Passage}' || g
        |              ELSE '' END || h)) AS t
        |  FROM b),
        |mn AS (SELECT min(doc_id) AS keeper FROM t WHERE planted)
        |SELECT doc_id,
        |  md5(CASE WHEN planted AND doc_id > (SELECT keeper FROM mn)
        |      THEN replace(t, '${Dedup.d8Passage}', '') ELSE t END) AS text_hash
        |FROM t ORDER BY doc_id""".stripMargin,
    // k shortest loopless paths: enumerate EVERY simple s:40-anchored
    // walk within 3 hops (never through the target), keep the ones
    // ending at p:20, rank by (dist, hops, path) — an independent
    // recomputation of the Yen result set under the house total order
    "g_kpaths" ->
      """WITH RECURSIVE base AS (
        |  SELECT DISTINCT 'p:'||l_partkey AS a, 's:'||l_suppkey AS b,
        |    CAST((l_partkey + l_suppkey) % 5 + 1 AS BIGINT) AS w
        |  FROM lineitem WHERE l_partkey % 20 = 0),
        |e AS (SELECT a AS src, b AS dst, CAST(w AS DOUBLE) AS w FROM base
        |      UNION SELECT b, a, CAST(w AS DOUBLE) FROM base),
        |walk AS (
        |  SELECT 's:40' AS id, CAST(0 AS DOUBLE) AS d, 0 AS hops, 's:40' AS path
        |  UNION ALL
        |  SELECT e.dst, wk.d + e.w, wk.hops + 1, wk.path || '>' || e.dst
        |  FROM walk wk JOIN e ON wk.id = e.src
        |  WHERE wk.hops < 3 AND wk.id <> 'p:20'
        |    AND position('>' || e.dst || '>' IN '>' || wk.path || '>') = 0
        |)
        |SELECT CAST(row_number() OVER (ORDER BY d, hops, path) AS BIGINT) AS rank,
        |       CAST(d AS BIGINT) AS dist, CAST(hops AS BIGINT) AS hops, path
        |FROM walk WHERE id = 'p:20'
        |ORDER BY rank LIMIT 7""".stripMargin,
    // modularity of the SQL-replayable LPA partition: Q = internal/2m −
    // Σtot²/(2m)² from exact integer counts (same double ops as the
    // Scala side); louvain_ge_lpa pinned 1 = the quality floor
    "g_modularity" -> modularityOracle,
    // distributed-louvain quality gate: SAME oracle — q_lpa pins the
    // closed-form arithmetic, louvain_ge_lpa=1 pins the quality floor
    "g_modularity_dist" -> modularityOracle,
    // Leiden quality floor: same oracle shape (column name kept so the
    // SQL is shared verbatim; the flag means "leiden >= lpa" here)
    "g_modularity_leiden" -> modularityOracle,
    // modularityOptimization quality floor: same oracle shape again
    // (the flag means "flat move phase >= lpa" here)
    "g_modopt_ok" -> modularityOracle,
    // ANN recall floors: the Spark side measures recall vs its exact
    // twin and clamps to booleans; the oracle pins both to 1
    "e_recall" ->
      """SELECT CAST(1 AS BIGINT) AS e2_recall_ok,
        |       CAST(1 AS BIGINT) AS e3_recall_ok,
        |       CAST(1 AS BIGINT) AS e6_recall_ok,
        |       CAST(1 AS BIGINT) AS e7_improve_ok,
        |       CAST(1 AS BIGINT) AS e7_k_ok,
        |       CAST(1 AS BIGINT) AS e8_recall_ok""".stripMargin,
    "d_recall" ->
      """SELECT CAST(1 AS BIGINT) AS d2_recall_ok, CAST(1 AS BIGINT) AS d2_subset_ok,
        |  CAST(1 AS BIGINT) AS d5lsh_recall_ok, CAST(1 AS BIGINT) AS d5lsh_subset_ok,
        |  CAST(1 AS BIGINT) AS d5sim_recall_ok, CAST(1 AS BIGINT) AS d5sim_subset_ok""".stripMargin,
    // D9 planted twin (r14): the oracle recomputes EVERYTHING with
    // zero knowledge of the Spark path — same synthesized vectors,
    // within-(id%2)-cluster pairs, list_cosine_similarity >= 0.9,
    // transitive min-id closure over the near-dup graph, keeper =
    // smallest group member. Comparisons sit >= 0.05 from the
    // threshold by construction, so FP representation can't flip them.
    "d9_planted" ->
      """WITH RECURSIVE ids AS (SELECT vec_id AS id FROM embeddings),
        |cl AS (SELECT id,
        |  CAST(CASE WHEN id % 97 = 0 THEN id + 2 ELSE id % 2 END AS BIGINT)
        |    AS cluster FROM ids),
        |vecs AS (SELECT id,
        |  [CAST((CASE WHEN id % 4 = j THEN 1.0 ELSE 0.0 END)
        |     + ((id*31 + j*17) % 7 - 3) / 1000.0 AS DOUBLE)
        |   FOR j IN [0,1,2,3,4,5,6,7]] AS v FROM ids),
        |pairs AS (
        |  SELECT a.id AS id1, b.id AS id2
        |  FROM vecs a, cl ca, vecs b, cl cb
        |  WHERE ca.id = a.id AND cb.id = b.id
        |    AND ca.cluster = cb.cluster AND a.id < b.id
        |    AND list_cosine_similarity(a.v, b.v) >= 0.9),
        |nbr AS (SELECT id1 AS id, id2 AS nb FROM pairs
        |        UNION ALL SELECT id2, id1 FROM pairs),
        |reach AS (
        |  SELECT id, id AS lbl FROM ids
        |  UNION
        |  SELECT n.id, r.lbl FROM nbr n JOIN reach r ON r.id = n.nb),
        |comp AS (SELECT id, min(lbl) AS keeper, count(*) AS cnt
        |         FROM reach GROUP BY id)
        |SELECT c.id, cl.cluster,
        |  CASE WHEN cnt = 1 THEN 'unique'
        |       WHEN keeper = c.id THEN 'kept' ELSE 'dropped' END AS action,
        |  keeper
        |FROM comp c JOIN cl ON cl.id = c.id ORDER BY c.id""".stripMargin,
    // D9 invariant flags: Spark-side independent recomputations
    // (exact-twin soundness, kept-pair validity, unique iff unpaired,
    // coverage); the oracle pins 1s (the e_recall pattern)
    "d9_gate" ->
      """SELECT CAST(1 AS BIGINT) AS d9_sound_ok,
        |       CAST(1 AS BIGINT) AS d9_kept_ok,
        |       CAST(1 AS BIGINT) AS d9_unique_ok,
        |       CAST(1 AS BIGINT) AS d9_cover_ok""".stripMargin,
    "g_sssp" ->
      """WITH RECURSIVE base AS (
        |  SELECT DISTINCT 'p:'||l_partkey AS a, 's:'||l_suppkey AS b,
        |    CAST((l_partkey + l_suppkey) % 5 + 1 AS BIGINT) AS w
        |  FROM lineitem WHERE l_partkey%20=0
        |), edges AS (SELECT a AS src, b AS dst, w FROM base
        |             UNION SELECT b, a, w FROM base
        |), walk AS (
        |  SELECT 's:1' AS id, CAST(0 AS BIGINT) AS d, 0 AS hops
        |  UNION
        |  SELECT e.dst, wk.d + e.w, wk.hops + 1
        |  FROM walk wk JOIN edges e ON wk.id = e.src WHERE wk.hops < 8
        |)
        |SELECT id, min(d) AS dist FROM walk GROUP BY 1 ORDER BY 1""".stripMargin,
    "g_nodesim" ->
      """WITH e AS (SELECT DISTINCT 'p:'||l_partkey AS p, 's:'||l_suppkey AS s
        |  FROM lineitem WHERE l_partkey%20=0),
        |sz AS (SELECT p, count(*) AS n FROM e GROUP BY 1),
        |i AS (SELECT a.p AS id1, b.p AS id2, count(*) AS i
        |  FROM e a JOIN e b ON a.s=b.s AND a.p<b.p GROUP BY 1,2)
        |SELECT id1, id2, floor(CAST(i AS DOUBLE)/(x.n+y.n-i) * 10000 + 0.5) / 10000 AS sim
        |FROM i JOIN sz x ON id1=x.p JOIN sz y ON id2=y.p
        |WHERE CAST(i AS DOUBLE)/(x.n+y.n-i) >= 0.2 ORDER BY 1,2""".stripMargin,
    // B44 (r15): link prediction — all four closed forms recomputed
    // independently from the symmetrized wedge join (ln = natural log
    // in both engines; DuckDB's log() is base 10, hence ln())
    "g_linkpred" ->
      """WITH e0 AS (SELECT DISTINCT 'p:'||l_partkey AS a, 's:'||l_suppkey AS b
        |  FROM lineitem WHERE l_partkey%20=0),
        |sym AS (SELECT a AS u, b AS w FROM e0 UNION SELECT b, a FROM e0),
        |deg AS (SELECT u AS id, count(*) AS d FROM sym GROUP BY 1),
        |arc AS (SELECT s.w, s.u, g.d AS dw FROM sym s JOIN deg g ON s.w = g.id),
        |pr AS (SELECT l.u AS node1, r.u AS node2,
        |    count(*) AS common_neighbors,
        |    floor(sum(1.0/ln(l.dw)) * 10000 + 0.5) / 10000 AS adamic_adar,
        |    floor(sum(1.0/l.dw) * 10000 + 0.5) / 10000 AS resource_allocation
        |  FROM arc l JOIN arc r ON l.w = r.w AND l.u < r.u GROUP BY 1, 2)
        |SELECT node1, node2, common_neighbors, adamic_adar,
        |  resource_allocation, x.d * y.d AS preferential_attachment,
        |  x.d + y.d - common_neighbors AS total_neighbors,
        |  CAST(CASE WHEN CAST(split_part(node1, ':', 2) AS BIGINT) % 7
        |          = CAST(split_part(node2, ':', 2) AS BIGINT) % 7
        |       THEN 1 ELSE 0 END AS BIGINT) AS same_community
        |FROM pr JOIN deg x ON node1 = x.id JOIN deg y ON node2 = y.id
        |ORDER BY node1, node2 LIMIT 5000""".stripMargin,
    // B12k (r12): GDS's default topK shape — rank the DIRECTED
    // expansion of the qualifying pairs per node, keep 3
    "g_nodesim_topk" ->
      """WITH e AS (SELECT DISTINCT 'p:'||l_partkey AS p, 's:'||l_suppkey AS s
        |  FROM lineitem WHERE l_partkey%20=0),
        |sz AS (SELECT p, count(*) AS n FROM e GROUP BY 1),
        |i AS (SELECT a.p AS id1, b.p AS id2, count(*) AS i
        |  FROM e a JOIN e b ON a.s=b.s AND a.p<b.p GROUP BY 1,2),
        |pr AS (SELECT id1, id2,
        |    floor(CAST(i AS DOUBLE)/(x.n+y.n-i) * 10000 + 0.5) / 10000 AS sim
        |  FROM i JOIN sz x ON id1=x.p JOIN sz y ON id2=y.p
        |  WHERE CAST(i AS DOUBLE)/(x.n+y.n-i) >= 0.2),
        |d AS (SELECT id1 AS id, id2 AS neighbor, sim FROM pr
        |  UNION ALL SELECT id2, id1, sim FROM pr)
        |SELECT id, neighbor, sim FROM d
        |QUALIFY row_number() OVER (PARTITION BY id
        |  ORDER BY sim DESC, neighbor) <= 3
        |ORDER BY id, sim DESC, neighbor""".stripMargin,
    // B12 metric variants (r12): one-formula changes of the g_nodesim
    // twin — overlap i/min, set-cosine i/sqrt(n1*n2)
    "g_nodesim_overlap" ->
      """WITH e AS (SELECT DISTINCT 'p:'||l_partkey AS p, 's:'||l_suppkey AS s
        |  FROM lineitem WHERE l_partkey%20=0),
        |sz AS (SELECT p, count(*) AS n FROM e GROUP BY 1),
        |i AS (SELECT a.p AS id1, b.p AS id2, count(*) AS i
        |  FROM e a JOIN e b ON a.s=b.s AND a.p<b.p GROUP BY 1,2)
        |SELECT id1, id2,
        |  floor(CAST(i AS DOUBLE)/least(x.n, y.n) * 10000 + 0.5) / 10000 AS sim
        |FROM i JOIN sz x ON id1=x.p JOIN sz y ON id2=y.p
        |WHERE CAST(i AS DOUBLE)/least(x.n, y.n) >= 0.5 ORDER BY 1,2""".stripMargin,
    "g_nodesim_cosine" ->
      """WITH e AS (SELECT DISTINCT 'p:'||l_partkey AS p, 's:'||l_suppkey AS s
        |  FROM lineitem WHERE l_partkey%20=0),
        |sz AS (SELECT p, count(*) AS n FROM e GROUP BY 1),
        |i AS (SELECT a.p AS id1, b.p AS id2, count(*) AS i
        |  FROM e a JOIN e b ON a.s=b.s AND a.p<b.p GROUP BY 1,2)
        |SELECT id1, id2,
        |  floor(CAST(i AS DOUBLE)/sqrt(CAST(x.n AS DOUBLE)*y.n) * 10000 + 0.5) / 10000 AS sim
        |FROM i JOIN sz x ON id1=x.p JOIN sz y ON id2=y.p
        |WHERE CAST(i AS DOUBLE)/sqrt(CAST(x.n AS DOUBLE)*y.n) >= 0.35 ORDER BY 1,2""".stripMargin,
    "g_paths" ->
      """WITH RECURSIVE edges AS (
        |  SELECT 'r:'||n_regionkey AS src, 'n:'||n_nationkey AS dst FROM nation
        |  UNION ALL SELECT 'n:'||c_nationkey, 'c:'||c_custkey FROM customer
        |  UNION ALL SELECT 'c:'||o_custkey, 'o:'||o_orderkey FROM orders
        |), walk AS (
        |  SELECT 'r:0' AS id, 0 AS dist, 'r:0' AS path
        |  UNION
        |  SELECT e.dst, w.dist+1, w.path || '>' || e.dst
        |  FROM walk w JOIN edges e ON w.id = e.src WHERE w.dist < 3
        |), best AS (
        |  SELECT id, dist, path,
        |    row_number() OVER (PARTITION BY id ORDER BY dist, path) AS rn
        |  FROM walk)
        |SELECT id, CAST(dist AS INT) AS dist, path FROM best WHERE rn = 1 ORDER BY id""".stripMargin,
    "sg_merge" ->
      """SELECT event_type AS t, count(DISTINCT user_id) AS n FROM events
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "sg_delete" ->
      """SELECT event_type AS t, count(DISTINCT user_id) AS n FROM events
        |WHERE user_id % 7 <> 0 GROUP BY 1 ORDER BY 1""".stripMargin,
    // J6 read→write composition (r12): per-user type breadth written
    // back as a prop, read back with a numeric gate
    "sg_compose" ->
      """SELECT CAST(user_id AS VARCHAR) AS u,
        |  CAST(count(DISTINCT event_type) AS VARCHAR) AS breadth
        |FROM events GROUP BY user_id
        |HAVING count(DISTINCT event_type) >= 2 ORDER BY 1""".stripMargin,
    // J6 WHERE-in-write (r12): flag uids ENDS WITH '3', trim uids
    // STARTS WITH '1', count flagged survivors per type
    "sg_where" ->
      """SELECT event_type AS t, count(DISTINCT user_id) AS n FROM events
        |WHERE CAST(user_id AS VARCHAR) LIKE '%3'
        |  AND CAST(user_id AS VARCHAR) NOT LIKE '1%'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // B6w weighted PageRank: rank·w/Σw contributions, the g_pagerank
    // recursive CTE with the weighted degree
    "g_wpagerank" ->
      """WITH RECURSIVE e AS (
        |  SELECT DISTINCT src, dst, w FROM (
        |    SELECT 'p:'||l_partkey AS src, 's:'||l_suppkey AS dst,
        |           CAST((l_partkey + l_suppkey) % 5 + 1 AS DOUBLE) AS w
        |    FROM lineitem WHERE l_partkey % 20 = 0
        |    UNION ALL
        |    SELECT 's:'||l_suppkey, 'p:'||l_partkey,
        |           CAST((l_partkey + l_suppkey) % 5 + 1 AS DOUBLE)
        |    FROM lineitem WHERE l_partkey % 20 = 0)),
        |v AS (SELECT DISTINCT src AS id FROM e),
        |wdeg AS (SELECT src, sum(w) AS wd FROM e GROUP BY 1),
        |pr AS (
        |  SELECT 0 AS it, id, CAST(1.0 AS DOUBLE) AS rank FROM v
        |  UNION ALL
        |  SELECT it+1, dst AS id, 0.15 + 0.85*msum AS rank FROM (
        |    SELECT p.it AS it, e.dst AS dst, sum(p.rank * e.w / wdeg.wd) AS msum
        |    FROM pr p JOIN e ON e.src = p.id JOIN wdeg ON wdeg.src = e.src
        |    WHERE p.it < 10 GROUP BY 1,2) s)
        |SELECT id, round(rank,4) AS rank FROM pr WHERE it=10
        |ORDER BY rank DESC, id LIMIT 20""".stripMargin,
    // B25 eigenvector: the same per-iteration-normalized power
    // iteration as a recursive CTE (window norm over the iteration's
    // sums); symmetrized edges, 8 iterations, round 6
    "g_eigen" ->
      """WITH RECURSIVE e AS (
        |  SELECT DISTINCT src, dst FROM (
        |    SELECT 'p:'||l_partkey AS src, 's:'||l_suppkey AS dst FROM lineitem WHERE l_partkey % 20 = 0
        |    UNION ALL
        |    SELECT 's:'||l_suppkey, 'p:'||l_partkey FROM lineitem WHERE l_partkey % 20 = 0)),
        |v AS (SELECT DISTINCT src AS id FROM e),
        |ev AS (
        |  SELECT 0 AS it, id, CAST(1.0 AS DOUBLE) AS x FROM v
        |  UNION ALL
        |  SELECT it, id, s / sqrt(sum(s*s) OVER (PARTITION BY it)) AS x FROM (
        |    SELECT p.it+1 AS it, e.dst AS id, sum(p.x) AS s
        |    FROM ev p JOIN e ON e.src = p.id
        |    WHERE p.it < 8 GROUP BY 1,2) t)
        |SELECT id, round(x,6) AS score FROM ev WHERE it=8
        |ORDER BY score DESC, id LIMIT 25""".stripMargin,
    // B26 HITS (Jacobi): auth from previous hubs, hub from previous
    // auths, each L2-normalized — two references to the recursive
    // table full-joined per step (bipartite: parts hub, suppliers auth)
    "g_hits" ->
      """WITH RECURSIVE e AS (
        |  SELECT DISTINCT 'p:'||l_partkey AS src, 's:'||l_suppkey AS dst
        |  FROM lineitem WHERE l_partkey % 20 = 0),
        |v AS (SELECT DISTINCT id FROM (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
        |hs AS (
        |  SELECT 0 AS it, id, CAST(1.0 AS DOUBLE) AS h, CAST(1.0 AS DOUBLE) AS a FROM v
        |  UNION ALL
        |  SELECT COALESCE(anorm.it, hnorm.it) AS it, COALESCE(anorm.id, hnorm.id) AS id,
        |         COALESCE(hnorm.h, 0.0) AS h, COALESCE(anorm.a, 0.0) AS a
        |  FROM (
        |    SELECT it, id, s / sqrt(sum(s*s) OVER (PARTITION BY it)) AS a FROM (
        |      SELECT p.it+1 AS it, e.dst AS id, sum(p.h) AS s
        |      FROM hs p JOIN e ON e.src = p.id WHERE p.it < 8 GROUP BY 1,2) t1
        |  ) anorm
        |  FULL JOIN (
        |    SELECT it, id, s / sqrt(sum(s*s) OVER (PARTITION BY it)) AS h FROM (
        |      SELECT p.it+1 AS it, e.src AS id, sum(p.a) AS s
        |      FROM hs p JOIN e ON e.dst = p.id WHERE p.it < 8 GROUP BY 1,2) t2
        |  ) hnorm USING (it, id))
        |SELECT id, round(h,6) AS hub, round(a,6) AS auth FROM hs WHERE it=8
        |ORDER BY hub DESC, auth DESC, id LIMIT 25""".stripMargin,
    // J7 CALL surface: textually-requested PageRank — the g_pagerank
    // recursive-CTE twin verbatim (CALL must not change the numbers)
    "g_call" ->
      """WITH RECURSIVE e AS (
        |  SELECT DISTINCT src, dst FROM (
        |    SELECT 'p:'||l_partkey AS src, 's:'||l_suppkey AS dst FROM lineitem WHERE l_partkey % 20 = 0
        |    UNION ALL
        |    SELECT 's:'||l_suppkey, 'p:'||l_partkey FROM lineitem WHERE l_partkey % 20 = 0)),
        |v AS (SELECT DISTINCT src AS id FROM e),
        |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
        |pr AS (
        |  SELECT 0 AS it, id, CAST(1.0 AS DOUBLE) AS rank FROM v
        |  UNION ALL
        |  SELECT it+1, dst AS id, 0.15 + 0.85*msum AS rank FROM (
        |    SELECT p.it AS it, e.dst AS dst, sum(p.rank/deg.deg) AS msum
        |    FROM pr p JOIN e ON e.src = p.id JOIN deg ON deg.src = e.src
        |    WHERE p.it < 10 GROUP BY 1,2) s)
        |SELECT id, round(rank,4) AS rank FROM pr WHERE it=10
        |ORDER BY rank DESC, id LIMIT 20""".stripMargin,
    "g_allpaths" ->
      """WITH RECURSIVE edges AS (
        |  SELECT 'r:'||n_regionkey AS src, 'n:'||n_nationkey AS dst FROM nation
        |  UNION ALL SELECT 'n:'||c_nationkey, 'c:'||c_custkey FROM customer
        |  UNION ALL SELECT 'c:'||o_custkey, 'o:'||o_orderkey FROM orders
        |), walk AS (
        |  SELECT 'r:'||r_regionkey AS root, 'r:'||r_regionkey AS id,
        |         0 AS dist, 'r:'||r_regionkey AS path FROM region
        |  UNION
        |  SELECT w.root, e.dst, w.dist+1, w.path || '>' || e.dst
        |  FROM walk w JOIN edges e ON w.id = e.src WHERE w.dist < 3
        |), md AS (SELECT root, id, min(dist) AS dist FROM walk GROUP BY 1,2)
        |SELECT w.root, w.id, CAST(w.dist AS INT) AS dist, w.path
        |FROM walk w JOIN md ON w.root=md.root AND w.id=md.id AND w.dist=md.dist
        |ORDER BY 1, 2, 4""".stripMargin,
    "g_topdeg" ->
      """SELECT l_partkey, count(DISTINCT l_suppkey) AS n_supp FROM lineitem
        |GROUP BY 1 ORDER BY n_supp DESC, l_partkey LIMIT 10""".stripMargin,
    "n1_nodemerge" ->
      """SELECT user_id, arg_min(event_type, event_id) AS first_type,
        | arg_min(props, event_id) AS first_props, count(*) AS n_events
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "n2_edgemerge" ->
      """SELECT user_id, event_type, round(arg_max(value, event_id),2) AS last_value,
        | count(*) AS n
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "p2_split" ->
      """WITH t AS (SELECT lang, n_chars,
        |  CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)),1,1) IN ('c','d') THEN 'val'
        |       WHEN substring(md5(CAST(doc_id AS VARCHAR)),1,1) IN ('e','f') THEN 'test'
        |       ELSE 'train' END AS split
        |  FROM documents)
        |SELECT lang, split, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM t GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "p3_sample" ->
      """SELECT lang, rk, doc_id FROM (
        | SELECT lang, doc_id,
        |  CAST(row_number() OVER (PARTITION BY lang
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INT) AS rk
        | FROM documents) t
        |WHERE rk <= 20 ORDER BY lang, rk""".stripMargin,
    "p4_shards" ->
      """WITH t AS (SELECT doc_id,
        |  CAST(len(string_split_regex(lower(trim(text)),'\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |  coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 2000 AS shard
        |  FROM t)
        |SELECT CAST(shard AS BIGINT) AS shard, count(*) AS n_docs,
        | CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
        | min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    // feature scaling: the same closed-form moments (min/max/Σx/Σx²/n,
    // all exact for the integer-valued l_quantity) recomputed in SQL;
    // every arithmetic step runs in DOUBLE on both engines
    // P7 (r15): DSIR — the oracle refits BOTH add-1-smoothed hashed
    // n-gram models (target = English subset) and re-derives every
    // document's log importance weight with the same 4-ln-term
    // decomposition the Spark side uses (term-for-term FP parity)
    "p7_dsir" ->
      """WITH toks AS (SELECT doc_id, lang,
        |    regexp_split_to_array(lower(trim(text)), '\s+') AS a FROM documents),
        |uni AS (SELECT doc_id, lang, a[i] AS g
        |  FROM toks, UNNEST(generate_series(1, len(a))) AS t(i)),
        |bi AS (SELECT doc_id, lang, a[i] || ' ' || a[i+1] AS g
        |  FROM toks, UNNEST(generate_series(1, len(a) - 1)) AS t(i)),
        |grams AS (SELECT doc_id, lang, substring(md5(g), 1, 2) AS b
        |  FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)),
        |rc AS (SELECT b, count(*) AS cr FROM grams GROUP BY 1),
        |tc AS (SELECT b, count(*) AS ct FROM grams WHERE lang = 'en' GROUP BY 1),
        |tot AS (SELECT (SELECT count(*) FROM grams) AS tr,
        |               (SELECT count(*) FROM grams WHERE lang = 'en') AS tt),
        |model AS (SELECT rc.b,
        |    ln(coalesce(tc.ct, 0) + 1.0) - ln(tt + 256.0)
        |    - ln(rc.cr + 1.0) + ln(tr + 256.0) AS llr
        |  FROM rc LEFT JOIN tc ON rc.b = tc.b, tot)
        |SELECT doc_id, floor(sum(llr) * 10000 + 0.5) / 10000 AS log_weight
        |FROM grams JOIN model USING (b)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // r16: the CCNet composition — langid (f3 closed form) + KN
    // perplexity (the f11 CTEs verbatim) + value-level tercile
    // thresholds + the p7 DSIR model, one decision row per doc
    "p8_ccnet" ->
      """WITH toks AS (SELECT doc_id,
        |    list_concat([chr(1), chr(1)],
        |      regexp_split_to_array(lower(trim(text)), '\s+')) AS a
        |  FROM documents),
        |pos AS (SELECT doc_id, a, i
        |  FROM toks, UNNEST(generate_series(3, len(a))) AS t(i)),
        |s AS (SELECT doc_id, a[i-2] || ' ' || a[i-1] AS c3, a[i-1] AS c2,
        |      a[i-2] AS x3, a[i] AS w FROM pos),
        |n3 AS (SELECT c3, w, CAST(count(*) AS DOUBLE) AS cnt3 FROM s GROUP BY 1,2),
        |d3 AS (SELECT c3, CAST(count(*) AS DOUBLE) AS den3,
        |       CAST(count(DISTINCT w) AS DOUBLE) AS fol3 FROM s GROUP BY 1),
        |t3 AS (SELECT DISTINCT x3, c2, w FROM s),
        |n2 AS (SELECT c2, w, CAST(count(*) AS DOUBLE) AS cnt2 FROM t3 GROUP BY 1,2),
        |d2 AS (SELECT c2, CAST(count(*) AS DOUBLE) AS den2,
        |       CAST(count(DISTINCT w) AS DOUBLE) AS fol2 FROM t3 GROUP BY 1),
        |b2 AS (SELECT DISTINCT a[i-1] AS x, a[i] AS w FROM pos),
        |n1 AS (SELECT w, CAST(count(*) AS DOUBLE) AS cnt1 FROM b2 GROUP BY 1),
        |sc AS (SELECT CAST((SELECT count(*) FROM b2) AS DOUBLE) AS den1,
        |              CAST((SELECT count(*) FROM n1) AS DOUBLE) AS v1,
        |              CAST((SELECT count(DISTINCT w) FROM s) AS DOUBLE) AS v),
        |q1 AS (SELECT s.doc_id, s.c3, s.c2, s.w,
        |    greatest(coalesce(n1.cnt1, 0) - 0.75, 0) / sc.den1
        |      + 0.75 * sc.v1 / sc.den1 * (1.0 / (sc.v + 1.0)) AS p1
        |  FROM s LEFT JOIN n1 USING (w), sc),
        |q2 AS (SELECT q1.doc_id, q1.c3, q1.w,
        |    CASE WHEN d2.den2 IS NULL THEN p1
        |         ELSE greatest(coalesce(n2.cnt2, 0) - 0.75, 0) / d2.den2
        |              + 0.75 * d2.fol2 / d2.den2 * p1 END AS p2
        |  FROM q1 LEFT JOIN n2 USING (c2, w) LEFT JOIN d2 USING (c2)),
        |q3 AS (SELECT q2.doc_id,
        |    CASE WHEN d3.den3 IS NULL THEN p2
        |         ELSE greatest(coalesce(n3.cnt3, 0) - 0.75, 0) / d3.den3
        |              + 0.75 * d3.fol3 / d3.den3 * p2 END AS p3
        |  FROM q2 LEFT JOIN n3 USING (c3, w) LEFT JOIN d3 USING (c3)),
        |ppl AS (SELECT doc_id,
        |  floor(exp(-avg(ln(p3))) * 100 + 0.5) / 100 AS ppl
        |  FROM q3 GROUP BY 1),
        |lw AS (SELECT doc_id, string_split_regex(lower(trim(text)),'\s+') AS w
        |  FROM documents),
        |lid AS (SELECT doc_id,
        |  len(list_filter(w, x->x='the')) AS en, len(list_filter(w, x->x='data')) AS de,
        |  len(list_filter(w, x->x='spark')) AS es, len(list_filter(w, x->x='query')) AS fr,
        |  len(list_filter(w, x->x='vector')) AS zh FROM lw),
        |lp AS (SELECT doc_id,
        |  CASE WHEN en=greatest(en,de,es,fr,zh) THEN 'en'
        |       WHEN de=greatest(en,de,es,fr,zh) THEN 'de'
        |       WHEN es=greatest(en,de,es,fr,zh) THEN 'es'
        |       WHEN fr=greatest(en,de,es,fr,zh) THEN 'fr'
        |       ELSE 'zh' END AS pred_lang,
        |  CASE WHEN greatest(en,de,es,fr,zh) > 0 THEN 1 ELSE 0 END AS lang_known
        |  FROM lid),
        |dt AS (SELECT doc_id, lang,
        |    regexp_split_to_array(lower(trim(text)), '\s+') AS a FROM documents),
        |uni AS (SELECT doc_id, lang, a[i] AS g
        |  FROM dt, UNNEST(generate_series(1, len(a))) AS t(i)),
        |bi AS (SELECT doc_id, lang, a[i] || ' ' || a[i+1] AS g
        |  FROM dt, UNNEST(generate_series(1, len(a) - 1)) AS t(i)),
        |grams AS (SELECT doc_id, lang, substring(md5(g), 1, 2) AS b
        |  FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)),
        |rc AS (SELECT b, count(*) AS cr FROM grams GROUP BY 1),
        |tc AS (SELECT b, count(*) AS ct FROM grams WHERE lang = 'en' GROUP BY 1),
        |tot AS (SELECT (SELECT count(*) FROM grams) AS tr,
        |               (SELECT count(*) FROM grams WHERE lang = 'en') AS tt),
        |model AS (SELECT rc.b,
        |    ln(coalesce(tc.ct, 0) + 1.0) - ln(tt + 256.0)
        |    - ln(rc.cr + 1.0) + ln(tr + 256.0) AS llr
        |  FROM rc LEFT JOIN tc ON rc.b = tc.b, tot),
        |dsir AS (SELECT doc_id, floor(sum(llr) * 10000 + 0.5) / 10000 AS log_weight
        |  FROM grams JOIN model USING (b) GROUP BY 1),
        |j AS (SELECT lp.doc_id, lp.pred_lang, lp.lang_known, ppl.ppl,
        |      dsir.log_weight
        |  FROM lp JOIN ppl USING (doc_id) JOIN dsir USING (doc_id)),
        |vals AS (SELECT pred_lang, ppl, count(*) AS c FROM j GROUP BY 1, 2),
        |cum AS (SELECT pred_lang, ppl,
        |    sum(c) OVER (PARTITION BY pred_lang ORDER BY ppl) AS cm,
        |    sum(c) OVER (PARTITION BY pred_lang) AS n FROM vals),
        |th AS (SELECT pred_lang,
        |    min(CASE WHEN cm * 3 >= n THEN ppl END) AS t1,
        |    min(CASE WHEN cm * 3 >= n * 2 THEN ppl END) AS t2
        |  FROM cum GROUP BY 1)
        |SELECT j.doc_id, j.pred_lang, j.ppl,
        |  CASE WHEN j.ppl <= th.t1 THEN 'head'
        |       WHEN j.ppl <= th.t2 THEN 'middle' ELSE 'tail' END AS ppl_bucket,
        |  j.log_weight,
        |  CAST(CASE WHEN j.lang_known = 0 THEN 0
        |       WHEN j.ppl > th.t2 THEN 0 ELSE 1 END AS INT) AS keep,
        |  CASE WHEN j.lang_known = 0 THEN 'lang_unknown'
        |       WHEN j.ppl > th.t2 THEN 'ppl_tail' ELSE 'kept' END AS reason
        |FROM j JOIN th USING (pred_lang)
        |ORDER BY j.doc_id""".stripMargin,
    "p6_scale" ->
      """WITH s AS (SELECT
        |  CAST(min(l_quantity) AS DOUBLE) AS mn,
        |  CAST(max(l_quantity) AS DOUBLE) AS mx,
        |  sum(CAST(l_quantity AS DOUBLE)) AS sm,
        |  sum(CAST(l_quantity AS DOUBLE) * CAST(l_quantity AS DOUBLE)) AS sq,
        |  CAST(count(l_quantity) AS DOUBLE) AS n FROM lineitem)
        |SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  round(CASE WHEN mx = mn THEN 0
        |    ELSE (CAST(l_quantity AS DOUBLE) - mn) / (mx - mn) END, 6) AS q_minmax,
        |  round(CASE WHEN sq/n - (sm/n)*(sm/n) <= 0 THEN 0
        |    ELSE (CAST(l_quantity AS DOUBLE) - sm/n)
        |         / sqrt(sq/n - (sm/n)*(sm/n)) END, 6) AS q_std
        |FROM lineitem, s WHERE l_orderkey % 50 = 0
        |ORDER BY 1, 2""".stripMargin,
    // the curation pipeline prefix (quality gate + exact dedup — the
    // LSH stage disabled, so every decision has a SQL closed form):
    // low_quality = F2's integer-exact score under 0.3; exact_dup =
    // not the min doc_id of its md5(normalized text) group; kept = the
    // rest. The full pipeline stays rows-only (p1_curate) with its
    // LSH stage carried by d_recall + specs.
    "p1_curate_sql" ->
      """WITH t AS (SELECT doc_id, lang, lower(trim(text)) AS lt,
        |    string_split_regex(lower(trim(text)),'\s+') AS w FROM documents),
        |q AS (SELECT doc_id, lang, lt,
        |  floor(((4*least(len(w),100)*len(w) + 400*len(list_distinct(w))
        |          + 200*len(list_filter(w, x -> x='the' OR x='a')))*20000
        |         + 1000*len(w)) / (1000*len(w)*2)) / 10000.0 AS quality
        |  FROM t),
        |lab AS (SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY md5(lt) ORDER BY doc_id) AS rn
        |  FROM q WHERE quality >= 0.3)
        |SELECT doc_id, lang, CAST(0 AS INT) AS keep, 'low_quality' AS reason
        |  FROM q WHERE quality < 0.3
        |UNION ALL
        |SELECT doc_id, lang, CAST(0 AS INT), 'exact_dup' FROM lab WHERE rn > 1
        |UNION ALL
        |SELECT doc_id, lang, CAST(1 AS INT), 'kept' FROM lab WHERE rn = 1
        |ORDER BY doc_id""".stripMargin,
    // winnowing fingerprints under the oracle-replicable base-31
    // polynomial gram hash (exact 64-bit integer arithmetic both
    // engines): the window min, the tail boundary guard, and the
    // per-doc dedup are all independently recomputed here
    "f4_fp_sql" ->
      """WITH t AS (SELECT doc_id, lower(trim(text)) AS t FROM documents
        |  WHERE len(lower(trim(text))) >= 8),
        |p AS (SELECT doc_id, t, unnest(generate_series(1, len(t) - 7)) - 1 AS pos,
        |  len(t) - 8 AS last_start FROM t),
        |h AS (SELECT doc_id, pos, last_start,
        |  (CAST(ord(substr(t, pos + 1, 1)) AS BIGINT) * 27512614111
        |   + CAST(ord(substr(t, pos + 2, 1)) AS BIGINT) * 887503681
        |   + CAST(ord(substr(t, pos + 3, 1)) AS BIGINT) * 28629151
        |   + CAST(ord(substr(t, pos + 4, 1)) AS BIGINT) * 923521
        |   + CAST(ord(substr(t, pos + 5, 1)) AS BIGINT) * 29791
        |   + CAST(ord(substr(t, pos + 6, 1)) AS BIGINT) * 961
        |   + CAST(ord(substr(t, pos + 7, 1)) AS BIGINT) * 31
        |   + CAST(ord(substr(t, pos + 8, 1)) AS BIGINT)) % 1000003 AS h
        |  FROM p),
        |wm AS (SELECT doc_id,
        |  CASE WHEN pos <= last_start - 15 THEN
        |    min(h) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) END AS wmin
        |  FROM h)
        |SELECT DISTINCT doc_id, CAST(wmin AS BIGINT) AS fp FROM wm
        |WHERE wmin IS NOT NULL ORDER BY 1, 2""".stripMargin,
    "d1_exact" ->
      """SELECT md5(lower(trim(text))) AS text_hash, min(doc_id) AS keeper,
        | count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY keeper""".stripMargin,
    "d4_jaccard" ->
      """WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
        |  FROM documents),
        |s AS (SELECT doc_id,
        |  list_distinct([w[i]||' '||w[i+1]||' '||w[i+2] FOR i IN generate_series(1, len(w)-2)]) AS sh
        |  FROM t),
        |e AS (SELECT doc_id, unnest(sh) AS g FROM s),
        |sz AS (SELECT doc_id, len(sh) AS n FROM s),
        |inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS i
        |  FROM e a JOIN e b ON a.g=b.g AND a.doc_id<b.doc_id GROUP BY 1,2)
        |SELECT id1, id2, floor(CAST(i AS DOUBLE)/(x.n+y.n-i) * 10000 + 0.5) / 10000 AS jaccard
        |FROM inter JOIN sz x ON inter.id1=x.doc_id JOIN sz y ON inter.id2=y.doc_id
        |WHERE CAST(i AS DOUBLE)/(x.n+y.n-i) >= 0.5 ORDER BY 1,2""".stripMargin,
    "d7_clusters" ->
      """WITH RECURSIVE t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
        |  FROM documents),
        |s AS (SELECT doc_id,
        |  list_distinct([w[i]||' '||w[i+1]||' '||w[i+2] FOR i IN generate_series(1, len(w)-2)]) AS sh
        |  FROM t),
        |e AS (SELECT doc_id, unnest(sh) AS g FROM s),
        |sz AS (SELECT doc_id, len(sh) AS n FROM s),
        |inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS i
        |  FROM e a JOIN e b ON a.g=b.g AND a.doc_id<b.doc_id GROUP BY 1,2),
        |pairs AS (SELECT id1, id2
        |  FROM inter JOIN sz x ON inter.id1=x.doc_id JOIN sz y ON inter.id2=y.doc_id
        |  WHERE CAST(i AS DOUBLE)/(x.n+y.n-i) >= 0.5),
        |edges AS (SELECT id1 AS src, id2 AS dst FROM pairs UNION SELECT id2, id1 FROM pairs),
        |reach AS (
        |  SELECT src AS id, src AS r FROM edges
        |  UNION
        |  SELECT e2.dst, r.r FROM reach r JOIN edges e2 ON r.id = e2.src
        |)
        |SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS cluster
        |FROM reach GROUP BY 1 ORDER BY 1""".stripMargin,
    "d5_embdup" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding
        |  FROM embeddings)
        |SELECT a.vec_id AS id1, b.vec_id AS id2,
        | round(list_cosine_similarity(a.embedding, b.embedding),4) AS cos_sim
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4
        |ORDER BY 1,2""".stripMargin,
    "e1_topk" ->
      """WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings),
        |q AS (SELECT vec_id AS q_id, embedding AS qv FROM c WHERE vec_id < 8)
        |SELECT q_id, rank, neighbor, cos_sim FROM (
        | SELECT q_id,
        |  CAST(row_number() OVER (PARTITION BY q_id
        |    ORDER BY list_cosine_similarity(qv, embedding) DESC, vec_id) AS INT) AS rank,
        |  vec_id AS neighbor, round(list_cosine_similarity(qv, embedding),4) AS cos_sim
        | FROM q JOIN c ON vec_id <> q_id
        |) t WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,
    "e4_radius" ->
      """WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS q_id, v AS qv FROM c WHERE vec_id < 8)
        |SELECT q_id, vec_id AS neighbor,
        | round(list_cosine_similarity(qv, v), 4) AS cos_sim
        |FROM q JOIN c ON vec_id <> q_id
        |WHERE list_cosine_similarity(qv, v) >= 0.3
        |ORDER BY 1, 2""".stripMargin,
    "e5_knnlabel" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings),
        |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 8),
        |knn AS (SELECT q_id, label FROM (
        |  SELECT q_id, label, row_number() OVER (PARTITION BY q_id
        |    ORDER BY list_cosine_similarity(qv, v) DESC, vec_id) AS rn
        |  FROM q JOIN e ON vec_id >= 8) t WHERE rn <= 10),
        |votes AS (SELECT q_id, label, CAST(count(*) AS BIGINT) AS votes
        |  FROM knn GROUP BY 1, 2)
        |SELECT q_id, label AS pred_label, votes FROM (
        | SELECT *, row_number() OVER (PARTITION BY q_id
        |   ORDER BY votes DESC, label) AS vr FROM votes) t
        |WHERE vr = 1 ORDER BY q_id""".stripMargin,
    // F9 (r12): identical synthetic-PII construction, RE2 replacements
    // must equal Java's on these lookaround-free patterns
    "f9_redact" ->
      """SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(
        |  text || ' contact user' || CAST(doc_id AS VARCHAR)
        |    || '@mail-' || CAST(doc_id AS VARCHAR)
        |    || '.example.com from 10.' || CAST(doc_id % 200 AS VARCHAR)
        |    || '.0.' || CAST(doc_id % 250 AS VARCHAR)
        |    || ' call +1 555 01' || CAST(doc_id AS VARCHAR),
        |  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |  '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |  '\+\d[\d ()-]{6,}\d', '<PHONE>', 'g') AS red
        |FROM documents ORDER BY doc_id LIMIT 300""".stripMargin,
    // F9+ (r14): the oracle recomputes the LUHN SUM itself (integer
    // arithmetic over reversed substr positions) from the same
    // synthesized card — an independent checksum recomputation, so a
    // broken doubling rule or position parity goes red here
    "f9_luhn" ->
      """WITH syn AS (SELECT doc_id,
        |    '4532' || lpad(CAST(doc_id * 7919 % 1000000000000 AS VARCHAR), 12, '0') AS num,
        |    text || ' ssn ' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
        |      || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || '-'
        |      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |      || ' card 4532'
        |      || lpad(CAST(doc_id * 7919 % 1000000000000 AS VARCHAR), 12, '0')
        |      || ' end' AS synth
        |  FROM documents),
        |base AS (SELECT doc_id, num,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(synth,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |    '\+\d[\d ()-]{6,}\d', '<PHONE>', 'g'),
        |    '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g') AS red0
        |  FROM syn),
        |luhn AS (SELECT doc_id, num, red0,
        |  list_sum([CASE WHEN i % 2 = 0 THEN
        |      CASE WHEN 2*CAST(substr(reverse(num), i, 1) AS INT) > 9
        |           THEN 2*CAST(substr(reverse(num), i, 1) AS INT) - 9
        |           ELSE 2*CAST(substr(reverse(num), i, 1) AS INT) END
        |    ELSE CAST(substr(reverse(num), i, 1) AS INT) END
        |   FOR i IN [1,2,3,4,5,6,7,8,9,10,11,12,13,14,15,16]]) % 10 = 0 AS ok
        |  FROM base)
        |SELECT doc_id, CASE WHEN ok THEN replace(red0, num, '<CARD>')
        |                    ELSE red0 END AS red
        |FROM luhn ORDER BY doc_id LIMIT 300""".stripMargin,
    "f10_bpe" -> f10BpeOracle,
    "p4_shards_bpe" -> p4ShardsBpeOracle,
    // r16 P9: fixed-length sequence packing — the same exclusive
    // prefix sum, each doc's token interval split at seqLen multiples
    "p9_pack" ->
      """WITH t AS (SELECT doc_id,
        |  CAST(len(string_split_regex(lower(trim(text)),'\s+')) AS BIGINT) AS n
        |  FROM documents),
        |c AS (SELECT doc_id, n,
        |  CAST(coalesce(sum(n) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum
        |  FROM t),
        |spans AS (SELECT doc_id, n, cum, seq_id
        |  FROM c, UNNEST(generate_series(cum // 512, (cum + n - 1) // 512)) AS u(seq_id)
        |  WHERE n > 0)
        |SELECT doc_id, CAST(seq_id AS BIGINT) AS seq_id,
        |  CAST(greatest(cum, seq_id * 512) - cum AS BIGINT) AS doc_offset,
        |  CAST(greatest(cum, seq_id * 512) - seq_id * 512 AS BIGINT) AS seq_offset,
        |  CAST(least(cum + n, (seq_id + 1) * 512) - greatest(cum, seq_id * 512) AS BIGINT) AS len
        |FROM spans ORDER BY doc_id, seq_id""".stripMargin,
    // F11 (r15): interpolated Kneser-Ney trigram perplexity — the
    // oracle refits every count table (raw trigram counts, distinct-
    // type continuation counts, unigram scalars) and re-derives each
    // token's probability with the SAME expression shape (operation-
    // for-operation FP parity with the Spark column arithmetic)
    "f11_ppl" ->
      """WITH toks AS (SELECT doc_id,
        |    list_concat([chr(1), chr(1)],
        |      regexp_split_to_array(lower(trim(text)), '\s+')) AS a
        |  FROM documents),
        |pos AS (SELECT doc_id, a, i
        |  FROM toks, UNNEST(generate_series(3, len(a))) AS t(i)),
        |s AS (SELECT doc_id, a[i-2] || ' ' || a[i-1] AS c3, a[i-1] AS c2,
        |      a[i-2] AS x3, a[i] AS w FROM pos),
        |n3 AS (SELECT c3, w, CAST(count(*) AS DOUBLE) AS cnt3 FROM s GROUP BY 1,2),
        |d3 AS (SELECT c3, CAST(count(*) AS DOUBLE) AS den3,
        |       CAST(count(DISTINCT w) AS DOUBLE) AS fol3 FROM s GROUP BY 1),
        |t3 AS (SELECT DISTINCT x3, c2, w FROM s),
        |n2 AS (SELECT c2, w, CAST(count(*) AS DOUBLE) AS cnt2 FROM t3 GROUP BY 1,2),
        |d2 AS (SELECT c2, CAST(count(*) AS DOUBLE) AS den2,
        |       CAST(count(DISTINCT w) AS DOUBLE) AS fol2 FROM t3 GROUP BY 1),
        |b2 AS (SELECT DISTINCT a[i-1] AS x, a[i] AS w FROM pos),
        |n1 AS (SELECT w, CAST(count(*) AS DOUBLE) AS cnt1 FROM b2 GROUP BY 1),
        |sc AS (SELECT CAST((SELECT count(*) FROM b2) AS DOUBLE) AS den1,
        |              CAST((SELECT count(*) FROM n1) AS DOUBLE) AS v1,
        |              CAST((SELECT count(DISTINCT w) FROM s) AS DOUBLE) AS v),
        |q1 AS (SELECT s.doc_id, s.c3, s.c2, s.w,
        |    greatest(coalesce(n1.cnt1, 0) - 0.75, 0) / sc.den1
        |      + 0.75 * sc.v1 / sc.den1 * (1.0 / (sc.v + 1.0)) AS p1
        |  FROM s LEFT JOIN n1 USING (w), sc),
        |q2 AS (SELECT q1.doc_id, q1.c3, q1.w,
        |    CASE WHEN d2.den2 IS NULL THEN p1
        |         ELSE greatest(coalesce(n2.cnt2, 0) - 0.75, 0) / d2.den2
        |              + 0.75 * d2.fol2 / d2.den2 * p1 END AS p2
        |  FROM q1 LEFT JOIN n2 USING (c2, w) LEFT JOIN d2 USING (c2)),
        |q3 AS (SELECT q2.doc_id,
        |    CASE WHEN d3.den3 IS NULL THEN p2
        |         ELSE greatest(coalesce(n3.cnt3, 0) - 0.75, 0) / d3.den3
        |              + 0.75 * d3.fol3 / d3.den3 * p2 END AS p3
        |  FROM q2 LEFT JOIN n3 USING (c3, w) LEFT JOIN d3 USING (c3))
        |SELECT doc_id, count(*) AS n_scored,
        |  floor(-avg(ln(p3)) * 10000 + 0.5) / 10000 AS avg_nll,
        |  floor(exp(-avg(ln(p3))) * 100 + 0.5) / 100 AS ppl
        |FROM q3 GROUP BY 1 ORDER BY 1""".stripMargin,
    "f1_tokens" ->
      """SELECT doc_id,
        | CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT) AS ws_tokens,
        | CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS re_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "f2_quality" ->
      """WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)),'\s+') AS w,
        |  lower(trim(text)) AS lt FROM documents)
        |SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
        | round(CAST(len(list_distinct(w)) AS DOUBLE)/len(w),4) AS diversity,
        | round(CAST(len(list_filter(w, x -> x='the' OR x='a')) AS DOUBLE)/len(w),4) AS stop_ratio,
        | round(CAST(length(regexp_replace(lt, '\s+', '', 'g')) AS DOUBLE)/len(w),4) AS mean_word_len,
        | floor(((4*least(len(w),100)*len(w) + 400*len(list_distinct(w))
        |          + 200*len(list_filter(w, x -> x='the' OR x='a')))*20000
        |         + 1000*len(w)) / (1000*len(w)*2)) / 10000.0 AS quality
        |FROM t ORDER BY doc_id""".stripMargin,
    "f3_langid" ->
      """WITH t AS (SELECT doc_id, lang, string_split_regex(lower(trim(text)),'\s+') AS w FROM documents),
        |sc AS (SELECT doc_id, lang,
        |  len(list_filter(w, x->x='the')) AS en, len(list_filter(w, x->x='data')) AS de,
        |  len(list_filter(w, x->x='spark')) AS es, len(list_filter(w, x->x='query')) AS fr,
        |  len(list_filter(w, x->x='vector')) AS zh FROM t),
        |p AS (SELECT lang AS labeled,
        |  CASE WHEN en=greatest(en,de,es,fr,zh) THEN 'en'
        |       WHEN de=greatest(en,de,es,fr,zh) THEN 'de'
        |       WHEN es=greatest(en,de,es,fr,zh) THEN 'es'
        |       WHEN fr=greatest(en,de,es,fr,zh) THEN 'fr'
        |       ELSE 'zh' END AS predicted FROM sc)
        |SELECT labeled, predicted, count(*) AS n FROM p GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "f6_ngrams" ->
      """WITH t AS (SELECT doc_id, lang, string_split_regex(lower(trim(text)),'\s+') AS w FROM documents),
        |words AS (SELECT doc_id, lang, unnest(w) AS word, generate_subscripts(w,1) AS pos FROM t),
        |b AS (SELECT a.lang, a.word || ' ' || x.word AS bigram
        |      FROM words a JOIN words x ON a.doc_id=x.doc_id AND x.pos=a.pos+1),
        |c AS (SELECT lang, bigram, count(*) AS n FROM b GROUP BY 1,2),
        |r AS (SELECT lang, bigram, n,
        |        CAST(row_number() OVER (PARTITION BY lang ORDER BY n DESC, bigram) AS INT) AS rk
        |      FROM c)
        |SELECT lang, rk, bigram, n FROM r WHERE rk <= 10 ORDER BY lang, rk""".stripMargin,
    "f7_decontam" ->
      """WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)),'\s+') AS w FROM documents),
        |s AS (SELECT doc_id,
        |  list_distinct([w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]
        |                 FOR i IN generate_series(1, len(w)-3)]) AS sh FROM t),
        |e AS (SELECT doc_id, unnest(sh) AS g FROM s),
        |ev AS (SELECT DISTINCT g FROM e WHERE doc_id % 97 = 0),
        |tr AS (SELECT doc_id, g FROM e WHERE doc_id % 97 <> 0),
        |sz AS (SELECT doc_id, count(*) AS n_grams FROM tr GROUP BY 1),
        |sh AS (SELECT tr.doc_id, count(*) AS n_shared
        |       FROM tr JOIN ev ON tr.g = ev.g GROUP BY 1)
        |SELECT sh.doc_id, n_shared, n_grams,
        |  round(CAST(n_shared AS DOUBLE)/n_grams, 4) AS overlap
        |FROM sh JOIN sz ON sh.doc_id = sz.doc_id ORDER BY sh.doc_id""".stripMargin,
    "f8_repetition" ->
      """WITH base AS (SELECT doc_id, unnest(string_split_regex(lower(trim(text)),'\s+')) AS w,
        |  generate_subscripts(string_split_regex(lower(trim(text)),'\s+'),1) AS pos FROM documents),
        |wc AS (SELECT doc_id, w, count(*) AS c FROM base GROUP BY 1,2),
        |ws AS (SELECT doc_id, sum(c) AS nw, count(*) AS dw, max(c) AS topc FROM wc GROUP BY 1),
        |tri AS (SELECT a.doc_id, a.w||' '||b.w||' '||c.w AS g
        |        FROM base a JOIN base b ON a.doc_id=b.doc_id AND b.pos=a.pos+1
        |                    JOIN base c ON a.doc_id=c.doc_id AND c.pos=a.pos+2),
        |tc AS (SELECT doc_id, g, count(*) AS c FROM tri GROUP BY 1,2),
        |ts AS (SELECT doc_id, sum(c) AS n3, count(*) AS d3 FROM tc GROUP BY 1)
        |SELECT ws.doc_id,
        |  round(CAST(nw-dw AS DOUBLE)/nw, 4) AS dup_word_frac,
        |  round(CAST(topc AS DOUBLE)/nw, 4) AS top_word_frac,
        |  coalesce(round(CAST(n3-d3 AS DOUBLE)/n3, 4), 0.0) AS dup_3gram_frac,
        |  CAST(CAST(topc AS DOUBLE)/nw >= 0.12 AS INT) AS repetitive
        |FROM ws LEFT JOIN ts ON ws.doc_id = ts.doc_id ORDER BY ws.doc_id""".stripMargin,
    "d6_boilerplate" ->
      """WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)),'\s+') AS w FROM documents),
        |e AS (SELECT DISTINCT doc_id,
        |  unnest([w[i]||' '||w[i+1]||' '||w[i+2] FOR i IN generate_series(1, len(w)-2)]) AS g FROM t)
        |SELECT g, count(*) AS df, min(doc_id) AS first_doc
        |FROM e GROUP BY g HAVING count(*) >= 5 ORDER BY df DESC, g""".stripMargin,
    "p5_weighted" ->
      """WITH t AS (SELECT doc_id, lang, n_chars,
        |  lpad(lower(hex((least(n_chars, 400) * 65536) // 400)), 4, '0') AS thr,
        |  substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS u
        | FROM documents)
        |SELECT doc_id, lang, n_chars FROM t
        |WHERE n_chars >= 400 OR u < thr ORDER BY doc_id""".stripMargin,
    "f5_corpus" ->
      """SELECT source, lang, count(*) AS n_docs,
        | CAST(sum(n_chars) AS BIGINT) AS total_chars,
        | round(avg(len(string_split_regex(lower(trim(text)),'\s+'))),2) AS avg_words
        |FROM documents GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
  )
}
