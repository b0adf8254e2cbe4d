package graft

import org.apache.spark.sql.functions._

import graft.graph.{CypherLite, CypherWrite}

/** CypherWrite MERGE semantics on reference-shaped statements
  * (events.py's own idioms), checked against hand-applied expected
  * graphs and read back through CypherLite. */
class CypherWriteSpec extends SparkSpec {
  import spark.implicits._

  private def nodeMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[String]("label"), r.getAs[String]("id")) ->
      r.getAs[Map[String, String]]("props")).toMap

  test("reference idiom: MERGE + ON CREATE SET + ON MATCH SET coalesce") {
    val (n0, e0) = CypherWrite.emptyGraph(spark)
    val stmt =
      """MERGE (p:Process {key: $key})
        |ON CREATE SET p.image = $image, p.CommandLine = $CommandLine
        |ON MATCH SET p.image = coalesce($image, p.image),
        |             p.CommandLine = coalesce($CommandLine, p.CommandLine)""".stripMargin
    // create
    val (n1, e1) = CypherWrite.mergeOne(n0, e0, stmt,
      Map("key" -> "t1:100", "image" -> "cmd.exe", "CommandLine" -> "cmd /c whoami"))
    assert(nodeMap(n1) == Map(("Process", "t1:100") ->
      Map("key" -> "t1:100", "image" -> "cmd.exe", "CommandLine" -> "cmd /c whoami")))
    // match with one null param: coalesce keeps the stored value
    val (n2, _) = CypherWrite.mergeOne(n1, e1, stmt,
      Map("key" -> "t1:100", "image" -> "powershell.exe", "CommandLine" -> null))
    assert(nodeMap(n2) == Map(("Process", "t1:100") ->
      Map("key" -> "t1:100", "image" -> "powershell.exe",
        "CommandLine" -> "cmd /c whoami")))
    // re-running identically is idempotent
    val (n3, _) = CypherWrite.mergeOne(n2, e1, stmt,
      Map("key" -> "t1:100", "image" -> "powershell.exe", "CommandLine" -> null))
    assert(nodeMap(n3) == nodeMap(n2))
  }

  test("multi-clause statement: two node MERGEs and an edge MERGE with props") {
    val (n0, e0) = CypherWrite.emptyGraph(spark)
    val stmt =
      """MERGE (t:Trace {traceID: $traceID})
        |MERGE (p:Process {key: $key})
        |MERGE (t)-[r:HAS_PROCESS {kind: 'direct'}]->(p)
        |ON CREATE SET r.first = $eid""".stripMargin
    val (n1, e1) = CypherWrite.mergeOne(n0, e0, stmt,
      Map("traceID" -> "t1", "key" -> "t1:100", "eid" -> "7"))
    assert(nodeMap(n1).keySet == Set(("Trace", "t1"), ("Process", "t1:100")))
    val edges1 = e1.collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
      r.getAs[Map[String, String]]("props")))
    assert(edges1.toSeq == Seq(("HAS_PROCESS", "t1", "t1:100",
      Map("kind" -> "direct", "first" -> "7"))))
    // edge re-merge: no duplicate, ON CREATE does not refire
    val (n2, e2) = CypherWrite.mergeOne(n1, e1, stmt,
      Map("traceID" -> "t1", "key" -> "t1:100", "eid" -> "99"))
    assert(e2.count() == 1)
    assert(e2.collect().head.getAs[Map[String, String]]("props")("first") == "7")
    assert(n2.count() == 2)
  }

  test("batch parameters: row order wins per key; distinct keys all land") {
    val (n0, e0) = CypherWrite.emptyGraph(spark)
    val params = Seq(
      ("f1", "a.dll"), ("f2", "b.dll"), ("f1", "a_final.dll")
    ).toDF("path", "image")
    val (n1, _) = CypherWrite.merge(n0, e0,
      "MERGE (f:File {path: $path}) SET f.image = $image", params)
    val m = nodeMap(n1)
    assert(m.keySet == Set(("File", "f1"), ("File", "f2")))
    assert(m(("File", "f1"))("image") == "a_final.dll") // later row won
    assert(m(("File", "f2"))("image") == "b.dll")
  }

  test("MATCH clause: the edge lands only when the matched node exists") {
    val (n0, e0) = CypherWrite.emptyGraph(spark)
    val (n1, e1) = CypherWrite.mergeOne(n0, e0,
      "MERGE (t:Trace {traceID: 't1'})")
    val stmt =
      """MERGE (p:Process {key: $key})
        |WITH p
        |MATCH (t:Trace {traceID: $traceID})
        |MERGE (t)-[:HAS_PROCESS]->(p)""".stripMargin
    // matching trace exists → edge created
    val (n2, e2) = CypherWrite.mergeOne(n1, e1, stmt,
      Map("key" -> "t1:100", "traceID" -> "t1"))
    assert(e2.count() == 1)
    // no such trace → process still merged, edge skipped
    val (n3, e3) = CypherWrite.mergeOne(n2, e2, stmt,
      Map("key" -> "tX:1", "traceID" -> "missing"))
    assert(e3.count() == 1)
    assert(nodeMap(n3).contains(("Process", "tX:1")))
  }

  test("the merged graph reads back through CypherLite") {
    val (n0, e0) = CypherWrite.emptyGraph(spark)
    val params = Seq(
      ("t1", "t1:100", "cmd.exe"), ("t1", "t1:200", "evil.exe"),
      ("t2", "t2:300", "cmd.exe")
    ).toDF("traceID", "key", "image")
    val (n1, e1) = CypherWrite.merge(n0, e0,
      """MERGE (t:Trace {traceID: $traceID})
        |MERGE (p:Process {key: $key})
        |ON CREATE SET p.image = $image
        |MERGE (t)-[:HAS_PROCESS]->(p)""".stripMargin, params)
    val got = CypherLite.run(n1, e1,
      "MATCH (t:Trace)-[:HAS_PROCESS]->(p:Process {image: 'cmd.exe'}) " +
        "RETURN t, p ORDER BY t, p")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq(("t1", "t1:100"), ("t2", "t2:300")))
  }

  test("parameterized READS: $params substitute as typed literals") {
    val (n0, e0) = CypherWrite.emptyGraph(spark)
    val params = Seq(("t1", "t1:100", "cmd.exe"), ("t1", "t1:200", "evil.exe"))
      .toDF("traceID", "key", "image")
    val (n1, e1) = CypherWrite.merge(n0, e0,
      """MERGE (t:Trace {traceID: $traceID})
        |MERGE (p:Process {key: $key})
        |ON CREATE SET p.image = $image, p.pid = 100
        |MERGE (t)-[:HAS_PROCESS]->(p)""".stripMargin, params)
    val got = CypherLite.run(n1, e1,
      "MATCH (t:Trace {traceID: $tid})-[:HAS_PROCESS]->(p) " +
        "WHERE p.image = $img AND toInteger(p.pid) >= $minPid RETURN p",
      Map("tid" -> "t1", "img" -> "cmd.exe", "minPid" -> 100))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("t1:100"))
    // unbound and quote-carrying params are clear errors
    intercept[IllegalArgumentException](CypherLite.run(n1, e1,
      "MATCH (t:Trace {traceID: $tid}) RETURN t", Map.empty[String, Any]))
    intercept[IllegalArgumentException](CypherLite.run(n1, e1,
      "MATCH (t:Trace {traceID: $tid}) RETURN t", Map("tid" -> "o'brien")))
    // floating params render plain-decimal (1e7.toString is "1.0E7",
    // which the literal grammar rejects); boolean/NaN reject loudly
    val big = CypherLite.run(n1, e1,
      "MATCH (p:Process) WHERE toInteger(p.pid) < $cap RETURN p ORDER BY p",
      Map("cap" -> 1.0e7)).collect().map(_.getString(0)).toSeq
    assert(big == Seq("t1:100", "t1:200"))
    val tiny = CypherLite.run(n1, e1,
      "MATCH (p:Process) WHERE toFloat(p.pid) < $eps RETURN p",
      Map("eps" -> 1.0e-5)).count()
    assert(tiny == 0)
    intercept[IllegalArgumentException](CypherLite.run(n1, e1,
      "MATCH (p:Process) WHERE p.pid = $b RETURN p", Map("b" -> true)))
    intercept[IllegalArgumentException](CypherLite.run(n1, e1,
      "MATCH (p:Process) WHERE toFloat(p.pid) < $x RETURN p",
      Map("x" -> Double.NaN)))
  }

  test("merges onto a real SysmonGraph corpus graph and reads back") {
    val (nodes, edges) = graft.graph.SysmonGraph.buildCached(
      spark, "/root/reference/malware/*.json")
    val (nBefore, eBefore) = (nodes.count(), edges.count())
    // annotate an existing process and attach a verdict node — the
    // analyst-writeback flow over the reference-built graph
    val p0 = nodes.filter(col("label") === "Process")
      .agg(min(col("id"))).collect()(0).getString(0)
    val (n1, e1) = CypherWrite.mergeOne(nodes, edges,
      """MATCH (p:Process {id: $pid})
        |MERGE (v:Verdict {vid: 'v1'})
        |ON CREATE SET v.source = 'triage'
        |MERGE (p)-[r:FLAGGED {sev: 'high'}]->(v)""".stripMargin,
      Map("pid" -> p0))
    assert(n1.count() == nBefore + 1 && e1.count() == eBefore + 1)
    val got = CypherLite.run(n1, e1,
      "MATCH (p:Process)-[r:FLAGGED {sev: 'high'}]->(v:Verdict) " +
        "RETURN p, v, v.source")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(got == Seq((p0, "v1", "triage")))
  }

  test("CREATE: creates like MERGE, refuses duplicates loudly") {
    val (n0, e0) = CypherWrite.emptyGraph(spark)
    // plain CREATE behaves like MERGE on fresh keys (nodes + edge)
    val stmt =
      """CREATE (a:User {name: $a})
        |CREATE (b:User {name: $b})
        |CREATE (a)-[:KNOWS {since: '2020'}]->(b)""".stripMargin
    val (n1, e1) = CypherWrite.mergeOne(n0, e0, stmt,
      Map("a" -> "alice", "b" -> "bob"))
    assert(nodeMap(n1).keySet == Set(("User", "alice"), ("User", "bob")))
    assert(e1.collect().map(r => (r.getAs[String]("etype"), r.getAs[String]("src"),
      r.getAs[String]("dst"))).toSeq == Seq(("KNOWS", "alice", "bob")))
    // CREATE on an existing node key refuses (the model cannot
    // represent Neo4j's duplicate node) — MERGE remains the upsert
    val dupN = intercept[IllegalArgumentException] {
      CypherWrite.mergeOne(n1, e1, "CREATE (a:User {name: $a})",
        Map("a" -> "alice"))
    }
    assert(dupN.getMessage.contains("use MERGE"))
    // CREATE on an existing edge key refuses too
    val dupE = intercept[IllegalArgumentException] {
      CypherWrite.mergeOne(n1, e1,
        """MATCH (a:User {name: $a}) MATCH (b:User {name: $b})
          |CREATE (a)-[:KNOWS]->(b)""".stripMargin,
        Map("a" -> "alice", "b" -> "bob"))
    }
    assert(dupE.getMessage.contains("use MERGE"))
    // mixed statement: MERGE upserts, CREATE still guards its own key
    val (n2, _) = CypherWrite.mergeOne(n1, e1,
      """MERGE (a:User {name: $a}) CREATE (c:User {name: $c})
        |SET c.role = 'new'""".stripMargin,
      Map("a" -> "alice", "c" -> "carol"))
    assert(nodeMap(n2)(("User", "carol")) ==
      Map("name" -> "carol", "role" -> "new"))
  }

  test("parser rejects unbound endpoints, garbage maps, bad SET items") {
    val (n0, e0) = CypherWrite.emptyGraph(spark)
    intercept[IllegalArgumentException](CypherWrite.mergeOne(n0, e0,
      "MERGE (a)-[:X]->(b)")) // endpoints never bound
    intercept[IllegalArgumentException](CypherWrite.mergeOne(n0, e0,
      "MERGE (p:Process {key $key})")) // malformed map
    intercept[IllegalArgumentException](CypherWrite.mergeOne(n0, e0,
      "MERGE (p:Process {key: 'k'}) SET q.image = 'x'")) // unbound SET target
    intercept[IllegalArgumentException](CypherWrite.mergeOne(n0, e0,
      "MERGE (p:Process {key: 'k'}) SET p.image = coalesce($i, q.image)"))
  }

  // two processes linked by an edge, for the write-verb tests below
  private def spawnedGraph() = {
    val (n0, e0) = CypherWrite.emptyGraph(spark)
    CypherWrite.mergeOne(n0, e0,
      """MERGE (a:Process {key: 'p1'}) ON CREATE SET a.image = 'cmd.exe', a.tmp = 'x'
        |MERGE (b:Process {key: 'p2'})
        |MERGE (a)-[r:SPAWNS {note: 'boot'}]->(b)""".stripMargin)
  }

  test("DELETE refuses a node with incident edges; DETACH DELETE cascades") {
    val (n1, e1) = spawnedGraph()
    // plain DELETE on a still-connected node mirrors Neo4j's refusal
    intercept[IllegalStateException] {
      val (n, e) = CypherWrite.mergeOne(n1, e1,
        "MATCH (p:Process {key: 'p1'}) DELETE p")
      n.count(); e.count()
    }
    // DETACH DELETE removes the node and every incident edge
    val (n2, e2) = CypherWrite.mergeOne(n1, e1,
      "MATCH (p:Process {key: 'p1'}) DETACH DELETE p")
    assert(nodeMap(n2).keySet == Set(("Process", "p2")))
    assert(e2.count() == 0)
    // once disconnected, plain DELETE works
    val (n3, e3) = CypherWrite.mergeOne(n2, e2,
      "MATCH (p:Process {key: 'p2'}) DELETE p")
    assert(n3.count() == 0 && e3.count() == 0)
  }

  test("MATCH edge pattern: DELETE r drops the edge, SET r.x annotates it") {
    val (n1, e1) = spawnedGraph()
    // SET over a matched edge (no creation on miss)
    val (_, e2) = CypherWrite.mergeOne(n1, e1,
      """MATCH (a:Process {key: 'p1'}) MATCH (b:Process {key: 'p2'})
        |MATCH (a)-[r:SPAWNS]->(b) SET r.checked = 'yes'""".stripMargin)
    val props2 = e2.collect().head.getAs[Map[String, String]]("props")
    assert(props2 == Map("note" -> "boot", "checked" -> "yes"))
    // a MATCH edge whose key misses creates nothing
    val (_, eMiss) = CypherWrite.mergeOne(n1, e1,
      """MATCH (a:Process {key: 'p1'}) MATCH (b:Process {key: 'p1'})
        |MATCH (a)-[r:SPAWNS]->(b) SET r.checked = 'yes'""".stripMargin)
    assert(eMiss.count() == 1) // unchanged row count, no phantom edge
    // DELETE r removes the edge, nodes stay
    val (n3, e3) = CypherWrite.mergeOne(n1, e1,
      """MATCH (a:Process {key: 'p1'}) MATCH (b:Process {key: 'p2'})
        |MATCH (a)-[r:SPAWNS]->(b) DELETE r""".stripMargin)
    assert(e3.count() == 0 && n3.count() == 2)
  }

  test("MATCH edge property map: entries are real per-row constraints") {
    val (n1, e1) = spawnedGraph() // one SPAWNS edge with {note: 'boot'}
    // satisfied constraint: the SET lands
    val (_, eHit) = CypherWrite.mergeOne(n1, e1,
      """MATCH (a:Process {key: 'p1'}) MATCH (b:Process {key: 'p2'})
        |MATCH (a)-[r:SPAWNS {note: 'boot'}]->(b) SET r.checked = 'yes'""".stripMargin)
    assert(eHit.collect().head.getAs[Map[String, String]]("props")("checked") == "yes")
    // violated constraint: row drops out, stored edge untouched
    val (_, eMiss) = CypherWrite.mergeOne(n1, e1,
      """MATCH (a:Process {key: 'p1'}) MATCH (b:Process {key: 'p2'})
        |MATCH (a)-[r:SPAWNS {note: 'other'}]->(b) SET r.checked = 'yes'""".stripMargin)
    val pm = eMiss.collect().head.getAs[Map[String, String]]("props")
    assert(!pm.contains("checked") && eMiss.count() == 1)
    // constrained DELETE r: wrong value deletes nothing, right value deletes
    val (_, eKeep) = CypherWrite.mergeOne(n1, e1,
      """MATCH (a:Process {key: 'p1'}) MATCH (b:Process {key: 'p2'})
        |MATCH (a)-[r:SPAWNS {note: 'other'}]->(b) DELETE r""".stripMargin)
    assert(eKeep.count() == 1)
    val (_, eGone) = CypherWrite.mergeOne(n1, e1,
      """MATCH (a:Process {key: 'p1'}) MATCH (b:Process {key: 'p2'})
        |MATCH (a)-[r:SPAWNS {note: 'boot'}]->(b) DELETE r""".stripMargin)
    assert(eGone.count() == 0)
    // per-row $param constraint: only the matching batch row applies
    val params = spark.createDataFrame(Seq(("boot", "row-match"), ("nope", "row-miss")))
      .toDF("note", "tag")
    val (_, eBatch) = CypherWrite.merge(n1, e1,
      """MATCH (a:Process {key: 'p1'}) MATCH (b:Process {key: 'p2'})
        |MATCH (a)-[r:SPAWNS {note: $note}]->(b) SET r.tag = $tag""".stripMargin, params)
    assert(eBatch.collect().head.getAs[Map[String, String]]("props")("tag") == "row-match")
  }

  test("REMOVE drops properties, not rows; batch-parameterized retention trim") {
    val (n1, e1) = spawnedGraph()
    val (n2, e2) = CypherWrite.mergeOne(n1, e1,
      """MATCH (a:Process {key: 'p1'}) MATCH (b:Process {key: 'p2'})
        |MATCH (a)-[r:SPAWNS]->(b) REMOVE a.tmp, r.note""".stripMargin)
    assert(nodeMap(n2)(("Process", "p1")) == Map("key" -> "p1", "image" -> "cmd.exe"))
    assert(e2.count() == 1 &&
      e2.collect().head.getAs[Map[String, String]]("props").isEmpty)
    // retention-trim idiom: one batched DETACH DELETE over a parameter
    // frame of expired keys
    val expired = Seq("p1", "p2").toDF("key")
    val (n3, e3) = CypherWrite.merge(n2, e2,
      "MATCH (p:Process {key: $key}) DETACH DELETE p", expired)
    assert(n3.count() == 0 && e3.count() == 0)
    // label removal is supported as of r9, but removing an id's LAST
    // label row refuses loudly (see the dedicated label-verb test)
    intercept[IllegalStateException] {
      val (n, _) = CypherWrite.mergeOne(n1, e1,
        "MATCH (p:Process {key: 'p1'}) REMOVE p:Process")
      n.count()
    }
  }

  test("list/map property literals: canonical storage, order semantics, read-back") {
    val (n0, e0) = CypherWrite.emptyGraph(spark)
    val (n1, e1) = CypherWrite.mergeOne(n0, e0,
      "MERGE (d:Doc {did: 'd1', tags: ['a', 'b'], meta: {x: '1', lang: 'en'}})")
    // canonical JSON text is the storage form: list ordered, map keys sorted
    assert(nodeMap(n1)(("Doc", "d1")) == Map("did" -> "d1",
      "tags" -> """["a","b"]""", "meta" -> """{"lang":"en","x":"1"}"""))
    // read-back through CypherLite pattern maps: list order matters,
    // map key order doesn't (Neo4j's semantics for the two types)
    def hits(q: String): Long = CypherLite.run(n1, e1, q).count()
    assert(hits("MATCH (d:Doc {tags: ['a', 'b']}) RETURN d") == 1)
    assert(hits("MATCH (d:Doc {tags: ['b', 'a']}) RETURN d") == 0)
    assert(hits("MATCH (d:Doc {meta: {lang: 'en', x: '1'}}) RETURN d") == 1)
    assert(hits("MATCH (d:Doc {meta: {x: '1', lang: 'en'}}) RETURN d") == 1)
    assert(hits("MATCH (d:Doc {meta: {x: '2', lang: 'en'}}) RETURN d") == 0)
    // CypherWrite MATCH constraints use the same canonical comparison
    val (n2, _) = CypherWrite.mergeOne(n1, e1,
      "MATCH (d:Doc {did: 'd1', tags: ['a', 'b']}) SET d.hit = '1'")
    assert(nodeMap(n2)(("Doc", "d1"))("hit") == "1")
    val (n3, _) = CypherWrite.mergeOne(n1, e1,
      "MATCH (d:Doc {did: 'd1', tags: ['b', 'a']}) SET d.hit = '1'")
    assert(!nodeMap(n3)(("Doc", "d1")).contains("hit"))
    // numbers stay verbatim inside lists; malformed composites are loud
    val (n4, _) = CypherWrite.mergeOne(n0, e0, "MERGE (d:Doc {did: 'd2', ns: [1, 2.5]})")
    assert(nodeMap(n4)(("Doc", "d2"))("ns") == "[1,2.5]")
    intercept[IllegalArgumentException](CypherWrite.mergeOne(n0, e0,
      "MERGE (d:Doc {did: 'd3', bad: ['a' 'b']})"))
  }

  test("deep nested map literals round-trip through write and read (r10)") {
    val (n0, e0) = CypherWrite.emptyGraph(spark)
    // depth-3 nesting (map in map in map) — beyond the old one-level
    // scanner; canonical storage sorts keys at EVERY level
    val (n1, e1) = CypherWrite.mergeOne(n0, e0,
      "MERGE (d:Doc {did: 'd9', cfg: {net: {proxy: {host: 'h', port: 8080}, " +
        "dns: '8.8.8.8'}, mode: 'on'}})")
    assert(nodeMap(n1)(("Doc", "d9"))("cfg") ==
      """{"mode":"on","net":{"dns":"8.8.8.8","proxy":{"host":"h","port":8080}}}""")
    // read-back: key order insensitive at every level, value-sensitive
    def hits(q: String): Long = CypherLite.run(n1, e1, q).count()
    assert(hits("MATCH (d:Doc {cfg: {mode: 'on', net: {dns: '8.8.8.8', " +
      "proxy: {port: 8080, host: 'h'}}}}) RETURN d") == 1)
    assert(hits("MATCH (d:Doc {cfg: {mode: 'on', net: {dns: '8.8.8.8', " +
      "proxy: {port: 9999, host: 'h'}}}}) RETURN d") == 0)
    // SET v += with a nested map value
    val (n2, _) = CypherWrite.mergeOne(n1, e1,
      "MATCH (d:Doc {did: 'd9'}) SET d += {extra: {a: {b: '1'}}}")
    assert(nodeMap(n2)(("Doc", "d9"))("extra") == """{"a":{"b":"1"}}""")
    // edge property maps take nested values too
    val (n3, e3) = CypherWrite.mergeOne(n1, e1,
      "MERGE (x:Doc {did: 'd10'})")
    val (_, e4) = CypherWrite.mergeOne(n3, e3,
      "MATCH (d:Doc {did: 'd9'}) MATCH (x:Doc {did: 'd10'}) " +
        "MERGE (d)-[:REL {meta: {k: {deep: 'v'}}}]->(x)")
    val em = e4.filter(col("etype") === "REL").collect()
    assert(em.length == 1 &&
      em(0).getAs[Map[String, String]]("props")("meta") == """{"k":{"deep":"v"}}""")
    // depth past the regex bound is LOUD, not truncated
    intercept[IllegalArgumentException](CypherWrite.mergeOne(n0, e0,
      "MERGE (d:Doc {did: 'd11', x: {a: {b: {c: {d: {e: '1'}}}}}})"))
  }

  test("quote-aware keyword scan + MATCH extra props are real constraints") {
    val (n1, e1) = spawnedGraph()
    // keyword words inside string literals must not split the statement
    val (n2, _) = CypherWrite.mergeOne(n1, e1,
      "MERGE (p:Process {key: 'p3', note: 'set by triage', kind: 'match'})")
    assert(nodeMap(n2)(("Process", "p3")) ==
      Map("key" -> "p3", "note" -> "set by triage", "kind" -> "match"))
    // MATCH {key, image}: the extra entry filters — p2 has no image, so
    // a constraint on it must not over-match (ADVICE r7)
    val (n3, _) = CypherWrite.mergeOne(n1, e1,
      "MATCH (p:Process {key: 'p2', image: 'cmd.exe'}) SET p.hit = '1'")
    assert(!nodeMap(n3)(("Process", "p2")).contains("hit"))
    val (n4, _) = CypherWrite.mergeOne(n1, e1,
      "MATCH (p:Process {key: 'p1', image: 'cmd.exe'}) SET p.hit = '1'")
    assert(nodeMap(n4)(("Process", "p1"))("hit") == "1")
    // and the constraint gates the DOWNSTREAM clauses row-wise: a
    // failed extra-prop match must not let the edge land
    val (_, e5) = CypherWrite.mergeOne(n1, e1,
      """MATCH (a:Process {key: 'p1', image: 'nope.exe'})
        |MERGE (v:Verdict {vid: 'v9'})
        |MERGE (a)-[r:FLAGGED]->(v)""".stripMargin)
    assert(e5.filter(col("etype") === "FLAGGED").count() == 0)
  }

  test("SET v += {map}: one item per entry, null params never erase") {
    val (n1, e1) = spawnedGraph()
    val (n2, _) = CypherWrite.mergeOne(n1, e1,
      "MATCH (p:Process {key: 'p1'}) SET p += {severity: 'high', score: 9}")
    assert(nodeMap(n2)(("Process", "p1"))("severity") == "high")
    assert(nodeMap(n2)(("Process", "p1"))("score") == "9")
    assert(nodeMap(n2)(("Process", "p1"))("image") == "cmd.exe") // untouched
    // param entries substitute; a null param contributes no entry
    val (n3, _) = CypherWrite.mergeOne(n1, e1,
      "MATCH (p:Process {key: 'p1'}) SET p += {severity: $sev, image: $img}",
      Map("sev" -> "low", "img" -> null))
    assert(nodeMap(n3)(("Process", "p1"))("severity") == "low")
    assert(nodeMap(n3)(("Process", "p1"))("image") == "cmd.exe") // null kept old
    // ON CREATE SET += works too
    val (n4, _) = CypherWrite.mergeOne(n1, e1,
      "MERGE (p:Process {key: 'p9'}) ON CREATE SET p += {origin: 'triage'}")
    assert(nodeMap(n4)(("Process", "p9"))("origin") == "triage")
  }

  test("SET v:Label adds a label row; REMOVE v:Label drops it; last-label refusal") {
    val (n1, e1) = spawnedGraph()
    val (n2, _) = CypherWrite.mergeOne(n1, e1,
      "MATCH (p:Process {key: 'p1'}) SET p:Suspicious")
    // the new label row snapshots the source row's props
    assert(nodeMap(n2)(("Suspicious", "p1")) == nodeMap(n2)(("Process", "p1")))
    // readable under the new label through CypherLite
    val hits = CypherLite.run(n2, e1,
      "MATCH (s:Suspicious) RETURN s").collect().map(_.getString(0))
    assert(hits.toSeq == Seq("p1"))
    // idempotent: re-adding does not duplicate
    val (n3, _) = CypherWrite.mergeOne(n2, e1,
      "MATCH (p:Process {key: 'p1'}) SET p:Suspicious")
    assert(n3.filter(col("id") === "p1").count() == 2)
    // REMOVE the extra label: back to one row
    val (n4, _) = CypherWrite.mergeOne(n3, e1,
      "MATCH (p:Process {key: 'p1'}) REMOVE p:Suspicious")
    assert(n4.filter(col("id") === "p1").count() == 1)
    assert(nodeMap(n4).contains(("Process", "p1")))
    // removing an id's LAST label row refuses loudly
    intercept[IllegalStateException] {
      val (n, _) = CypherWrite.mergeOne(n1, e1,
        "MATCH (p:Process {key: 'p2'}) REMOVE p:Process")
      n.count()
    }
    // label ops on edge variables reject
    intercept[IllegalArgumentException] {
      val (n, _) = CypherWrite.mergeOne(n1, e1,
        """MATCH (a:Process {key: 'p1'})
          |MATCH (b:Process {key: 'p2'})
          |MATCH (a)-[r:SPAWNS]->(b) SET r:Flagged""".stripMargin)
      n.count()
    }
  }

  // ---- r12 WHERE-in-write suite ----------------------------------

  /** Four processes + network edges — the triage-fixture shape. */
  private def triageGraph() = {
    val (n0, e0) = CypherWrite.emptyGraph(spark)
    var g = (n0, e0)
    Seq(("p1", "powershell.exe"), ("p2", "cmd.exe"),
        ("p3", "powershell_ise.exe"), ("p4", "svchost.dll")).foreach {
      case (k, img) =>
        g = CypherWrite.mergeOne(g._1, g._2,
          "MERGE (p:Process {key: $key}) SET p.image = $image",
          Map("key" -> k, "image" -> img))
    }
    g = CypherWrite.mergeOne(g._1, g._2,
      "MERGE (ip:Ip {addr: '10.0.0.9'})")
    g = CypherWrite.mergeOne(g._1, g._2,
      """MATCH (p:Process {key: 'p2'}) MATCH (ip:Ip {addr: '10.0.0.9'})
        |MERGE (p)-[r:CONNECTED_TO {dport: '443'}]->(ip)""".stripMargin)
    g = CypherWrite.mergeOne(g._1, g._2,
      """MATCH (p:Process {key: 'p1'}) MATCH (ip:Ip {addr: '10.0.0.9'})
        |MERGE (p)-[r:CONNECTED_TO {dport: '8080'}]->(ip)""".stripMargin)
    g
  }

  test("triage idiom: mapless MATCH + WHERE CONTAINS gates a SET") {
    val (n1, e1) = triageGraph()
    val (n2, _) = CypherWrite.mergeOne(n1, e1,
      "MATCH (p:Process) WHERE p.image CONTAINS 'powershell' SET p.flag = '1'")
    val flagged = nodeMap(n2).collect {
      case ((l, id), pr) if pr.get("flag").contains("1") => id
    }.toSet
    assert(flagged == Set("p1", "p3"))
    // everything else untouched
    assert(nodeMap(n2)(("Process", "p2")) == nodeMap(n1)(("Process", "p2")))
  }

  test("mapless MATCH without WHERE binds the whole label scan") {
    val (n1, e1) = triageGraph()
    val (n2, _) = CypherWrite.mergeOne(n1, e1,
      "MATCH (p:Process) SET p.scanned = '1'")
    val scanned = nodeMap(n2).collect {
      case ((l, _), pr) if pr.get("scanned").contains("1") => l
    }
    assert(scanned.size == 4 && scanned.forall(_ == "Process"))
    assert(!nodeMap(n2)(("Ip", "10.0.0.9")).contains("scanned"))
  }

  test("map-bound MATCH + WHERE gates per parameter row") {
    val (n1, e1) = triageGraph()
    import spark.implicits._
    val pmRows = Seq("p1", "p2", "p4").toDF("key")
    val (n2, _) = CypherWrite.merge(n1, e1,
      "MATCH (p:Process {key: $key}) WHERE p.image ENDS WITH '.exe' " +
        "SET p.hit = '1'", pmRows)
    val hit = nodeMap(n2).collect {
      case ((_, id), pr) if pr.get("hit").contains("1") => id
    }.toSet
    // p1/p2 are .exe and in the batch; p3 matches WHERE but is not in
    // the batch; p4 is in the batch but fails WHERE
    assert(hit == Set("p1", "p2"))
  }

  test("WHERE-gated DETACH DELETE and edge-WHERE DELETE") {
    val (n1, e1) = triageGraph()
    import spark.implicits._
    // edge WHERE: numeric compare over stored edge props, per-row
    // endpoint binding (edge clauses need map-bound endpoints)
    val pmRows = Seq("p1", "p2").toDF("key")
    val (_, e2) = CypherWrite.merge(n1, e1,
      """MATCH (p:Process {key: $key}) MATCH (ip:Ip {addr: '10.0.0.9'})
        |MATCH (p)-[r:CONNECTED_TO]->(ip) WHERE r.dport > 1000
        |DELETE r""".stripMargin, pmRows)
    assert(e2.count() == 1)
    assert(e2.collect().head.getAs[Map[String, String]]("props")("dport") == "443")
    // node WHERE + DETACH DELETE: remove flagged processes and cascade
    val (n3, e3) = CypherWrite.mergeOne(n1, e1,
      "MATCH (p:Process) WHERE p.image STARTS WITH 'powershell' " +
        "DETACH DELETE p")
    assert(nodeMap(n3).keySet ==
      Set(("Process", "p2"), ("Process", "p4"), ("Ip", "10.0.0.9")))
    // p1's CONNECTED_TO edge cascaded away; p2's survives
    assert(e3.collect().map(_.getString(1)).toSeq == Seq("p2"))
  }

  test("write-WHERE runs the full read grammar: exists-pattern predicate") {
    val (n1, e1) = triageGraph()
    val (n2, _) = CypherWrite.mergeOne(n1, e1,
      "MATCH (p:Process) WHERE exists((p)-[:CONNECTED_TO]->()) " +
        "SET p.net = '1'")
    val net = nodeMap(n2).collect {
      case ((_, id), pr) if pr.get("net").contains("1") => id
    }.toSet
    assert(net == Set("p1", "p2"))
  }

  test("sg_where driver gate matches the relational twin at sf0.001") {
    val got = graft.operators.GraphQueries.sgWhere(spark, sf)
      .collect().map(r => (r.getString(0), r.getAs[Number](1).longValue)).toSeq
    val want = Tables.events(spark, sf)
      .select(col("user_id").cast("string").as("uid"), col("event_type").as("t"))
      .filter(col("uid").endsWith("3") && !col("uid").startsWith("1"))
      .groupBy(col("t")).agg(countDistinct(col("uid")).as("n"))
      .orderBy(col("t"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want && got.nonEmpty)
  }

  test("runComposed: read pipeline enriches, write tail tags (one statement)") {
    // users u1..u3 with 2/1/3 event types
    val (n0, e0) = CypherWrite.emptyGraph(spark)
    import spark.implicits._
    val params = Seq(("u1", "a"), ("u1", "b"), ("u2", "a"),
      ("u3", "a"), ("u3", "b"), ("u3", "c")).toDF("uid", "et")
    val (n1, e1) = CypherWrite.merge(n0, e0,
      """MERGE (u:User {uid: $uid})
        |MERGE (t:EType {name: $et})
        |MERGE (u)-[:DID]->(t)""".stripMargin, params)
    // the enrich-then-tag idiom: aggregate through the read grammar,
    // write the result back per row
    val (n2, _) = CypherWrite.runComposed(n1, e1,
      """MATCH (u:User)-[:DID]->(t:EType)
        |WITH u AS uid, count(*) AS n
        |MATCH (v:User {uid: uid}) SET v.breadth = n""".stripMargin)
    val breadth = nodeMap(n2).collect {
      case (("User", id), pr) => id -> pr.get("breadth")
    }.toMap
    assert(breadth == Map("u1" -> Some("2"), "u2" -> Some("1"), "u3" -> Some("3")))
    // MERGE tail: materialize an aggregate as NEW nodes
    val (n3, _) = CypherWrite.runComposed(n1, e1,
      """MATCH (u:User)-[:DID]->(t:EType)
        |WITH t AS name, count(*) AS uses
        |MERGE (s:EStat {name: name}) SET s.uses = uses""".stripMargin)
    val stats = nodeMap(n3).collect {
      case (("EStat", id), pr) => id -> pr("uses")
    }.toMap
    assert(stats == Map("a" -> "3", "b" -> "2", "c" -> "1"))
    // multi-stage read incl. WITH…WHERE, then a DETACH DELETE tail
    val (n4, e4) = CypherWrite.runComposed(n1, e1,
      """MATCH (u:User)-[:DID]->(t:EType)
        |WITH u AS uid, count(*) AS n WHERE n >= 2
        |WITH uid, n
        |MATCH (v:User {uid: uid}) DETACH DELETE v""".stripMargin)
    assert(nodeMap(n4).keySet.collect { case ("User", id) => id } == Set("u2"))
    assert(e4.collect().map(_.getString(1)).toSet == Set("u2"))
    // write-WHERE composes inside the tail too
    val (n5, _) = CypherWrite.runComposed(n1, e1,
      """MATCH (u:User)-[:DID]->(t:EType)
        |WITH u AS uid, count(*) AS n
        |MATCH (v:User {uid: uid}) WHERE v.uid ENDS WITH '3'
        |SET v.big = n""".stripMargin)
    val big = nodeMap(n5).collect {
      case (("User", id), pr) if pr.contains("big") => id -> pr("big")
    }.toMap
    assert(big == Map("u3" -> "3"))
    // loud: no WITH boundary / no write tail / clause kw at the boundary
    intercept[IllegalArgumentException](CypherWrite.runComposed(n1, e1,
      "MATCH (u:User) SET u.x = '1'"))
    intercept[IllegalArgumentException](CypherWrite.runComposed(n1, e1,
      "MATCH (u:User)-[:DID]->(t:EType) WITH u, count(*) AS n RETURN u"))
    intercept[IllegalArgumentException](CypherWrite.runComposed(n1, e1,
      """MATCH (u:User)-[:DID]->(t:EType)
        |WITH u AS uid, count(*) AS n WHERE n >= 2
        |MATCH (v:User {uid: uid}) SET v.x = '1'""".stripMargin))
  }

  test("runComposed: a carried column named like a label stays a label (r13)") {
    // the read stage carries a column literally named `User`; the write
    // tail's `(v:User {...})` must keep the LABEL literal (r12-advice:
    // it was rewritten to (v:$User), corrupting the pattern) while the
    // same word in map-VALUE position still binds from the frame
    val (n0, e0) = CypherWrite.emptyGraph(spark)
    import spark.implicits._
    val params = Seq(("u1", "x"), ("u2", "y")).toDF("uid", "et")
    val (n1, e1) = CypherWrite.merge(n0, e0,
      "MERGE (u:User {uid: $uid})", params)
    val (n2, _) = CypherWrite.runComposed(n1, e1,
      """MATCH (u:User)
        |WITH u AS User
        |MATCH (v:User {uid: User}) SET v.tag = User""".stripMargin)
    val tags = nodeMap(n2).collect {
      case (("User", id), pr) if pr.contains("tag") => id -> pr("tag")
    }.toMap
    assert(tags == Map("u1" -> "u1", "u2" -> "u2"))
  }

  test("FOREACH: list-prop loader idiom — explode a $param list into " +
      "batch writes; empty lists contribute nothing (r13)") {
    val (n0, e0) = CypherWrite.emptyGraph(spark)
    import spark.implicits._
    val params = Seq(
      ("u1", Seq("red", "blue")),
      ("u2", Seq("red")),
      ("u3", Seq.empty[String])).toDF("uid", "tags")
    val (n1, e1) = CypherWrite.merge(n0, e0,
      """MERGE (u:User {uid: $uid})
        |FOREACH (t IN $tags |
        |  MERGE (g:Tag {name: t})
        |  MERGE (u)-[:TAGGED]->(g))""".stripMargin, params)
    // all three users exist (pass 1), tags only where lists were
    val users = nodeMap(n1).keySet.collect { case ("User", id) => id }
    assert(users == Set("u1", "u2", "u3"))
    val tags = nodeMap(n1).keySet.collect { case ("Tag", id) => id }
    assert(tags == Set("red", "blue"))
    val tagged = e1.filter(col("etype") === "TAGGED")
      .select(col("src"), col("dst"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(tagged == Set(("u1", "red"), ("u1", "blue"), ("u2", "red")))
  }

  test("FOREACH: literal lists, SET bodies (row order wins), nesting, loud contracts") {
    val (n0, e0) = CypherWrite.emptyGraph(spark)
    import spark.implicits._
    // literal list, no prefix
    val (n1, _) = CypherWrite.merge(n0, e0,
      "FOREACH (x IN ['a', 'b'] | MERGE (t:Tag {name: x}))",
      Seq(Tuple1("row")).toDF("r"))
    assert(nodeMap(n1).keySet.collect { case ("Tag", id) => id } == Set("a", "b"))
    // SET body: exploded elements apply in list order — last wins
    val params = Seq(("u1", Seq("first", "mid", "last"))).toDF("uid", "xs")
    val (n2, _) = CypherWrite.merge(n0, e0,
      "MERGE (u:User {uid: $uid}) FOREACH (x IN $xs | SET u.seen = x)", params)
    assert(nodeMap(n2)(("User", "u1"))("seen") == "last")
    // nested FOREACH: outer explodes users' lists, inner a literal list
    val (n3, _) = CypherWrite.merge(n0, e0,
      """FOREACH (x IN ['p', 'q'] |
        |  MERGE (t:Tag {name: x})
        |  FOREACH (y IN ['1'] | SET t.v = y))""".stripMargin,
      Seq(Tuple1("row")).toDF("r"))
    val tagProps = nodeMap(n3).collect { case (("Tag", id), pr) => id -> pr.get("v") }
    assert(tagProps.toMap == Map("p" -> Some("1"), "q" -> Some("1")))
    // loud: FOREACH must be last; prefix may only bind; list must be
    // array-typed; variable must not collide with a param column
    intercept[IllegalArgumentException](CypherWrite.merge(n0, e0,
      "FOREACH (x IN ['a'] | MERGE (t:Tag {name: x})) MERGE (u:User {uid: 'z'})",
      params))
    intercept[IllegalArgumentException](CypherWrite.merge(n0, e0,
      "MERGE (u:User {uid: $uid}) SET u.a = '1' FOREACH (x IN $xs | SET u.b = x)",
      params))
    intercept[IllegalArgumentException](CypherWrite.merge(n0, e0,
      "FOREACH (x IN $uid | MERGE (t:Tag {name: x}))", params))
    intercept[IllegalArgumentException](CypherWrite.merge(n0, e0,
      "FOREACH (uid IN $xs | MERGE (t:Tag {name: uid}))", params))
  }

  test("CALL { … } IN TRANSACTIONS: chunked application — later chunks " +
      "see earlier chunks' writes (r13)") {
    val (n0, e0) = CypherWrite.emptyGraph(spark)
    import spark.implicits._
    // same key merged in rows 1 and 3, chunk size 1: with per-chunk
    // created-vs-matched, row 1 CREATES (c='1') and row 3 MATCHES
    // (m='3') — the one-batch form folds both into the creation
    val params = Seq(("k1", "1"), ("k2", "2"), ("k1", "3")).toDF("id", "v")
    val stmt =
      """MERGE (n:Item {id: $id})
        |ON CREATE SET n.c = $v
        |ON MATCH SET n.m = $v""".stripMargin
    val (nTx, _) = CypherWrite.merge(n0, e0,
      s"CALL { $stmt } IN TRANSACTIONS OF 1 ROWS", params)
    val k1 = nodeMap(nTx)(("Item", "k1"))
    assert(k1.get("c") == Some("1") && k1.get("m") == Some("3"),
      s"per-chunk semantics expected c=1, m=3 — got $k1")
    // the one-batch divergence the class doc records, pinned: ON MATCH
    // does not fire for keys created in the same batch
    val (nOne, _) = CypherWrite.merge(n0, e0, stmt, params)
    val k1One = nodeMap(nOne)(("Item", "k1"))
    assert(k1One.get("m").isEmpty)
    // default chunk size (1000) covers the whole frame in one pass —
    // equal to the plain batch here (no re-merged keys across chunks)
    val (nDef, _) = CypherWrite.merge(n0, e0,
      s"CALL { $stmt } IN TRANSACTIONS", params)
    assert(nodeMap(nDef)(("Item", "k2")) == nodeMap(nOne)(("Item", "k2")))
    // loud chunk bound
    intercept[IllegalArgumentException](CypherWrite.merge(n0, e0,
      s"CALL { $stmt } IN TRANSACTIONS OF 0 ROWS", params))
  }

  test("sg_compose driver gate matches the relational twin at sf0.001") {
    val got = graft.operators.GraphQueries.sgCompose(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val want = Tables.events(spark, sf)
      .groupBy(col("user_id").cast("string").as("u"))
      .agg(countDistinct(col("event_type")).as("n"))
      .filter(col("n") >= 2)
      .select(col("u"), col("n").cast("string").as("breadth"))
      .orderBy(col("u"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == want && got.nonEmpty)
  }

  test("WHERE placement and scope violations are loud") {
    val (n1, e1) = triageGraph()
    // WHERE cannot follow MERGE
    intercept[IllegalArgumentException](CypherWrite.mergeOne(n1, e1,
      "MERGE (p:Process {key: 'p9'}) WHERE p.image = 'x' SET p.a = '1'"))
    // OPTIONAL MATCH rejected outright (incl. its WHERE interaction)
    intercept[IllegalArgumentException](CypherWrite.mergeOne(n1, e1,
      "OPTIONAL MATCH (p:Process) WHERE p.image = 'x' SET p.a = '1'"))
    intercept[IllegalArgumentException](CypherWrite.mergeOne(n1, e1,
      "MATCH (p:Process {key: 'p1'}) OPTIONAL MATCH (q:Process) " +
        "WHERE q.image = 'x' SET q.a = '1'"))
    // cross-clause variable reference
    intercept[IllegalArgumentException](CypherWrite.mergeOne(n1, e1,
      "MATCH (a:Process {key: 'p1'}) MATCH (b:Process) " +
        "WHERE b.image = a.image SET b.twin = '1'"))
    // $params in WHERE
    intercept[IllegalArgumentException](CypherWrite.mergeOne(n1, e1,
      "MATCH (p:Process) WHERE p.image = $img SET p.a = '1'",
      Map("img" -> "cmd.exe")))
    // mapless MERGE has no identity
    intercept[IllegalArgumentException](CypherWrite.mergeOne(n1, e1,
      "MERGE (p:Process) SET p.a = '1'"))
    // mapless var cannot anchor an edge clause
    intercept[IllegalArgumentException] {
      val (n, _) = CypherWrite.mergeOne(n1, e1,
        """MATCH (p:Process) MATCH (ip:Ip {addr: '10.0.0.9'})
          |MERGE (p)-[r:TOUCHED]->(ip)""".stripMargin)
      n.count()
    }
    // duplicate WHERE
    intercept[IllegalArgumentException](CypherWrite.mergeOne(n1, e1,
      "MATCH (p:Process) WHERE p.image = 'x' WHERE p.image = 'y' " +
        "SET p.a = '1'"))
    // statement must still do something valid after the gate parses
    val (n2, _) = CypherWrite.mergeOne(n1, e1,
      "MATCH (p:Process) WHERE p.image = 'cmd.exe' SET p.ok = '1'")
    assert(nodeMap(n2)(("Process", "p2"))("ok") == "1")
  }
}
