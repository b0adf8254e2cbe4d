package graft

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions._

import graft.graph.{CypherLite, SysmonGraph, Traverse}

/** CypherLite compiled output vs hand-written DataFrame equivalents on
  * the full reference corpus. */
class CypherLiteSpec extends SparkSpec {

  private lazy val graph = {
    val (n, e) = SysmonGraph.build(spark, "/root/reference/malware/*.json")
    (n.cache(), e.cache())
  }

  private def et(t: String) = graph._2.filter(col("etype") === t)

  test("single-hop pattern with labels equals the direct join") {
    val (nodes, edges) = graph
    val got = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[:CREATED_FILE]->(f:File) RETURN DISTINCT p, f")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val want = et("CREATED_FILE").select(col("src"), col("dst")).distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("two-hop pattern with WHERE on a property") {
    val (nodes, edges) = graph
    val got = CypherLite.run(nodes, edges,
      "MATCH (t:Trace)-[:HAS_PROCESS]->(p:Process)-[:CONNECTED_TO]->(ip:Ip) " +
        "WHERE p.image ENDS WITH '.exe' RETURN DISTINCT t, ip")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val procs = nodes.filter(col("label") === "Process")
      .filter(element_at(col("props"), "image").endsWith(".exe"))
      .select(col("id").as("p"))
    val want = et("HAS_PROCESS").select(col("src").as("t"), col("dst").as("p"))
      .join(procs, Seq("p"))
      .join(et("CONNECTED_TO").select(col("src").as("p"), col("dst").as("ip")), Seq("p"))
      .select(col("t"), col("ip")).distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("variable-length SPAWNS pattern equals the Traverse DSL") {
    val (nodes, edges) = graph
    val got = CypherLite.run(nodes, edges,
      "MATCH (a:Process)-[:SPAWNS*1..3]->(b:Process) RETURN DISTINCT a, b")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val starts = nodes.filter(col("label") === "Process").select(col("id"))
    val want = Traverse.from(edges, starts).out("SPAWNS", 1 to 3).pairs
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("var-length edge variable: r binds the relationship list, per-path rows") {
    val (nodes, edges) = graph
    // corpus cross-check: (a, b, r) for *1..2 ≡ the expanded join twin
    val got = CypherLite.run(nodes, edges,
      "MATCH (a:Process)-[r:SPAWNS*1..2]->(b:Process) RETURN a, b, r")
      .collect().map(r => (r.getString(0), r.getString(1), r.getSeq[String](2).toList))
      .toSet
    val sp = et("SPAWNS").select(col("src"), col("dst"),
      concat(col("src"), lit("-[SPAWNS]->"), col("dst")).as("e")).distinct()
    val one = sp.select(col("src").as("a"), col("dst").as("b"), array(col("e")).as("r"))
    val two = sp.select(col("src").as("a"), col("dst").as("m"), col("e").as("e1"))
      .join(sp.select(col("src").as("m"), col("dst").as("b"), col("e").as("e2")), Seq("m"))
      .filter(col("e1") =!= col("e2"))
      .select(col("a"), col("b"), array(col("e1"), col("e2")).as("r"))
    val want = one.unionByName(two)
      .collect().map(r => (r.getString(0), r.getString(1), r.getSeq[String](2).toList))
      .toSet
    assert(got == want && got.nonEmpty)
    // size(r) = path length; head(r) = first traversed relationship
    val sized = CypherLite.run(nodes, edges,
      "MATCH (a:Process)-[r:SPAWNS*1..2]->(b:Process) " +
        "RETURN a, b, r, size(r) AS n, head(r) AS h")
      .collect()
    assert(sized.forall(r => r.getSeq[String](2).length == r.getAs[Number](3).intValue &&
      r.getSeq[String](2).head == r.getString(4)))
    // per-path multiplicity on a diamond: two tied 2-hop paths = 2 rows
    import spark.implicits._
    val dn = Seq("a", "b1", "b2", "c").map(i => (i, "N", Map.empty[String, String]))
      .toDF("id", "label", "props")
    val de = Seq(("T", "a", "b1"), ("T", "a", "b2"), ("T", "b1", "c"), ("T", "b2", "c"))
      .map(t => (t._1, t._2, t._3, 1, Map.empty[String, String]))
      .toDF("etype", "src", "dst", "event_id", "props")
    val dia = CypherLite.run(dn, de,
      "MATCH (a:N)-[r:T*2..2]->(c:N) WHERE a.id = 'a' AND c.id = 'c' RETURN r")
      .collect().map(_.getSeq[String](0).toList).toSet
    assert(dia == Set(
      List("a-[T]->b1", "b1-[T]->c"),
      List("a-[T]->b2", "b2-[T]->c")))
    // relationship-isomorphism on a 2-cycle: an edge never repeats
    // within one path, so *1..4 from 'a' stops at the 2-hop round trip
    val cn = Seq(("a", "N", Map.empty[String, String]), ("b", "N", Map.empty[String, String]))
      .toDF("id", "label", "props")
    val ce = Seq(("T", "a", "b", 1, Map.empty[String, String]),
        ("T", "b", "a", 1, Map.empty[String, String]))
      .toDF("etype", "src", "dst", "event_id", "props")
    val cyc = CypherLite.run(cn, ce,
      "MATCH (a:N)-[r:T*1..4]->(x:N) WHERE a.id = 'a' RETURN x, r")
      .collect().map(r => (r.getString(0), r.getSeq[String](1).toList)).toSet
    assert(cyc == Set(
      ("b", List("a-[T]->b")),
      ("a", List("a-[T]->b", "b-[T]->a"))))
    // composes with relationships(p): the shortestPath list equals the
    // size(r)-minimal var-length list on the forest-shaped fixture
    val spth = CypherLite.run(dn, de,
      "MATCH p = shortestPath((a:N)-[:T*1..4]->(c:N)) WHERE a.id = 'a' " +
        "RETURN c, relationships(p)")
      .collect().map(r => (r.getString(0), r.getSeq[String](1).toList)).toMap
    assert(spth("b1") == List("a-[T]->b1"))
    // loud errors: single-edge accessors and property reads on a list
    intercept[IllegalArgumentException](CypherLite.run(nodes, edges,
      "MATCH (a:Process)-[r:SPAWNS*1..2]->(b:Process) RETURN type(r)"))
    intercept[IllegalArgumentException](CypherLite.run(nodes, edges,
      "MATCH (a:Process)-[r:SPAWNS*1..2]->(b:Process) RETURN startNode(r)"))
    intercept[IllegalArgumentException](CypherLite.run(nodes, edges,
      "MATCH (a:Process)-[r:SPAWNS*1..2]->(b:Process) RETURN r.pid"))
  }

  test("map projections: n {.a, .b} and n {.*} on node and edge variables") {
    val (nodes, edges) = graph
    // listed properties ≡ hand-built map from the props column
    val got = CypherLite.run(nodes, edges,
      "MATCH (t:Trace)-[:HAS_PROCESS]->(p:Process) " +
        "RETURN p, p {.image, .pid} AS m ORDER BY p LIMIT 20")
      .collect().map(r => r.getString(0) -> r.getAs[Map[String, String]](1)).toMap
    val want = nodes.filter(col("label") === "Process")
      .select(col("id"),
        map(lit("image"), element_at(col("props"), "image"),
          lit("pid"), element_at(col("props"), "pid")).as("m"))
      .collect().map(r => r.getString(0) -> r.getAs[Map[String, String]](1)).toMap
    got.foreach { case (id, m) => assert(m == want(id), s"$id: $m vs ${want(id)}") }
    assert(got.nonEmpty && got.values.exists(_.values.exists(_ != null)))
    // .* ≡ properties(n)
    val star = CypherLite.run(nodes, edges,
      "MATCH (p:Process) RETURN p, p {.*} AS m, properties(p) AS pr LIMIT 10")
      .collect()
    star.foreach(r => assert(
      r.getAs[Map[String, String]](1) == r.getAs[Map[String, String]](2)))
    // edge variables read the carried props map
    val em = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[r:CONNECTED_TO]->(ip:Ip) " +
        "RETURN r {.dport} AS m LIMIT 5").collect()
    assert(em.nonEmpty && em.forall(r =>
      r.getAs[Map[String, String]](0).keySet == Set("dport")))
    // loud: mixing .* with listed items; unknown item shapes
    intercept[IllegalArgumentException](CypherLite.run(nodes, edges,
      "MATCH (p:Process) RETURN p {.*, .image} AS m"))
    intercept[IllegalArgumentException](CypherLite.run(nodes, edges,
      "MATCH (p:Process) RETURN p {image} AS m"))
  }

  test("ORDER BY on a non-returned property of a returned variable") {
    val (nodes, edges) = graph
    val got = CypherLite.run(nodes, edges,
      "MATCH (t:Trace)-[:HAS_PROCESS]->(p:Process) " +
        "RETURN p ORDER BY p.image, p LIMIT 20")
    assert(got.columns.toSeq == Seq("p")) // the hidden sort key is dropped
    val want = CypherLite.run(nodes, edges,
      "MATCH (t:Trace)-[:HAS_PROCESS]->(p:Process) " +
        "RETURN p, p.image AS img ORDER BY img, p LIMIT 20")
      .select(col("p"))
    assert(got.collect().map(_.getString(0)).toSeq ==
      want.collect().map(_.getString(0)).toSeq)
    assert(got.count() == 20)
    // DISTINCT keeps Cypher's own rule: sort keys must be projected
    intercept[Exception](CypherLite.run(nodes, edges,
      "MATCH (p:Process) RETURN DISTINCT p ORDER BY p.image").collect())
    // review r10: a CARRIED alias whose name looks like "v_prop" must
    // sort by the alias column, never be reinterpreted as a property
    // of the returned bare variable
    val aliased = CypherLite.run(nodes, edges,
      "MATCH (t:Trace)-[:HAS_PROCESS]->(p:Process) " +
        "WITH p, t AS p_src RETURN p ORDER BY p_src, p LIMIT 10")
    val aliasedWant = CypherLite.run(nodes, edges,
      "MATCH (t:Trace)-[:HAS_PROCESS]->(p:Process) " +
        "WITH p, t AS p_src RETURN p, p_src ORDER BY p_src, p LIMIT 10")
      .select(col("p"))
    assert(aliased.collect().map(_.getString(0)).toSeq ==
      aliasedWant.collect().map(_.getString(0)).toSeq)
  }

  test("list subscripts: xs[i] and xs[a..b], 0-indexed with negatives from the end") {
    val (nodes, edges) = graph
    import spark.implicits._
    val sn = Seq(("a", "S", Map.empty[String, String])).toDF("id", "label", "props")
    val se = Seq.empty[(String, String, String, Int, Map[String, String])]
      .toDF("etype", "src", "dst", "event_id", "props")
    def one(expr: String): Row = CypherLite.run(sn, se,
      s"MATCH (s:S) RETURN $expr AS x").collect()(0)
    // literal-list indexing (term-position '[' stays a literal)
    assert(one("['a','b','c'][0]").getString(0) == "a")
    assert(one("['a','b','c'][-1]").getString(0) == "c")
    assert(one("['a','b','c'][5]").isNullAt(0)) // past the end → null
    assert(one("['a','b','c'][1..3]").getSeq[String](0).toList == List("b", "c"))
    assert(one("['a','b','c'][..2]").getSeq[String](0).toList == List("a", "b"))
    assert(one("['a','b','c'][1..]").getSeq[String](0).toList == List("b", "c"))
    assert(one("['a','b','c'][0..-1]").getSeq[String](0).toList == List("a", "b"))
    // out-of-range bounds CLAMP (review r10: Spark's raw slice() would
    // reinterpret an underflowing negative start as from-the-end)
    assert(one("['a','b','c'][-5..2]").getSeq[String](0).toList == List("a", "b"))
    assert(one("['a','b','c'][-4..2]").getSeq[String](0).toList == List("a", "b"))
    assert(one("['a','b','c'][1..9]").getSeq[String](0).toList == List("b", "c"))
    assert(one("['a','b','c'][5..9]").getSeq[String](0).toList == Nil)
    assert(one("size(['a','b','c'][1..3])").getAs[Number](0).intValue == 2)
    assert(one("range(0, 5)[2]").getAs[Number](0).longValue == 2L)
    // chained: slice then index
    assert(one("['a','b','c','d'][1..3][0]").getString(0) == "b")
    // on a collect() alias through WITH, and inside a lambda
    val viaCollect = CypherLite.run(nodes, edges,
      "MATCH (t:Trace)-[:HAS_PROCESS]->(p:Process) " +
        "WITH t, collect(p) AS ps RETURN t, ps[0] AS first, size(ps[1..]) AS rest " +
        "ORDER BY t LIMIT 10").collect()
    viaCollect.foreach { r =>
      assert(r.getString(1) != null)
      assert(r.getAs[Number](2).intValue >= 0)
    }
    val lam = one("[x IN [['a','b'],['c']] | x[0]]")
    assert(lam.getSeq[String](0).toList == List("a", "c"))
  }

  test("generic path variables: MATCH p = <chain>, nodes/relationships/length, bare p") {
    val (nodes, edges) = graph
    // fixed two-hop chain: every accessor agrees with the endpoints
    val got = CypherLite.run(nodes, edges,
      "MATCH p = (t:Trace)-[:HAS_PROCESS]->(q:Process)-[:CREATED_FILE]->(f:File) " +
        "RETURN t, f, p, nodes(p) AS ns, relationships(p) AS rs, length(p) AS n " +
        "LIMIT 50")
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (t, f) = (r.getString(0), r.getString(1))
      val ns = r.getSeq[String](3)
      assert(r.getString(2) == ns.mkString(">")) // bare p = the path string
      assert(ns.head == t && ns.last == f && ns.length == 3)
      val rs = r.getSeq[String](4)
      assert(rs.length == 2 && r.getLong(5) == 2L)
      assert(rs.head == s"$t-[HAS_PROCESS]->${ns(1)}")
      assert(rs(1) == s"${ns(1)}-[CREATED_FILE]->$f")
    }
    // var-length binding: relationships(p) ≡ the named-hop r twin,
    // nodes(p) walks the traversal targets
    val vl = CypherLite.run(nodes, edges,
      "MATCH p = (a:Process)-[:SPAWNS*1..2]->(b:Process) " +
        "RETURN a, b, relationships(p) AS rs, nodes(p) AS ns, length(p) AS n")
      .collect()
    val twin = CypherLite.run(nodes, edges,
      "MATCH (a:Process)-[r:SPAWNS*1..2]->(b:Process) RETURN a, b, r")
      .collect().map(r => (r.getString(0), r.getString(1), r.getSeq[String](2).toList))
      .toSet
    assert(vl.map(r => (r.getString(0), r.getString(1), r.getSeq[String](2).toList))
      .toSet == twin)
    vl.foreach { r =>
      val rs = r.getSeq[String](2); val ns = r.getSeq[String](3)
      assert(ns.length == rs.length + 1 && r.getLong(4) == rs.length.toLong)
      assert(ns.head == r.getString(0) && ns.last == r.getString(1))
    }
    // reverse hop: relationship strings stay in GRAPH direction, node
    // list stays in TRAVERSAL order
    val rev = CypherLite.run(nodes, edges,
      "MATCH p = (f:File)<-[:CREATED_FILE]-(q:Process) " +
        "RETURN f, q, relationships(p) AS rs, nodes(p) AS ns LIMIT 5")
      .collect()
    assert(rev.nonEmpty)
    rev.foreach { r =>
      assert(r.getSeq[String](2).head ==
        s"${r.getString(1)}-[CREATED_FILE]->${r.getString(0)}")
      assert(r.getSeq[String](3).toList == List(r.getString(0), r.getString(1)))
    }
    // path accessors as TERMS: WHERE length(p) filters, size(nodes(p))
    // counts — the WHERE surface the RETURN-position accessors imply
    val whereLen = CypherLite.run(nodes, edges,
      "MATCH p = (a:Process)-[:SPAWNS*1..3]->(b:Process) " +
        "WHERE length(p) >= 2 RETURN a, b, length(p) AS n, size(nodes(p)) AS nn")
      .collect()
    assert(whereLen.nonEmpty)
    assert(whereLen.forall(r => r.getLong(2) >= 2 &&
      r.getAs[Number](3).intValue == r.getLong(2) + 1))
    // loud: path var colliding with a pattern variable; accessors on a
    // non-path variable
    intercept[IllegalArgumentException](CypherLite.run(nodes, edges,
      "MATCH q = (q:Process)-[:SPAWNS]->(b:Process) RETURN q"))
    intercept[IllegalArgumentException](CypherLite.run(nodes, edges,
      "MATCH (a:Process)-[:SPAWNS]->(b:Process) RETURN length(b)"))
    intercept[IllegalArgumentException](CypherLite.run(nodes, edges,
      "MATCH (a:Process)-[:SPAWNS]->(b:Process) WHERE length(a) > 1 RETURN a"))
  }

  test("pattern comprehension: [(p)-[:T]->(x) | expr] vs OPTIONAL MATCH + collect twin") {
    val (nodes, edges) = graph
    val got = CypherLite.run(nodes, edges,
      "MATCH (p:Process) RETURN p, [(p)-[:CREATED_FILE]->(f:File) | f] AS files " +
        "ORDER BY p")
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    val want = CypherLite.run(nodes, edges,
      "MATCH (p:Process) OPTIONAL MATCH (p)-[:CREATED_FILE]->(f:File) " +
        "RETURN p, collect(f) AS files ORDER BY p")
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList.sorted).toMap
    assert(got == want && got.nonEmpty)
    assert(got.values.exists(_.nonEmpty) && got.values.exists(_.isEmpty))
    // inner WHERE filters matches; property projection; size() composes
    val whed = CypherLite.run(nodes, edges,
      "MATCH (t:Trace) RETURN t, " +
        "[(t)-[:HAS_PROCESS]->(q:Process) WHERE q.image ENDS WITH '.exe' | q.image] " +
        "AS exes, size([(t)-[:HAS_PROCESS]->(q:Process) | q]) AS np ORDER BY t")
      .collect()
    val nHp = et("HAS_PROCESS").count()
    assert(whed.map(_.getAs[Number](2).longValue).sum == nHp)
    assert(whed.forall(r => r.getSeq[String](1).forall(_.endsWith(".exe"))))
    // projection duplicates kept (multiset): two distinct matches
    // projecting the same property VALUE appear twice. (Edge-level
    // multiplicity follows this engine's documented pair-dedup walk —
    // two parallel edges to the same node are one match.)
    import spark.implicits._
    val mn = Seq(("a", "N", Map.empty[String, String]),
      ("x1", "M", Map("name" -> "same")), ("x2", "M", Map("name" -> "same")))
      .toDF("id", "label", "props")
    val me = Seq(("T", "a", "x1", 1, Map.empty[String, String]),
        ("T", "a", "x2", 2, Map.empty[String, String]))
      .toDF("etype", "src", "dst", "event_id", "props")
    val dup = CypherLite.run(mn, me,
      "MATCH (a:N) RETURN [(a)-[:T]->(x:M) | x.name] AS xs").collect()
    assert(dup.length == 1 && dup(0).getSeq[String](0).toList == List("same", "same"))
    // review r10: a match whose PROJECTION is null still contributes
    // an element (Cypher keeps nulls; bare collect_list would drop)
    val mn2 = Seq(("a", "N", Map.empty[String, String]),
      ("x1", "M", Map("name" -> "n1")), ("x2", "M", Map.empty[String, String]))
      .toDF("id", "label", "props")
    val me2 = Seq(("T", "a", "x1", 1, Map.empty[String, String]),
        ("T", "a", "x2", 2, Map.empty[String, String]))
      .toDF("etype", "src", "dst", "event_id", "props")
    val withNull = CypherLite.run(mn2, me2,
      "MATCH (a:N) RETURN [(a)-[:T]->(x:M) | x.name] AS xs, " +
        "size([(a)-[:T]->(x:M) | x.name]) AS n").collect()
    assert(withNull.length == 1)
    assert(withNull(0).getSeq[String](0).toList == List(null, "n1"))
    assert(withNull(0).getAs[Number](1).intValue == 2)
    // unbound anchor is loud
    intercept[IllegalArgumentException](CypherLite.run(nodes, edges,
      "MATCH (p:Process) RETURN [(z)-[:CREATED_FILE]->(f:File) | f] AS fs"))
  }

  test("simple CASE form desugars to searched CASE; mixed form is loud") {
    val (nodes, edges) = graph
    val got = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[r:CONNECTED_TO]->(ip:Ip) " +
        "RETURN p, ip, CASE toInteger(r.dport) WHEN 443 THEN 'tls' " +
        "WHEN 80 THEN 'http' ELSE 'other' END AS svc ORDER BY p, ip, svc")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val want = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[r:CONNECTED_TO]->(ip:Ip) " +
        "RETURN p, ip, CASE WHEN toInteger(r.dport) = 443 THEN 'tls' " +
        "WHEN toInteger(r.dport) = 80 THEN 'http' ELSE 'other' END AS svc " +
        "ORDER BY p, ip, svc")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(got.toSeq == want.toSeq && got.nonEmpty)
    // branch coverage + no-ELSE → null (Cypher), pinned on a fixture
    import spark.implicits._
    val sn = Seq(("a", "S", Map("k" -> "1")), ("b", "S", Map("k" -> "2")),
      ("c", "S", Map("k" -> "3"))).toDF("id", "label", "props")
    val se = Seq.empty[(String, String, String, Int, Map[String, String])]
      .toDF("etype", "src", "dst", "event_id", "props")
    val fx = CypherLite.run(sn, se,
      "MATCH (s:S) RETURN s, CASE toInteger(s.k) WHEN 1 THEN 'one' " +
        "WHEN 2 THEN 'two' END AS w ORDER BY s").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getString(1)))
    assert(fx.toSeq == Seq("a" -> "one", "b" -> "two", "c" -> null))
    // a predicate where a value belongs is a loud parse error
    intercept[IllegalArgumentException](CypherLite.run(nodes, edges,
      "MATCH (p:Process) RETURN CASE p.integrity WHEN p.integrity = 'High' " +
        "THEN 1 END AS x"))
  }

  test("reverse hop, id predicate, prop return and LIMIT") {
    val (nodes, edges) = graph
    val out = CypherLite.run(nodes, edges,
      "MATCH (f:File)<-[:CREATED_FILE]-(p:Process) " +
        "WHERE f.id CONTAINS '.exe' RETURN DISTINCT f, p.image LIMIT 5")
    assert(out.columns.toSeq == Seq("f", "p_image"))
    val rows = out.collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getString(0).toLowerCase.contains(".exe")))
  }

  test("count(*) aggregates with Cypher's implicit grouping") {
    val (nodes, edges) = graph
    val got = CypherLite.run(nodes, edges,
      "MATCH (t:Trace)-[:HAS_PROCESS]->(p:Process) RETURN t, count(*)")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = et("HAS_PROCESS").groupBy(col("src")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want && got.nonEmpty)
  }

  test("ORDER BY with count(*) returns the busiest traces first") {
    val (nodes, edges) = graph
    val got = CypherLite.run(nodes, edges,
      "MATCH (t:Trace)-[:HAS_PROCESS]->(p:Process) " +
        "RETURN t, count(*) ORDER BY count(*) DESC, t LIMIT 3")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val want = et("HAS_PROCESS").groupBy(col("src")).count()
      .orderBy(col("count").desc, col("src")).limit(3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.sameElements(want))
  }

  test("edge variable: WHERE and RETURN over edge properties") {
    val (nodes, edges) = graph
    val got = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[r:CONNECTED_TO]->(ip:Ip) " +
        "WHERE r.dport = '443' RETURN DISTINCT p, ip, r.dport")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val want = et("CONNECTED_TO")
      .filter(element_at(col("props"), "dport") === "443")
      .select(col("src"), col("dst"), element_at(col("props"), "dport"))
      .distinct()
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("OPTIONAL MATCH keeps non-matching rows with nulls") {
    val (nodes, edges) = graph
    val got = CypherLite.run(nodes, edges,
      "MATCH (t:Trace)-[:HAS_PROCESS]->(p:Process) " +
        "OPTIONAL MATCH (p)-[:CONNECTED_TO]->(ip:Ip) RETURN DISTINCT p, ip")
    val rows = got.collect().map(r => (r.getString(0), Option(r.getString(1))))
    val talkers = et("CONNECTED_TO").select(col("src")).distinct().count()
    assert(rows.exists(_._2.isEmpty), "non-connecting processes must appear with null ip")
    assert(rows.count(_._2.isDefined) ==
      et("CONNECTED_TO").select(col("src"), col("dst")).distinct()
        .join(nodes.filter(col("label") === "Process").select(col("id").as("src")), Seq("src"), "left_semi")
        .count())
    assert(rows.filter(_._2.isDefined).map(_._1).distinct.length == talkers)
  }

  test("any-type hop matches every edge type") {
    val (nodes, edges) = graph
    val got = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[]->(x) RETURN DISTINCT p, x")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val procs = nodes.filter(col("label") === "Process").select(col("id").as("src"))
    val want = edges.select(col("src"), col("dst")).distinct()
      .join(procs, Seq("src"), "left_semi")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("parser rejects unsupported shapes") {
    intercept[IllegalArgumentException](CypherLite.parse("FOO BAR"))
    // disconnected multi-pattern = cartesian product → rejected
    intercept[IllegalArgumentException](
      CypherLite.parse("MATCH (a)-[:X]->(b), (c)-[:Y]->(d) RETURN a"))
    // r10: edge variables on var-length hops PARSE now (r = the
    // relationship list) — the old rejection is gone
    CypherLite.parse("MATCH (a)-[r:X*1..3]->(b) RETURN a, r")
    // …but out-of-range bounds stay loud
    intercept[IllegalArgumentException](CypherLite.run(graph._1, graph._2,
      "MATCH (a)-[r:SPAWNS*1..11]->(b) RETURN a, r"))
  }

  test("multi-pattern MATCH expresses the inject-and-beacon motif") {
    val (nodes, edges) = graph
    val got = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[:INJECTED_THREAD]->(x), (p)-[:CONNECTED_TO]->(ip:Ip) " +
        "RETURN DISTINCT p, x, ip")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val want = graft.graph.Detections.injectAndBeacon(edges)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("multi-pattern joining on a LATER variable (second chain's head unbound)") {
    val (nodes, edges) = graph
    // second chain's head q is unbound when its turn comes — it walks
    // separately and equi-joins on the shared tail variable p
    val got = CypherLite.run(nodes, edges,
      "MATCH (t:Trace)-[:HAS_PROCESS]->(p:Process), (q:Process)-[:SPAWNS]->(p) " +
        "RETURN DISTINCT t, q, p")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val want = et("HAS_PROCESS").select(col("src").as("t"), col("dst").as("p"))
      .join(et("SPAWNS").select(col("src").as("q"), col("dst").as("p")), Seq("p"))
      .select(col("t"), col("q"), col("p")).distinct()
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("numeric WHERE: r.dport > 1024 casts the property") {
    val (nodes, edges) = graph
    val got = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[r:CONNECTED_TO]->(ip:Ip) WHERE r.dport > 1024 " +
        "RETURN DISTINCT p, ip, r.dport")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val want = et("CONNECTED_TO")
      .filter(element_at(col("props"), "dport").cast("double") > 1024)
      .select(col("src"), col("dst"), element_at(col("props"), "dport"))
      .distinct()
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("arithmetic WHERE: (toInteger(r.dport) + 1) * 2 > 500") {
    val (nodes, edges) = graph
    val got = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[r:CONNECTED_TO]->(ip:Ip) " +
        "WHERE (toInteger(r.dport) + 1) * 2 > 500 RETURN DISTINCT p, ip")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val want = et("CONNECTED_TO")
      .filter((element_at(col("props"), "dport").cast("long").cast("double") + 1) * 2 > 500)
      .select(col("src"), col("dst")).distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == want && got.nonEmpty)
    // and the threshold actually bites (a vacuous filter proves nothing)
    val all = et("CONNECTED_TO").select(col("src"), col("dst")).distinct().count()
    assert(got.size < all)
  }

  test("prop-to-prop WHERE: self-image spawns (a.image = b.image)") {
    val (nodes, edges) = graph
    val got = CypherLite.run(nodes, edges,
      "MATCH (a:Process)-[:SPAWNS]->(b:Process) WHERE a.image = b.image " +
        "RETURN DISTINCT a, b")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val img = nodes.filter(col("label") === "Process")
      .select(col("id"), element_at(col("props"), "image").as("img"))
    val want = et("SPAWNS").select(col("src"), col("dst"))
      .join(img.select(col("id").as("src"), col("img").as("ia")), Seq("src"))
      .join(img.select(col("id").as("dst"), col("img").as("ib")), Seq("dst"))
      .filter(col("ia") === col("ib"))
      .select(col("src"), col("dst")).distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("OR and parentheses in WHERE with standard precedence") {
    val (nodes, edges) = graph
    val got = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[r:CONNECTED_TO]->(ip:Ip) " +
        "WHERE p.image ENDS WITH '.exe' AND (r.dport = '443' OR r.dport < 100) " +
        "RETURN DISTINCT p, ip")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val procs = nodes.filter(col("label") === "Process")
      .filter(element_at(col("props"), "image").endsWith(".exe"))
      .select(col("id").as("p"))
    val dp = element_at(col("props"), "dport")
    val want = et("CONNECTED_TO")
      .filter(dp === "443" || dp.cast("double") < 100)
      .select(col("src").as("p"), col("dst").as("ip"))
      .join(procs, Seq("p"))
      .distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("RETURN v.id aliases the node key column (regression: AnalysisException)") {
    val (nodes, edges) = graph
    val out = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[:CREATED_FILE]->(f:File) " +
        "RETURN DISTINCT p, f.id ORDER BY f.id LIMIT 5")
    assert(out.columns.toSeq == Seq("p", "f_id"))
    assert(out.count() == 5)
  }

  test("OPTIONAL MATCH WHERE on the optional variable keeps non-matching rows") {
    val (nodes, edges) = graph
    val got = CypherLite.run(nodes, edges,
      "MATCH (t:Trace)-[:HAS_PROCESS]->(p:Process) " +
        "OPTIONAL MATCH (p)-[:CONNECTED_TO]->(ip:Ip) " +
        "WHERE ip.id STARTS WITH '192.' RETURN DISTINCT p, ip")
    val rows = got.collect().map(r => (r.getString(0), Option(r.getString(1))))
    // Cypher semantics: every process appears; those without a 10.* ip
    // appear with null (SQL post-filter semantics would DROP them)
    val allProcs = et("HAS_PROCESS").select(col("dst")).distinct().count()
    assert(rows.map(_._1).distinct.length.toLong == allProcs)
    assert(rows.forall(r => r._2.forall(_.startsWith("192."))))
    val tenTalkers = et("CONNECTED_TO")
      .filter(col("dst").startsWith("192."))
      .select(col("src")).distinct().count()
    assert(rows.filter(_._2.isDefined).map(_._1).distinct.length.toLong == tenTalkers)
    assert(rows.exists(_._2.isEmpty))
  }

  test("two OPTIONAL MATCH chains attach independently with per-chain WHERE") {
    val (nodes, edges) = graph
    val got = CypherLite.run(nodes, edges,
      "MATCH (t:Trace)-[:HAS_PROCESS]->(p:Process) " +
        "OPTIONAL MATCH (p)-[:CONNECTED_TO]->(ip:Ip) " +
        "OPTIONAL MATCH (p)-[:CREATED_FILE]->(f:File) " +
        "WHERE ip.id STARTS WITH '192.' AND f.id ENDS WITH '.exe' " +
        "RETURN DISTINCT p, ip, f")
    val rows = got.collect().map(r =>
      (r.getString(0), Option(r.getString(1)), Option(r.getString(2))))
    // every process appears at least once (both chains optional)
    val allProcs = et("HAS_PROCESS").select(col("dst")).distinct().count()
    assert(rows.map(_._1).distinct.length.toLong == allProcs)
    // chain filters applied inside their chains
    assert(rows.forall(r => r._2.forall(_.startsWith("192."))))
    assert(rows.forall(r => r._3.forall(_.toLowerCase.endsWith(".exe"))))
    // both chains actually match somewhere, independently
    assert(rows.exists(r => r._2.isDefined))
    assert(rows.exists(r => r._3.isDefined))
    assert(rows.exists(r => r._2.isEmpty && r._3.isDefined) ||
      rows.exists(r => r._2.isDefined && r._3.isEmpty))
    // cross-check one side: processes with a 10.* connection
    val tenTalkers = et("CONNECTED_TO").filter(col("dst").startsWith("192."))
      .select(col("src")).distinct().count()
    assert(rows.filter(_._2.isDefined).map(_._1).distinct.length.toLong == tenTalkers)
  }

  test("WHERE conjunct mixing optional and required variables is rejected") {
    val (nodes, edges) = graph
    intercept[IllegalArgumentException] {
      CypherLite.run(nodes, edges,
        "MATCH (t:Trace)-[:HAS_PROCESS]->(p:Process) " +
          "OPTIONAL MATCH (p)-[:CONNECTED_TO]->(ip:Ip) " +
          "WHERE p.image CONTAINS 'x' OR ip.id STARTS WITH '192.' RETURN p, ip")
    }
  }

  test("aggregates: sum/min/max/collect with implicit grouping") {
    val (nodes, edges) = graph
    val got = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[r:CONNECTED_TO]->(ip:Ip) " +
        "RETURN p, count(*), sum(r.dport), min(ip.id), collect(ip) " +
        "ORDER BY p")
    assert(got.columns.toSeq ==
      Seq("p", "count", "sum_r_dport", "min_ip_id", "collect_ip"))
    val want = et("CONNECTED_TO")
      .groupBy(col("src"))
      .agg(count(lit(1)).as("count"),
        sum(element_at(col("props"), "dport").cast("double")).as("sum_r_dport"),
        min(col("dst")).as("min_ip_id"),
        array_sort(collect_list(col("dst"))).as("collect_ip"))
      .orderBy(col("src"))
    val g = got.collect(); val w = want.collect()
    assert(g.length == w.length && g.nonEmpty)
    g.zip(w).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0))
      assert(a.getLong(1) == b.getLong(1))
      assert(a.getDouble(2) == b.getDouble(2))
      assert(a.getString(3) == b.getString(3))
      assert(a.getSeq[String](4) == b.getSeq[String](4))
    }
  }

  test("statistical aggregates: stDev/stDevP/percentileCont/percentileDisc") {
    val (nodes, edges) = graph
    val got = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[r:CONNECTED_TO]->(ip:Ip) " +
        "RETURN p, stDev(toInteger(r.dport)) AS sd, stDevP(toInteger(r.dport)) AS sdp, " +
        "percentileCont(toInteger(r.dport), 0.5) AS med, " +
        "percentileDisc(toInteger(r.dport), 0.5) AS medd ORDER BY p")
    val want = et("CONNECTED_TO")
      .groupBy(col("src"))
      .agg(stddev_samp(element_at(col("props"), "dport").cast("double")).as("sd"),
        stddev_pop(element_at(col("props"), "dport").cast("double")).as("sdp"),
        percentile(element_at(col("props"), "dport").cast("double"), lit(0.5)).as("med"),
        sort_array(collect_list(
          element_at(col("props"), "dport").cast("double"))).as("vals"))
      .orderBy(col("src"))
    val g = got.collect(); val w = want.collect()
    assert(g.length == w.length && g.nonEmpty)
    g.zip(w).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0))
      Seq(1, 2, 3).foreach { i =>
        val (x, y) = (a.get(i), b.get(i))
        assert((x == null && y == null) ||
          math.abs(x.asInstanceOf[Double] - y.asInstanceOf[Double]) < 1e-9)
      }
      // percentileDisc = Neo4j nearest-rank: sorted value at ceil(p·n),
      // replayed independently in Scala
      val vs = b.getSeq[Double](4)
      val expDisc: Any =
        if (vs.isEmpty) null
        else vs(math.max(1, math.ceil(0.5 * vs.size - 1e-9).toInt) - 1)
      assert(a.get(4) == expDisc,
        s"percentileDisc mismatch for ${a.getString(0)}: got ${a.get(4)}, want $expDisc")
    }
    // percentileDisc returns an actual stored value
    val medd = g.map(_.get(4)).filter(_ != null).map(_.asInstanceOf[Double])
    assert(medd.forall(v => v == math.rint(v))) // ports are integers
    // parse guards: missing/invalid percentile arg is loud
    intercept[IllegalArgumentException] {
      CypherLite.run(nodes, edges,
        "MATCH (p:Process) RETURN percentileCont(p.image) AS x")
    }
    intercept[IllegalArgumentException] {
      CypherLite.run(nodes, edges,
        "MATCH (p:Process)-[r:CONNECTED_TO]->(ip:Ip) " +
          "RETURN percentileCont(toInteger(r.dport), 1.5) AS x")
    }
  }

  test("CALL { … } subquery: post-UNION aggregation, WHERE tails, nesting, loud errors") {
    val (nodes, edges) = graph
    // the post-UNION-aggregation idiom (the Cypher-5 reason CALL
    // subqueries exist): collect two edge populations, then aggregate
    // over the COMBINED rows — impossible with plain UNION, whose
    // RETURN is per-part
    val got = CypherLite.run(nodes, edges,
      """CALL {
        |  MATCH (p:Process)-[:CREATED_FILE]->(f:File) RETURN p, f AS obj
        |  UNION
        |  MATCH (p:Process)-[:DELETED_FILE]->(f:File) RETURN p, f AS obj
        |}
        |RETURN p, count(obj) AS touched ORDER BY touched DESC, p LIMIT 5""".stripMargin)
    val want = {
      val c = et("CREATED_FILE").select(col("src").as("p"), col("dst").as("obj"))
      val d = et("DELETED_FILE").select(col("src").as("p"), col("dst").as("obj"))
      c.unionByName(d).distinct()
        .groupBy(col("p")).agg(count(col("obj")).as("touched"))
        .orderBy(col("touched").desc, col("p")).limit(5)
    }
    assert(got.collect().toSeq.map(_.toSeq) == want.collect().toSeq.map(_.toSeq))
    assert(got.count() == 5)
    // WHERE tail filters the subquery result before the continuation
    val filtered = CypherLite.run(nodes, edges,
      """CALL { MATCH (p:Process)-[:CREATED_FILE]->(f:File) RETURN p, f }
        |WHERE f =~ '.*\.exe' RETURN DISTINCT p ORDER BY p""".stripMargin)
    val wantF = et("CREATED_FILE")
      .filter(col("dst").rlike("^.*\\.exe$"))
      .select(col("src").as("p")).distinct().orderBy(col("p"))
    assert(filtered.collect().map(_.getString(0)).toSeq ==
      wantF.collect().map(_.getString(0)).toSeq)
    // a procedure CALL composes INSIDE the braces
    val viaProc = CypherLite.run(nodes, edges,
      """CALL { CALL graft.degree YIELD id, degree RETURN id, degree }
        |RETURN id, degree ORDER BY degree DESC, id LIMIT 3""".stripMargin)
    assert(viaProc.count() == 3)
    // MATCH continuation after the subquery (carried variables join)
    val cont = CypherLite.run(nodes, edges,
      """CALL { MATCH (p:Process)-[:INJECTED_THREAD]->(q:Process) RETURN q }
        |MATCH (q)-[:CONNECTED_TO]->(ip:Ip) RETURN DISTINCT q, ip ORDER BY q, ip""".stripMargin)
    val wantC = et("INJECTED_THREAD").select(col("dst").as("q"))
      .join(et("CONNECTED_TO").select(col("src").as("q"), col("dst").as("ip")), Seq("q"))
      .distinct().orderBy(col("q"), col("ip"))
    assert(cont.collect().toSeq.map(_.toSeq) == wantC.collect().toSeq.map(_.toSeq))
    // loud errors: importing WITH, unbalanced braces, and a top-level
    // UNION in the continuation (it belongs inside the braces — a
    // silent swallow into the tail projection would misparse)
    intercept[IllegalArgumentException](CypherLite.run(nodes, edges,
      "CALL { WITH p MATCH (p)-[:SPAWNS]->(q:Process) RETURN q } RETURN q"))
    intercept[IllegalArgumentException](CypherLite.run(nodes, edges,
      "CALL { MATCH (p:Process) RETURN p"))
    val uerr = intercept[IllegalArgumentException](CypherLite.run(nodes, edges,
      "CALL { MATCH (p:Process) RETURN p } RETURN p " +
        "UNION MATCH (f:File) RETURN f AS p"))
    assert(uerr.getMessage.contains("inside the braces"))
  }

  test("mid-query CALL { WITH … }: correlated subqueries, fills, guards") {
    val (nodes, edges) = graph
    // per-combo aggregate with Cypher's zero-fill: every injected
    // process keeps its row, count 0 when it never connected
    val got = CypherLite.run(nodes, edges,
      """MATCH (p:Process)-[:INJECTED_THREAD]->(q:Process)
        |CALL { WITH q MATCH (q)-[:CONNECTED_TO]->(ip:Ip) RETURN count(ip) AS beacons }
        |RETURN p, q, beacons ORDER BY p, q""".stripMargin)
    val inj = et("INJECTED_THREAD").select(col("src").as("p"), col("dst").as("q"))
    val cnt = et("CONNECTED_TO").groupBy(col("src").as("q"))
      .agg(count(lit(1)).as("beacons"))
    val want = inj.join(cnt, Seq("q"), "left")
      .select(col("p"), col("q"), coalesce(col("beacons"), lit(0L)).as("beacons"))
      .orderBy(col("p"), col("q"))
    assert(got.collect().toSeq.map(_.toSeq) == want.collect().toSeq.map(_.toSeq))
    assert(got.count() > 0)
    // non-aggregate correlated subquery ≡ the comma-joined two-pattern
    // MATCH (rows with no subquery match drop — inner-join semantics)
    val flat = CypherLite.run(nodes, edges,
      """MATCH (p:Process)-[:INJECTED_THREAD]->(q:Process)
        |CALL { WITH q MATCH (q)-[:CONNECTED_TO]->(ip:Ip) RETURN ip }
        |RETURN DISTINCT p, q, ip ORDER BY p, q, ip""".stripMargin)
    val want2 = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[:INJECTED_THREAD]->(q:Process), " +
        "(q)-[:CONNECTED_TO]->(ip:Ip) RETURN DISTINCT p, q, ip ORDER BY p, q, ip")
    assert(flat.collect().toSeq.map(_.toSeq) == want2.collect().toSeq.map(_.toSeq))
    // collect() fills [] for combos with no matches
    val coll = CypherLite.run(nodes, edges,
      """MATCH (p:Process)
        |CALL { WITH p MATCH (p)-[:CREATED_FILE]->(f:File) RETURN collect(f) AS files }
        |RETURN p, files ORDER BY p""".stripMargin)
    val nProc = nodes.filter(col("label") === "Process").count()
    val nCreators = et("CREATED_FILE").select(col("src")).distinct().count()
    assert(coll.count() == nProc)
    assert(coll.filter(size(col("files")) === 0).count() == nProc - nCreators)
    // uncorrelated subquery: cross-pairs with every outer row; the
    // inner global aggregate works (RETURN count with no grouping)
    val uncorr = CypherLite.run(nodes, edges,
      """MATCH (t:Trace)
        |CALL { MATCH (p:Process) RETURN count(p) AS np }
        |RETURN t, np ORDER BY t""".stripMargin)
    val nTrace = nodes.filter(col("label") === "Trace").count()
    assert(uncorr.count() == nTrace)
    assert(uncorr.select(col("np")).distinct().collect().map(_.getLong(0)).toSeq ==
      Seq(nProc))
    // standalone global aggregate (the same project path)
    val gagg = CypherLite.run(nodes, edges,
      "MATCH (p:Process) RETURN count(p) AS n").collect()
    assert(gagg.length == 1 && gagg(0).getLong(0) == nProc)
    // guards: un-imported outer reference, UNION inside, correlated
    // ORDER BY, output-name collision
    val leak = intercept[IllegalArgumentException](CypherLite.run(nodes, edges,
      """MATCH (p:Process)-[:INJECTED_THREAD]->(q:Process)
        |CALL { MATCH (q)-[:CONNECTED_TO]->(ip:Ip) RETURN ip }
        |RETURN p, ip""".stripMargin))
    assert(leak.getMessage.contains("without importing"))
    // UNION inside a correlated subquery: every part compiles from the
    // imported combos (ONE leading WITH covers all parts) and unions
    val uni = CypherLite.run(nodes, edges,
      """MATCH (p:Process)
        |CALL { WITH p MATCH (p)-[:CREATED_FILE]->(f:File) RETURN f
        |UNION MATCH (p)-[:DELETED_FILE]->(f:File) RETURN f }
        |RETURN DISTINCT p, f ORDER BY p, f""".stripMargin)
    val wantU = et("CREATED_FILE").select(col("src").as("p"), col("dst").as("f"))
      .unionByName(et("DELETED_FILE").select(col("src").as("p"), col("dst").as("f")))
      .distinct().orderBy(col("p"), col("f"))
    assert(uni.collect().toSeq.map(_.toSeq) == wantU.collect().toSeq.map(_.toSeq))
    assert(uni.count() > 0)
    // Neo4j's spelling (the importing WITH repeated per part) is an
    // accepted alias
    val uni2 = CypherLite.run(nodes, edges,
      """MATCH (p:Process)
        |CALL { WITH p MATCH (p)-[:CREATED_FILE]->(f:File) RETURN f
        |UNION WITH p MATCH (p)-[:DELETED_FILE]->(f:File) RETURN f }
        |RETURN DISTINCT p, f ORDER BY p, f""".stripMargin)
    assert(uni2.collect().toSeq.map(_.toSeq) == wantU.collect().toSeq.map(_.toSeq))
    // a mismatched per-part WITH list is loud
    intercept[IllegalArgumentException](CypherLite.run(nodes, edges,
      """MATCH (p:Process)-[:INJECTED_THREAD]->(q:Process)
        |CALL { WITH p MATCH (p)-[:CREATED_FILE]->(f:File) RETURN f
        |UNION WITH q MATCH (q)-[:DELETED_FILE]->(f:File) RETURN f }
        |RETURN DISTINCT p, f""".stripMargin))
    // …but an all-aggregate UNION part stays loud (ambiguous per-combo
    // empty-input fill)
    intercept[IllegalArgumentException](CypherLite.run(nodes, edges,
      """MATCH (p:Process)
        |CALL { WITH p MATCH (p)-[:CREATED_FILE]->(f:File) RETURN count(f) AS n
        |UNION MATCH (p)-[:DELETED_FILE]->(f:File) RETURN count(f) AS n }
        |RETURN p, n""".stripMargin))
    // per-combo ORDER BY + LIMIT: the first created file PER PROCESS
    // (a windowed top-k over the import partition, Cypher's per-row
    // semantics)
    val top1 = CypherLite.run(nodes, edges,
      """MATCH (p:Process)
        |CALL { WITH p MATCH (p)-[:CREATED_FILE]->(f:File) RETURN f ORDER BY f LIMIT 1 }
        |RETURN p, f ORDER BY p""".stripMargin)
    val wantTop1 = et("CREATED_FILE")
      .groupBy(col("src").as("p")).agg(min(col("dst")).as("f"))
      .orderBy(col("p"))
    assert(top1.collect().toSeq.map(_.toSeq) ==
      wantTop1.collect().toSeq.map(_.toSeq))
    // SKIP/LIMIT without ORDER BY inside a correlated subquery is a
    // loud error (nondeterministic per-combo top-k)
    intercept[IllegalArgumentException](CypherLite.run(nodes, edges,
      """MATCH (p:Process)
        |CALL { WITH p MATCH (p)-[:CREATED_FILE]->(f:File) RETURN f LIMIT 1 }
        |RETURN p, f""".stripMargin))
    val clash = intercept[IllegalArgumentException](CypherLite.run(nodes, edges,
      """MATCH (p:Process)-[:INJECTED_THREAD]->(q:Process)
        |CALL { WITH q MATCH (q)-[:CONNECTED_TO]->(ip:Ip) RETURN ip AS p }
        |RETURN q, p""".stripMargin))
    assert(clash.getMessage.contains("already declared"))
  }

  test("mid-query CALL review regressions: WITH threading, leak depth, masking, imports unused") {
    val (nodes, edges) = graph
    // a mid-pipeline WITH inside a correlated subquery groups PER
    // COMBO (imports are threaded through the projection) — this is
    // the review finding where `WITH ip, count(...)`-style stages
    // silently aggregated globally
    val got = CypherLite.run(nodes, edges,
      """MATCH (t:Trace)-[:HAS_PROCESS]->(q:Process)
        |CALL { WITH q MATCH (q)-[:CREATED_FILE]->(f:File)
        |WITH q, count(f) AS c RETURN c }
        |RETURN t, q, c ORDER BY t, q""".stripMargin)
    val hp = et("HAS_PROCESS").select(col("src").as("t"), col("dst").as("q"))
    val cnt = et("CREATED_FILE").groupBy(col("src").as("q"))
      .agg(count(lit(1)).as("c"))
    val want = hp.join(cnt, Seq("q")) // non-aggregate final RETURN: inner join
      .select(col("t"), col("q"), col("c")).orderBy(col("t"), col("q"))
    assert(got.collect().toSeq.map(_.toSeq) == want.collect().toSeq.map(_.toSeq))
    assert(got.count() > 0)
    // the same WITHOUT the user spelling q in the WITH (threading
    // injects it): identical result
    val got2 = CypherLite.run(nodes, edges,
      """MATCH (t:Trace)-[:HAS_PROCESS]->(q:Process)
        |CALL { WITH q MATCH (q)-[:CREATED_FILE]->(f:File)
        |WITH count(f) AS c RETURN c }
        |RETURN t, q, c ORDER BY t, q""".stripMargin)
    assert(got2.collect().toSeq.map(_.toSeq) == want.collect().toSeq.map(_.toSeq))
    // leak guard reaches LATER inner stages, not just the head
    val leak = intercept[IllegalArgumentException](CypherLite.run(nodes, edges,
      """MATCH (p:Process)-[:INJECTED_THREAD]->(q:Process)
        |CALL { WITH q MATCH (q)-[:CONNECTED_TO]->(ip:Ip)
        |WITH q, ip MATCH (p)-[:CONNECTED_TO]->(ip) RETURN count(ip) AS c }
        |RETURN p, q, c""".stripMargin))
    assert(leak.getMessage.contains("without importing"))
    // aliasing something else to an import name is rejected
    intercept[IllegalArgumentException](CypherLite.run(nodes, edges,
      """MATCH (p:Process)-[:INJECTED_THREAD]->(q:Process)
        |CALL { WITH q MATCH (q)-[:CONNECTED_TO]->(ip:Ip)
        |WITH ip AS q RETURN count(q) AS c }
        |RETURN p, c""".stripMargin))
    // mid-pipeline LIMIT inside a correlated subquery is a loud error
    // (it would apply globally under set-based execution)
    intercept[IllegalArgumentException](CypherLite.run(nodes, edges,
      """MATCH (p:Process)
        |CALL { WITH p MATCH (p)-[:CREATED_FILE]->(f:File)
        |WITH f ORDER BY f LIMIT 1 RETURN f }
        |RETURN p, f""".stripMargin))
    // UNWIND aliased to an import name would overwrite the correlation
    // key (withColumn replaces) — loud, same as the WITH alias case
    val ur = intercept[IllegalArgumentException](CypherLite.run(nodes, edges,
      """MATCH (p:Process)-[:INJECTED_THREAD]->(q:Process)
        |CALL { WITH q MATCH (q)-[:CONNECTED_TO]->(ip:Ip)
        |WITH q, collect(ip) AS ips UNWIND ips AS q RETURN count(q) AS c }
        |RETURN p, c""".stripMargin))
    assert(ur.getMessage.contains("re-declares imported variable 'q'"))
    // …while an UNWIND to a FRESH name inside a correlated subquery is
    // fine and stays per-combo
    val uok = CypherLite.run(nodes, edges,
      """MATCH (p:Process)-[:INJECTED_THREAD]->(q:Process)
        |CALL { WITH q MATCH (q)-[:CONNECTED_TO]->(ip:Ip)
        |WITH q, collect(ip) AS ips UNWIND ips AS ip2 RETURN count(ip2) AS c }
        |RETURN p, q, c ORDER BY p, q""".stripMargin)
    val uokWant = CypherLite.run(nodes, edges,
      """MATCH (p:Process)-[:INJECTED_THREAD]->(q:Process)
        |CALL { WITH q MATCH (q)-[:CONNECTED_TO]->(ip:Ip) RETURN count(ip) AS c }
        |RETURN p, q, c ORDER BY p, q""".stripMargin)
    assert(uok.collect().toSeq.map(_.toSeq) ==
      uokWant.collect().toSeq.map(_.toSeq))
    assert(uok.count() > 0)
    // modifiers on a NON-FINAL union part of an uncorrelated CALL are
    // loud (Neo4j rejects; only the trailing part's modifiers apply)
    val nf = intercept[IllegalArgumentException](CypherLite.run(nodes, edges,
      """MATCH (t:Trace)
        |CALL { MATCH (p:Process) RETURN p ORDER BY p LIMIT 5
        |UNION MATCH (f:File) RETURN f AS p }
        |RETURN t, p""".stripMargin))
    assert(nf.getMessage.contains("non-final UNION part"))
    // …trailing-part modifiers still apply to the whole union
    val tr = CypherLite.run(nodes, edges,
      """MATCH (t:Trace)
        |CALL { MATCH (p:Process) RETURN p
        |UNION MATCH (f:File) RETURN f AS p ORDER BY p LIMIT 3 }
        |RETURN t, p ORDER BY t, p""".stripMargin)
    val nTr = nodes.filter(col("label") === "Trace").count()
    assert(tr.count() == 3 * nTr)
    // the outer-variable leak guard sees through a DOUBLY-nested CALL:
    // `p` used in the inner-inner MATCH without importing is loud even
    // though the nested parse's own carried set lacks `p`
    val deep = intercept[IllegalArgumentException](CypherLite.run(nodes, edges,
      """MATCH (p:Process)
        |CALL { MATCH (t:Trace)
        |CALL { MATCH (p)-[:CREATED_FILE]->(f:File) RETURN count(f) AS c }
        |RETURN t, c }
        |RETURN p, t, c""".stripMargin))
    assert(deep.getMessage.contains("without importing"))
    // a label/variable named Call with an inline property map is NOT
    // swallowed by the subquery masking
    import spark.implicits._
    val cNodes = Seq(("Call", "c1", Map("k" -> "v")), ("Call", "c2", Map("k" -> "w")))
      .toDF("label", "id", "props")
    val cEdges = Seq.empty[(String, String, String, Int, Map[String, String])]
      .toDF("etype", "src", "dst", "event_id", "props")
    val cr = CypherLite.run(cNodes, cEdges,
      "MATCH (c:Call {k: 'v'}) RETURN c").collect()
    assert(cr.map(_.getString(0)).toSeq == Seq("c1"))
    // imports declared but unused by the first pattern: legal Cypher —
    // the global count pairs with every outer row
    val unused = CypherLite.run(nodes, edges,
      """MATCH (t:Trace)
        |CALL { WITH t MATCH (x:Ip) RETURN count(x) AS nips }
        |RETURN t, nips ORDER BY t""".stripMargin)
    val nIps = nodes.filter(col("label") === "Ip").count()
    val nTrace = nodes.filter(col("label") === "Trace").count()
    assert(unused.count() == nTrace)
    assert(unused.select(col("nips")).distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(nIps))
    // global sum over an empty match is 0 (Cypher), not null
    val zsum = CypherLite.run(nodes, edges,
      "MATCH (z:NoSuchLabel) RETURN sum(toInteger(z.nope)) AS s").collect()
    assert(zsum.length == 1 && zsum(0).getDouble(0) == 0.0)
  }

  test("percentileDisc even-count group: nearest-rank, not interpolation") {
    import spark.implicits._
    // 4 ports {10,20,30,40}: disc(0.5) = ceil(0.5·4) = 2nd value = 20
    // (interpolated cont = 25 — the even-count case where the two differ)
    val nodes = (Seq(("P", "p1", Map.empty[String, String])) ++
      Seq("i1", "i2", "i3", "i4").map(i => ("Ip", i, Map.empty[String, String])))
      .toDF("label", "id", "props")
    val edges = Seq(10, 20, 30, 40).zipWithIndex.map { case (port, i) =>
      ("CONNECTED_TO", "p1", s"i${i + 1}", 3, Map("dport" -> port.toString))
    }.toDF("etype", "src", "dst", "event_id", "props")
    val r = CypherLite.run(nodes, edges,
      "MATCH (p:P)-[r:CONNECTED_TO]->(ip:Ip) " +
        "RETURN p, percentileDisc(toInteger(r.dport), 0.5) AS d, " +
        "percentileCont(toInteger(r.dport), 0.5) AS c").collect()
    assert(r.length == 1)
    assert(r(0).getDouble(1) == 20.0, s"disc: ${r(0).getDouble(1)}")
    assert(r(0).getDouble(2) == 25.0, s"cont: ${r(0).getDouble(2)}")
    // float-overshoot regression (review r9): 0.07·100 is exactly 7
    // but rounds to 7.000000000000001 in doubles — ceil must not slip
    // to rank 8 (values 1..100 → the 7th smallest is 7)
    val n100 = (Seq(("P", "q1", Map.empty[String, String])) ++
      (1 to 100).map(i => ("Ip", s"j$i", Map.empty[String, String])))
      .toDF("label", "id", "props")
    val e100 = (1 to 100).map { i =>
      ("CONNECTED_TO", "q1", s"j$i", 3, Map("dport" -> i.toString))
    }.toDF("etype", "src", "dst", "event_id", "props")
    val r2 = CypherLite.run(n100, e100,
      "MATCH (p:P)-[r:CONNECTED_TO]->(ip:Ip) " +
        "RETURN p, percentileDisc(toInteger(r.dport), 0.07) AS d").collect()
    assert(r2(0).getDouble(1) == 7.0, s"rank-7 overshoot: ${r2(0).getDouble(1)}")
  }

  test("toInteger coercion: max over dport orders numerically, not lexicographically") {
    val (nodes, edges) = graph
    val got = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[r:CONNECTED_TO]->(ip:Ip) " +
        "RETURN p, max(toInteger(r.dport)), max(r.dport) ORDER BY p")
    assert(got.columns.toSeq == Seq("p", "max_r_dport", "max_r_dport"))
    val want = et("CONNECTED_TO")
      .groupBy(col("src"))
      .agg(max(element_at(col("props"), "dport").cast("long")).as("num"),
        max(element_at(col("props"), "dport")).as("str"))
      .orderBy(col("src")).collect()
    val g = got.collect()
    assert(g.length == want.length && g.nonEmpty)
    g.zip(want).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0))
      assert(a.getLong(1) == b.getLong(1))
      assert(a.getString(2) == b.getString(2))
    }
    // the distinction is real on this corpus: some process must have
    // a numeric max that differs from the lexicographic max
    assert(want.exists(r => r.getLong(1).toString != r.getString(2)))
  }

  test("WITH pipeline: aggregate, alias, having-WHERE on the alias") {
    val (nodes, edges) = graph
    val got = CypherLite.run(nodes, edges,
      "MATCH (t:Trace)-[:HAS_PROCESS]->(p:Process) " +
        "WITH t, count(*) AS n WHERE n > 5 " +
        "RETURN t, n ORDER BY n DESC, t")
    assert(got.columns.toSeq == Seq("t", "n"))
    val g = got.collect().map(r => (r.getString(0), r.getLong(1)))
    val want = et("HAS_PROCESS").groupBy(col("src")).count()
      .filter(col("count") > 5)
      .orderBy(col("count").desc, col("src"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(g.sameElements(want) && g.nonEmpty)
  }

  test("WITH pipeline: second MATCH joins new patterns on carried variables") {
    val (nodes, edges) = graph
    // processes beaconing to 2+ distinct IPs, joined back to their traces
    val got = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[:CONNECTED_TO]->(ip:Ip) " +
        "WITH p, count(*) AS n WHERE n >= 2 " +
        "MATCH (t:Trace)-[:HAS_PROCESS]->(p) " +
        "RETURN DISTINCT t, p, n ORDER BY t, p")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val multi = et("CONNECTED_TO").groupBy(col("src").as("p"))
      .agg(count(lit(1)).as("n")).filter(col("n") >= 2)
    val want = et("HAS_PROCESS").select(col("src").as("t"), col("dst").as("p"))
      .join(multi, Seq("p"))
      .select(col("t"), col("p"), col("n")).distinct()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("two chained WITH stages: re-aggregate the aggregate") {
    val (nodes, edges) = graph
    // per-trace process counts → distribution of those counts
    val got = CypherLite.run(nodes, edges,
      "MATCH (t:Trace)-[:HAS_PROCESS]->(p:Process) " +
        "WITH t, count(*) AS n " +
        "WITH n, count(*) AS n_traces " +
        "RETURN n, n_traces ORDER BY n")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = et("HAS_PROCESS").groupBy(col("src")).count()
      .groupBy(col("count").as("n")).agg(count(lit(1)).as("n_traces"))
      .orderBy(col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.sameElements(want) && got.nonEmpty)
  }

  test("shortestPath through the text surface matches GraphOps.bfsPaths") {
    val (nodes, edges) = graph
    // deterministic source: lexicographically-first trace id
    val t0 = nodes.filter(col("label") === "Trace")
      .agg(min(col("id"))).collect()(0).getString(0)
    val got = CypherLite.run(nodes, edges,
      s"MATCH p = shortestPath((a:Trace)-[*1..4]->(b)) WHERE a.id = '$t0' " +
        "RETURN b, p, length(p) ORDER BY b")
    assert(got.columns.toSeq == Seq("b", "p", "length_p"))
    val gotRows = got.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    import spark.implicits._
    val want = graft.graph.GraphOps.bfsPaths(
        edges.select(col("src"), col("dst")), Seq(t0).toDF("id"), maxIter = 4)
      .filter(col("dist") >= 1 && col("dist") <= 4)
      .collect().map(r => (r.getString(0), r.getString(2), r.getInt(1).toLong)).toSet
    assert(gotRows == want && gotRows.nonEmpty)
  }

  test("shortestPath with an edge type and a predicate on the reached node") {
    val (nodes, edges) = graph
    val roots = et("SPAWNS").select(col("src")).distinct()
      .join(et("SPAWNS").select(col("dst").as("src")).distinct(), Seq("src"), "left_anti")
    val r0 = roots.agg(min(col("src"))).collect()(0).getString(0)
    val got = CypherLite.run(nodes, edges,
      s"MATCH p = shortestPath((a:Process)-[:SPAWNS*]->(b)) " +
        s"WHERE a.id = '$r0' AND b.id <> '$r0' RETURN b, length(p)")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    import spark.implicits._
    val want = graft.graph.GraphOps.bfsPaths(
        et("SPAWNS").select(col("src"), col("dst")), Seq(r0).toDF("id"), maxIter = 10)
      .filter(col("dist") >= 1)
      .collect().map(r => (r.getString(0), r.getInt(1).toLong)).toSet
    assert(got == want && got.nonEmpty)
  }

  test("allShortestPaths keeps tied paths; pinned and unpinned agree") {
    import spark.implicits._
    // diamond a→{b,c}→d: two tied 2-hop paths
    val nodes = Seq("a", "b", "c", "d")
      .map(i => ("N", i, Map.empty[String, String]))
      .toDF("label", "id", "props")
    val edges = Seq(("E", "a", "b"), ("E", "a", "c"), ("E", "b", "d"), ("E", "c", "d"))
      .map { case (t, s, d) => (t, s, d, 1, Map.empty[String, String]) }
      .toDF("etype", "src", "dst", "event_id", "props")
    val pinned = CypherLite.run(nodes, edges,
      "MATCH p = allShortestPaths((a)-[:E*1..4]->(b)) " +
        "WHERE a.id = 'a' AND b.id = 'd' RETURN p ORDER BY p")
      .collect().map(_.getString(0)).toSeq
    assert(pinned == Seq("a>b>d", "a>c>d"))
    // the single-path form keeps only the greedy minimum
    val single = CypherLite.run(nodes, edges,
      "MATCH p = shortestPath((a)-[:E*1..4]->(b)) " +
        "WHERE a.id = 'a' AND b.id = 'd' RETURN p")
      .collect().map(_.getString(0)).toSeq
    assert(single == Seq("a>b>d"))
    // unpinned multi-root: the (a, d) rows equal the pinned result,
    // and length(p) decomposes like shortestPath's
    val unpinned = CypherLite.run(nodes, edges,
      "MATCH p = allShortestPaths((x:N)-[:E*1..4]->(y)) " +
        "RETURN x, y, p, length(p) AS len ORDER BY x, y, p")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(unpinned.filter(t => t._1 == "a" && t._2 == "d").map(_._3).toSeq == pinned)
    assert(unpinned.filter(t => t._1 == "a" && t._2 == "d").forall(_._4 == 2L))
    // b and c each reach d by one path; nothing is lost or duplicated
    assert(unpinned.count(t => t._2 == "d") == 4)
  }

  test("RETURN expression items: arithmetic with coercion, aliased and ordered") {
    val (nodes, edges) = graph
    val got = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[r:CONNECTED_TO]->(ip:Ip) " +
        "RETURN DISTINCT p, ip, toInteger(r.dport) * 2 + 1 AS odd_port " +
        "ORDER BY odd_port DESC, p, ip LIMIT 10")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    val want = et("CONNECTED_TO")
      .select(col("src").as("p"), col("dst").as("ip"),
        (element_at(col("props"), "dport").cast("long").cast("double") * 2 + 1)
          .as("odd_port"))
      .distinct()
      .orderBy(col("odd_port").desc, col("p"), col("ip")).limit(10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(got.sameElements(want) && got.nonEmpty)
    // expression items without AS are rejected, not silently misnamed
    intercept[IllegalArgumentException] {
      CypherLite.parse("MATCH (a)-[r:X]->(b) RETURN toInteger(r.p) + 1")
    }
  }

  test("exists() pattern predicate compiles to a semi-match") {
    val (nodes, edges) = graph
    val got = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[:CONNECTED_TO]->(ip:Ip) " +
        "WHERE exists((p)-[:INJECTED_THREAD]->()) RETURN DISTINCT p, ip")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val want = et("CONNECTED_TO").select(col("src").as("p"), col("dst").as("ip"))
      .join(et("INJECTED_THREAD").select(col("src").as("p")), Seq("p"), "left_semi")
      .distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("NOT exists() is the anti-join; bare NOT negates any predicate") {
    val (nodes, edges) = graph
    val got = CypherLite.run(nodes, edges,
      "MATCH (a:Process)-[:SPAWNS]->(b:Process) " +
        "WHERE NOT exists((a)-[:CONNECTED_TO]->()) RETURN DISTINCT a")
      .collect().map(_.getString(0)).toSet
    val want = et("SPAWNS").select(col("src").as("a"))
      .join(et("CONNECTED_TO").select(col("src").as("a")), Seq("a"), "left_anti")
      .distinct().collect().map(_.getString(0)).toSet
    assert(got == want && got.nonEmpty)
    // NOT over an ordinary comparison
    val n1 = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[r:CONNECTED_TO]->(ip:Ip) WHERE NOT r.dport = '443' " +
        "RETURN DISTINCT p, ip").count()
    val n2 = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[r:CONNECTED_TO]->(ip:Ip) WHERE r.dport <> '443' " +
        "RETURN DISTINCT p, ip").count()
    assert(n1 == n2 && n1 > 0)
  }

  test("IS NULL through a WITH stage is the Cypher anti-join idiom") {
    val (nodes, edges) = graph
    val got = CypherLite.run(nodes, edges,
      "MATCH (t:Trace)-[:HAS_PROCESS]->(p:Process) " +
        "OPTIONAL MATCH (p)-[:CONNECTED_TO]->(ip:Ip) " +
        "WITH t, p, ip WHERE ip IS NULL RETURN DISTINCT t, p")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val want = et("HAS_PROCESS").select(col("src").as("t"), col("dst").as("p"))
      .join(et("CONNECTED_TO").select(col("src").as("p")), Seq("p"), "left_anti")
      .select(col("t"), col("p")).distinct() // join keys move first — reselect
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("scalar functions: toLower/toUpper in string context, size is numeric") {
    val (nodes, edges) = graph
    val got = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[:CREATED_FILE]->(f:File) " +
        "WHERE toLower(f.id) ENDS WITH '.exe' AND size(p.image) > 20 " +
        "RETURN DISTINCT p, f")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val img = nodes.filter(col("label") === "Process")
      .select(col("id").as("p"), element_at(col("props"), "image").as("img"))
    val want = et("CREATED_FILE").select(col("src").as("p"), col("dst").as("f"))
      .filter(lower(col("f")).endsWith(".exe"))
      .join(img.filter(length(col("img")).cast("double") > 20).select(col("p")), Seq("p"), "left_semi")
      .select(col("p"), col("f")).distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("aggregate over an expression: sum(toInteger(r.dport) * 2)") {
    val (nodes, edges) = graph
    val got = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[r:CONNECTED_TO]->(ip:Ip) " +
        "RETURN p, sum(toInteger(r.dport) * 2) AS s2 ORDER BY p")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    val want = et("CONNECTED_TO")
      .groupBy(col("src"))
      .agg(sum(element_at(col("props"), "dport").cast("long").cast("double") * 2).as("s2"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(got == want && got.nonEmpty)
  }

  test("unpinned shortestPath: all-pairs dists equal an in-memory BFS replay") {
    val (nodes, edges) = graph
    val got = CypherLite.run(nodes, edges,
      "MATCH p = shortestPath((a:Process)-[:SPAWNS*1..5]->(b:Process)) " +
        "RETURN a, b, length(p)")
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    // independent replay: BFS per root over the collected SPAWNS edges
    val adj = et("SPAWNS").select(col("src"), col("dst")).distinct()
      .collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    val procs = nodes.filter(col("label") === "Process")
      .select(col("id")).collect().map(_.getString(0)).toSet
    val want = scala.collection.mutable.Map.empty[(String, String), Long]
    adj.keys.filter(procs).foreach { root =>
      var depth = 0L
      var frontier = Set(root)
      var seen = Set(root)
      while (depth < 5 && frontier.nonEmpty) {
        depth += 1
        val next = frontier.flatMap(v => adj.getOrElse(v, Array.empty[String]))
          .diff(seen)
        next.filter(procs).foreach(b => want((root, b)) = depth)
        seen ++= next
        frontier = next
      }
    }
    assert(got == want.toMap && got.nonEmpty)
    // paths carry dist+1 vertices and the right endpoints
    val pathRows = CypherLite.run(nodes, edges,
      "MATCH p = shortestPath((a:Process)-[:SPAWNS*1..5]->(b:Process)) " +
        "RETURN a, b, p, length(p)").collect()
    pathRows.foreach { r =>
      val hops = r.getString(2).split(">")
      assert(hops.length == r.getLong(3) + 1)
      assert(hops.head == r.getString(0) && hops.last == r.getString(1))
    }
  }

  test("count(DISTINCT ...) equals the countDistinct twin and differs from count") {
    val (nodes, edges) = graph
    // two-hop pattern so a trace sees the same ip through several
    // processes — plain count would multiply, DISTINCT must not
    val got = CypherLite.run(nodes, edges,
      "MATCH (t:Trace)-[:HAS_PROCESS]->(p:Process)-[:CONNECTED_TO]->(ip:Ip) " +
        "RETURN t, count(DISTINCT ip) AS n_ips, count(ip) AS n_rows ORDER BY t")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = et("HAS_PROCESS").select(col("src").as("t"), col("dst").as("p"))
      .join(et("CONNECTED_TO").select(col("src").as("p"), col("dst").as("ip")), Seq("p"))
      .groupBy(col("t"))
      .agg(countDistinct(col("ip")).as("n_ips"), count(col("ip")).as("n_rows"))
      .orderBy(col("t"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.sameElements(want) && got.nonEmpty)
    // non-vacuous: at least one trace reaches an ip via >1 process
    assert(got.exists { case (_, d, c) => d < c },
      "fixture never exercises the DISTINCT path")
  }

  test("collect(DISTINCT ...) deduplicates before collecting") {
    val (nodes, edges) = graph
    val got = CypherLite.run(nodes, edges,
      "MATCH (t:Trace)-[:HAS_PROCESS]->(p:Process)-[:CONNECTED_TO]->(ip:Ip) " +
        "RETURN t, collect(DISTINCT ip) AS ips ORDER BY t")
      .collect().map(r => (r.getString(0), r.getSeq[String](1)))
    val want = et("HAS_PROCESS").select(col("src").as("t"), col("dst").as("p"))
      .join(et("CONNECTED_TO").select(col("src").as("p"), col("dst").as("ip")), Seq("p"))
      .groupBy(col("t")).agg(array_sort(collect_set(col("ip"))).as("ips"))
      .orderBy(col("t"))
      .collect().map(r => (r.getString(0), r.getSeq[String](1)))
    assert(got.length == want.length && got.nonEmpty)
    got.zip(want).foreach { case ((gt, gl), (wt, wl)) =>
      assert(gt == wt && gl == wl)
    }
  }

  test("collect → UNWIND round-trips the pair set (the Cypher idiom)") {
    val (nodes, edges) = graph
    val got = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[:CONNECTED_TO]->(ip:Ip) " +
        "WITH p, collect(ip) AS ips UNWIND ips AS addr RETURN p, addr")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val want = et("CONNECTED_TO").select(col("src"), col("dst")).distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("UNWIND of a literal list fans each row out; source stays in scope") {
    val (nodes, edges) = graph
    val nTraces = nodes.filter(col("label") === "Trace").count()
    val got = CypherLite.run(nodes, edges,
      "MATCH (t:Trace) UNWIND [1, 2, 3] AS x RETURN t, x")
    assert(got.columns.toSeq == Seq("t", "x"))
    assert(got.count() == nTraces * 3)
    val xs = got.select(col("x")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(xs == Set(1L, 2L, 3L))
    // aggregating after UNWIND sees the fan-out
    val agg = CypherLite.run(nodes, edges,
      "MATCH (t:Trace) UNWIND ['a', 'b'] AS tag RETURN tag, count(*) ORDER BY tag")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(agg.toSeq == Seq(("a", nTraces), ("b", nTraces)))
  }

  test("nodes(p)/relationships(p) decompose shortestPath results") {
    val (nodes, edges) = graph
    val roots = et("SPAWNS").select(col("src")).distinct()
      .join(et("SPAWNS").select(col("dst").as("src")).distinct(), Seq("src"), "left_anti")
    val r0 = roots.agg(min(col("src"))).collect()(0).getString(0)
    val got = CypherLite.run(nodes, edges,
      s"MATCH p = shortestPath((a:Process)-[:SPAWNS*]->(b)) WHERE a.id = '$r0' " +
        "RETURN b, p, length(p), nodes(p) AS ns, relationships(p) AS rs")
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val path = r.getString(1)
      val len = r.getLong(2)
      val ns = r.getSeq[String](3)
      val rs = r.getSeq[String](4)
      // nodes(p) is exactly the '>'-split path: len+1 entries, right ends
      assert(ns == path.split(">").toSeq)
      assert(ns.length == len + 1 && ns.head == r0 && ns.last == r.getString(0))
      // relationships(p): one typed step string per hop, consistent with
      // consecutive node pairs
      assert(rs.length == len)
      rs.zipWithIndex.foreach { case (step, i) =>
        assert(step == s"${ns(i)}-[SPAWNS]->${ns(i + 1)}")
      }
    }
    // cross-check endpoints against GraphOps.bfsPaths directly
    import spark.implicits._
    val want = graft.graph.GraphOps.bfsPaths(
        et("SPAWNS").select(col("src"), col("dst")), Seq(r0).toDF("id"), maxIter = 10)
      .filter(col("dist") >= 1)
      .collect().map(r => (r.getString(0), r.getString(2))).toSet
    assert(got.map(r => (r.getString(0), r.getString(1))).toSet == want)
  }

  test("size(list) after collect: the collect→size filter idiom") {
    val (nodes, edges) = graph
    val got = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[:CONNECTED_TO]->(ip:Ip) " +
        "WITH p, collect(ip) AS ips WHERE size(ips) >= 2 RETURN p, size(ips) AS n ORDER BY p")
      .collect().map(r => (r.getString(0), r.getInt(1)))
    val want = et("CONNECTED_TO").groupBy(col("src"))
      .agg(count(lit(1)).cast("int").as("n")).filter(col("n") >= 2)
      .orderBy(col("src"))
      .collect().map(r => (r.getString(0), r.getInt(1)))
    assert(got.sameElements(want) && got.nonEmpty)
  }

  test("labels/keys/properties accessors and coalesce over props") {
    val (nodes, edges) = graph
    // labels(): every matched f is a File
    val ls = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[:CREATED_FILE]->(f) RETURN DISTINCT f, labels(f) AS ls LIMIT 20")
      .collect()
    assert(ls.nonEmpty && ls.forall(_.getSeq[String](1) == Seq("File")))
    // keys()/properties(): sorted prop names match the nodes frame
    val ks = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[:CONNECTED_TO]->(ip:Ip) RETURN DISTINCT p, keys(p) AS ks LIMIT 10")
      .collect()
    val propKeys = nodes.filter(col("label") === "Process")
      .select(col("id"), map_keys(col("props")).as("mk"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).sorted).toMap
    ks.foreach(r => assert(r.getSeq[String](1) == propKeys(r.getString(0))))
    // coalesce: image falls back to a default, never null in output
    val co = CypherLite.run(nodes, edges,
      "MATCH (t:Trace)-[:HAS_PROCESS]->(p:Process) " +
        "RETURN DISTINCT p, coalesce(p.image, 'unknown') AS img")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(co.nonEmpty && co.forall(_._2 != null))
    val noImage = nodes.filter(col("label") === "Process" &&
      !map_contains_key(col("props"), "image")).count()
    if (noImage > 0) assert(co.exists(_._2 == "unknown"))
  }

  test("IN literal list (string and numeric) equals isin twins") {
    val (nodes, edges) = graph
    // string list over a raw prop
    val got = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[r:CONNECTED_TO]->(ip:Ip) " +
        "WHERE r.dport IN ['443', '8080', '4444'] RETURN DISTINCT p, ip")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val want = et("CONNECTED_TO")
      .filter(element_at(col("props"), "dport").isin("443", "8080", "4444"))
      .select(col("src"), col("dst")).distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == want && got.nonEmpty)
    // numeric list switches the comparison to double
    val gotN = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[r:CONNECTED_TO]->(ip:Ip) " +
        "WHERE toInteger(r.dport) IN [443, 8080, 4444] RETURN DISTINCT p, ip")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val wantN = et("CONNECTED_TO")
      .filter(element_at(col("props"), "dport").cast("double").isin(443.0, 8080.0, 4444.0))
      .select(col("src"), col("dst")).distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(gotN == wantN && gotN.nonEmpty)
  }

  test("IN over a carried collect list (array_contains) and NOT IN") {
    val (nodes, edges) = graph
    // pick a real ip so membership is non-vacuous both ways
    val someIp = et("CONNECTED_TO").agg(min(col("dst"))).collect()(0).getString(0)
    val got = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[:CONNECTED_TO]->(ip:Ip) " +
        s"WITH p, collect(ip) AS ips WHERE '$someIp' IN ips RETURN p ORDER BY p")
      .collect().map(_.getString(0))
    val want = et("CONNECTED_TO").filter(col("dst") === someIp)
      .select(col("src")).distinct().orderBy(col("src"))
      .collect().map(_.getString(0))
    assert(got.sameElements(want) && got.nonEmpty)
    val gotNot = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[:CONNECTED_TO]->(ip:Ip) " +
        s"WITH p, collect(ip) AS ips WHERE NOT '$someIp' IN ips RETURN p ORDER BY p")
      .collect().map(_.getString(0))
    val all = et("CONNECTED_TO").select(col("src")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(gotNot.toSet == all -- want.toSet)
  }

  test("=~ regex matches the WHOLE string (Cypher anchoring)") {
    val (nodes, edges) = graph
    val got = CypherLite.run(nodes, edges,
      "MATCH (t:Trace)-[:HAS_PROCESS]->(p:Process) " +
        "WHERE p.image =~ '.*\\.exe' RETURN DISTINCT p")
      .collect().map(_.getString(0)).toSet
    val want = nodes.filter(col("label") === "Process" &&
        element_at(col("props"), "image").rlike("^(?:.*\\.exe)$"))
      .join(et("HAS_PROCESS").select(col("dst").as("id")).distinct(), Seq("id"), "left_semi")
      .select(col("id"))
      .collect().map(_.getString(0)).toSet
    assert(got == want && got.nonEmpty)
    // anchoring: a bare substring pattern behaves as EQUALITY (whole-
    // string match), not contains — twin is the literal-equality filter
    val anchored = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[:CONNECTED_TO]->(ip:Ip) WHERE p.image =~ 'exe' RETURN DISTINCT p")
      .collect().map(_.getString(0)).toSet
    val anchoredWant = nodes.filter(col("label") === "Process" &&
        element_at(col("props"), "image") === "exe")
      .join(et("CONNECTED_TO").select(col("src").as("id")).distinct(), Seq("id"), "left_semi")
      .select(col("id")).collect().map(_.getString(0)).toSet
    assert(anchored == anchoredWant)
    // and the contains-style pattern with explicit wildcards is wider
    assert(got.size > anchored.size)
  }

  test("type(r) on an untyped hop groups by the real edge type") {
    val (nodes, edges) = graph
    val got = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[r]->(x) RETURN type(r) AS t, count(*) AS n ORDER BY t")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // twin: edges whose src is a Process node, counted per etype
    val procs = nodes.filter(col("label") === "Process").select(col("id").as("src"))
    val want = edges.join(procs, Seq("src"), "left_semi")
      .groupBy(col("etype")).agg(count(lit(1)).as("n")).orderBy(col("etype"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.sameElements(want) && got.nonEmpty)
    // id(v) is the node key itself
    val ids = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[:CONNECTED_TO]->(ip:Ip) RETURN DISTINCT p, id(p) AS pid LIMIT 10")
      .collect()
    assert(ids.nonEmpty && ids.forall(r => r.getString(1) == r.getString(0)))
  }

  test("searched CASE equals the when/otherwise twin") {
    val (nodes, edges) = graph
    val got = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[r:CONNECTED_TO]->(ip:Ip) " +
        "RETURN DISTINCT p, ip, CASE WHEN toInteger(r.dport) >= 1024 THEN 'high' " +
        "WHEN toInteger(r.dport) >= 0 THEN 'low' ELSE 'unknown' END AS band")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val dport = element_at(col("props"), "dport").cast("double")
    val want = et("CONNECTED_TO")
      .select(col("src"), col("dst"),
        when(dport >= 1024, "high").when(dport >= 0, "low").otherwise("unknown").as("band"))
      .distinct()
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == want && got.nonEmpty)
    // missing dport → null comparisons are false → ELSE branch
    assert(got.map(_._3).subsetOf(Set("high", "low", "unknown")))
  }

  test("SKIP pages through an ordered result (SKIP n LIMIT m = slice)") {
    val (nodes, edges) = graph
    val all = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[:CONNECTED_TO]->(ip:Ip) RETURN DISTINCT p, ip ORDER BY p, ip")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val page = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[:CONNECTED_TO]->(ip:Ip) " +
        "RETURN DISTINCT p, ip ORDER BY p, ip SKIP 2 LIMIT 3")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(all.length > 5 && page.sameElements(all.slice(2, 5)))
  }

  test("temporal functions: date/datetime/timestamp/duration on a synthetic graph") {
    import spark.implicits._
    val nodes = Seq(
      ("Event", "e1", Map("ts" -> "2024-05-01 10:00:00")),
      ("Event", "e2", Map("ts" -> "2024-05-01 10:03:00")),
      ("Event", "e3", Map("ts" -> "2024-05-02 09:00:00")),
      ("Event", "e4", Map.empty[String, String])) // no ts → null, filtered
      .toDF("label", "id", "props")
    val edges = Seq(("NEXT", "e1", "e2", 1, Map.empty[String, String]),
      ("NEXT", "e2", "e3", 1, Map.empty[String, String]))
      .toDF("etype", "src", "dst", "event_id", "props")
    // date() comparison against a date string literal
    val d = CypherLite.run(nodes, edges,
      "MATCH (a:Event) WHERE date(a.ts) = '2024-05-01' RETURN a ORDER BY a")
      .collect().map(_.getString(0))
    assert(d.sameElements(Array("e1", "e2")))
    // datetime() orders within a day
    val dt = CypherLite.run(nodes, edges,
      "MATCH (a:Event) WHERE datetime(a.ts) > '2024-05-01 10:01:00' RETURN a ORDER BY a")
      .collect().map(_.getString(0))
    assert(dt.sameElements(Array("e2", "e3")))
    // timestamp() arithmetic vs a duration literal: NEXT hops under 5 minutes
    val fast = CypherLite.run(nodes, edges,
      "MATCH (a:Event)-[:NEXT]->(b:Event) " +
        "WHERE timestamp(b.ts) - timestamp(a.ts) < duration('PT5M') RETURN a, b")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(fast.sameElements(Array(("e1", "e2")))) // e2→e3 is ~23h
  }

  test("UNWIND range(a, b) is inclusive; size(range) counts elements") {
    val (nodes, edges) = graph
    val nTraces = nodes.filter(col("label") === "Trace").count()
    val got = CypherLite.run(nodes, edges,
      "MATCH (t:Trace) UNWIND range(2, 5) AS i RETURN i, count(*) ORDER BY i")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq(2L, 3L, 4L, 5L).map(i => (i, nTraces)))
    // size() over a range term
    val sz = CypherLite.run(nodes, edges,
      "MATCH (t:Trace) RETURN DISTINCT size(range(1, 10)) AS n")
      .collect().map(_.getInt(0))
    assert(sz.toSeq == Seq(10))
    // head()/last() on lists (range term and a carried collect alias)
    val hl = CypherLite.run(nodes, edges,
      "MATCH (t:Trace) RETURN DISTINCT head(range(3, 7)) AS h, last(range(3, 7)) AS l")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(hl.toSeq == Seq((3L, 7L)))
    val hc = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[:CONNECTED_TO]->(ip:Ip) " +
        "WITH p, collect(ip) AS ips RETURN p, head(ips) AS first_ip ORDER BY p")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val wantHc = et("CONNECTED_TO").groupBy(col("src"))
      .agg(array_sort(collect_list(col("dst"))).as("ips"))
      .select(col("src"), element_at(col("ips"), 1))
      .orderBy(col("src"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(hc.sameElements(wantHc) && hc.nonEmpty)
  }

  test("WITH DISTINCT deduplicates the projection mid-pipeline") {
    val (nodes, edges) = graph
    // processes with ≥1 connection, deduped BEFORE re-expansion: each
    // process contributes exactly one row per trace it belongs to
    val got = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[:CONNECTED_TO]->(ip:Ip) " +
        "WITH DISTINCT p MATCH (t:Trace)-[:HAS_PROCESS]->(p) " +
        "RETURN t, p ORDER BY t, p")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val connected = et("CONNECTED_TO").select(col("src").as("p")).distinct()
    val want = et("HAS_PROCESS").select(col("src").as("t"), col("dst").as("p"))
      .join(connected, Seq("p"))
      .select(col("t"), col("p")).orderBy(col("t"), col("p"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.sameElements(want) && got.nonEmpty)
    // and WITHOUT the dedup the fan-out multiplies rows (sanity: the
    // DISTINCT actually did something on this corpus)
    val dup = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[:CONNECTED_TO]->(ip:Ip) " +
        "WITH p MATCH (t:Trace)-[:HAS_PROCESS]->(p) RETURN t, p")
      .count()
    assert(dup >= got.length)
  }

  test("string kit: split/replace/substring/trim/toString vs function twins") {
    val (nodes, edges) = graph
    // split on a literal dot (regex metachar — must be quoted), sized
    val got = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[:CONNECTED_TO]->(ip:Ip) WHERE p.image IS NOT NULL " +
        "RETURN DISTINCT p, size(split(p.image, '.')) AS parts, " +
        "replace(p.image, '.exe', '') AS stem, " +
        "substring(p.image, 0, 3) AS pre ORDER BY p")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getString(3)))
    val img = element_at(col("props"), "image")
    val want = nodes.filter(col("label") === "Process" && img.isNotNull)
      .join(et("CONNECTED_TO").select(col("src").as("id")).distinct(), Seq("id"), "left_semi")
      .select(col("id"),
        size(split(img, "\\.")).as("parts"),
        regexp_replace(img, "\\.exe", "").as("stem"),
        img.substr(1, 3).as("pre"))
      .orderBy(col("id"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getString(3)))
    assert(got.sameElements(want) && got.nonEmpty)
    // toString round-trips a numeric coercion back to the stored string
    val ts = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[r:CONNECTED_TO]->(ip:Ip) " +
        "WHERE toString(toInteger(r.dport)) = r.dport RETURN DISTINCT p, ip")
      .count()
    val tsAll = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[r:CONNECTED_TO]->(ip:Ip) " +
        "WHERE r.dport IS NOT NULL RETURN DISTINCT p, ip").count()
    assert(ts == tsAll && ts > 0) // every stored dport is a canonical integer string
  }

  test("math kit: % modulo, abs/floor/round vs column twins") {
    val (nodes, edges) = graph
    val got = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[r:CONNECTED_TO]->(ip:Ip) " +
        "WHERE toInteger(r.dport) % 2 = 0 RETURN DISTINCT p, ip")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val dport = element_at(col("props"), "dport").cast("double")
    val want = et("CONNECTED_TO").filter(dport % 2 === 0)
      .select(col("src"), col("dst")).distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == want && got.nonEmpty)
    val m = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[r:CONNECTED_TO]->(ip:Ip) " +
        "RETURN DISTINCT p, ip, abs(toInteger(r.dport) - 50000) AS d, " +
        "floor(toInteger(r.dport) / 1000) AS kp ORDER BY p, ip")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    val wantM = et("CONNECTED_TO")
      .select(col("src"), col("dst"),
        abs(dport.cast("long") - 50000).cast("double").as("d"),
        floor(dport.cast("long") / 1000.0).as("kp"))
      .distinct().orderBy(col("src"), col("dst"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    assert(m.sameElements(wantM) && m.nonEmpty)
  }

  test("quantified list predicates any/all/none/single vs exists/forall twins") {
    val (nodes, edges) = graph
    def run(q: String): Set[String] =
      CypherLite.run(nodes, edges,
        "MATCH (p:Process)-[r:CONNECTED_TO]->(ip:Ip) " +
          s"WITH p, collect(toInteger(r.dport)) AS ports WHERE $q RETURN p")
        .collect().map(_.getString(0)).toSet
    val ports = et("CONNECTED_TO")
      .groupBy(col("src").as("p"))
      .agg(array_sort(collect_list(element_at(col("props"), "dport").cast("long"))).as("ports"))
    def twin(c: Column): Set[String] =
      ports.filter(c).select(col("p")).collect().map(_.getString(0)).toSet
    val lam = (x: Column) => x.cast("double") > 1024
    assert(run("any(x IN ports WHERE x > 1024)") == twin(exists(col("ports"), lam)))
    assert(run("all(x IN ports WHERE x > 1024)") == twin(forall(col("ports"), lam)))
    assert(run("none(x IN ports WHERE x > 1024)") == twin(!exists(col("ports"), lam)))
    assert(run("single(x IN ports WHERE x > 1024)") ==
      twin(size(filter(col("ports"), lam)) === 1))
    // the four partitions are consistent: any = not none; and at least
    // one quantifier matched something on this corpus
    assert(run("any(x IN ports WHERE x > 1024)").nonEmpty)
    assert(run("any(x IN ports WHERE x > 1024)")
      .intersect(run("none(x IN ports WHERE x > 1024)")).isEmpty)
  }

  test("list comprehensions filter/transform with outer-column capture") {
    val (nodes, edges) = graph
    // filter + project over a collected list, capturing nothing
    val got = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[r:CONNECTED_TO]->(ip:Ip) " +
        "WITH p, collect(toInteger(r.dport)) AS ports " +
        "RETURN p, [x IN ports WHERE x > 1024 | x * 2] AS high2 ORDER BY p")
      .collect().map(r => (r.getString(0), r.getSeq[Double](1)))
    val want = et("CONNECTED_TO")
      .groupBy(col("src").as("p"))
      .agg(array_sort(collect_list(element_at(col("props"), "dport").cast("long"))).as("ports"))
      .select(col("p"),
        transform(filter(col("ports"), x => x.cast("double") > 1024),
          x => x.cast("double") * 2).as("high2"))
      .orderBy(col("p"))
      .collect().map(r => (r.getString(0), r.getSeq[Double](1)))
    assert(got.length == want.length && got.nonEmpty)
    got.zip(want).foreach { case (g, w) => assert(g == w) }
    // outer-column capture: keep ports equal to the row's own min port
    val cap = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[r:CONNECTED_TO]->(ip:Ip) " +
        "WITH p, collect(toInteger(r.dport)) AS ports, min(toInteger(r.dport)) AS lo " +
        "RETURN p, size([x IN ports WHERE x = lo]) AS nlo ORDER BY p")
      .collect().map(r => (r.getString(0), r.getInt(1)))
    assert(cap.nonEmpty && cap.forall(_._2 >= 1))
    // identity comprehension == the source list
    val idc = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[r:CONNECTED_TO]->(ip:Ip) " +
        "WITH p, collect(ip) AS ips RETURN p, [x IN ips] AS same, ips ORDER BY p")
      .collect()
    assert(idc.nonEmpty && idc.forall(r => r.getSeq[String](1) == r.getSeq[String](2)))
  }

  test("reduce() folds a list; nests with comprehensions") {
    val (nodes, edges) = graph
    // sum of ports via reduce == sum aggregate
    val got = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[r:CONNECTED_TO]->(ip:Ip) " +
        "WITH p, collect(toInteger(r.dport)) AS ports " +
        "RETURN p, reduce(acc = 0, x IN ports | acc + x) AS total ORDER BY p")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val want = et("CONNECTED_TO")
      .groupBy(col("src").as("p"))
      .agg(sum(element_at(col("props"), "dport").cast("long")).cast("double").as("total"))
      .orderBy(col("p"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(got.sameElements(want) && got.nonEmpty)
    // reduce over a FILTERED comprehension (nesting): sum of high ports
    val nested = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[r:CONNECTED_TO]->(ip:Ip) " +
        "WITH p, collect(toInteger(r.dport)) AS ports " +
        "RETURN p, reduce(acc = 0, x IN [y IN ports WHERE y > 1024] | acc + x) AS hi " +
        "ORDER BY p")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val wantN = et("CONNECTED_TO")
      .groupBy(col("src").as("p"))
      .agg(aggregate(
        filter(collect_list(element_at(col("props"), "dport").cast("long")),
          y => y.cast("double") > 1024),
        lit(0.0), (acc, x) => acc + x.cast("double")).as("hi"))
      .orderBy(col("p"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(nested.sameElements(wantN) && nested.nonEmpty)
  }

  test("startNode/endNode resolve in graph direction on forward and reverse hops") {
    val (nodes, edges) = graph
    val fwd = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[r:CONNECTED_TO]->(ip:Ip) " +
        "RETURN DISTINCT p, ip, startNode(r) AS s, endNode(r) AS e LIMIT 20")
      .collect()
    assert(fwd.nonEmpty && fwd.forall(r =>
      r.getString(2) == r.getString(0) && r.getString(3) == r.getString(1)))
    // reverse hop: the pattern walks ip←p but the EDGE still goes p→ip
    val rev = CypherLite.run(nodes, edges,
      "MATCH (ip:Ip)<-[r:CONNECTED_TO]-(p:Process) " +
        "RETURN DISTINCT ip, p, startNode(r) AS s, endNode(r) AS e LIMIT 20")
      .collect()
    assert(rev.nonEmpty && rev.forall(r =>
      r.getString(2) == r.getString(1) && r.getString(3) == r.getString(0)))
  }

  test("size(<pattern>) counts anchored matches: inline degree idiom") {
    val (nodes, edges) = graph
    // RETURN position: out-degree per process, 0 when no beacons
    val got = CypherLite.run(nodes, edges,
      "MATCH (t:Trace)-[:HAS_PROCESS]->(p:Process) " +
        "RETURN DISTINCT p, size((p)-[:CONNECTED_TO]->()) AS deg ORDER BY p")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val degrees = et("CONNECTED_TO").groupBy(col("src").as("p"))
      .agg(count(lit(1)).as("deg"))
    val want = et("HAS_PROCESS").select(col("dst").as("p")).distinct()
      .join(degrees, Seq("p"), "left")
      .select(col("p"), coalesce(col("deg"), lit(0L)).as("deg"))
      .orderBy(col("p"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.sameElements(want) && got.nonEmpty && got.exists(_._2 == 0L))
    // WHERE position with a comparison (numeric term)
    val multi = CypherLite.run(nodes, edges,
      "MATCH (t:Trace)-[:HAS_PROCESS]->(p:Process) " +
        "WHERE size((p)-[:CONNECTED_TO]->()) >= 2 RETURN DISTINCT p")
      .collect().map(_.getString(0)).toSet
    val wantMulti = degrees.filter(col("deg") >= 2).select(col("p"))
      .join(et("HAS_PROCESS").select(col("dst").as("p")).distinct(), Seq("p"), "left_semi")
      .collect().map(_.getString(0)).toSet
    assert(multi == wantMulti && multi.nonEmpty)
    // longer chain: two-hop pattern counts all bindings
    val two = CypherLite.run(nodes, edges,
      "MATCH (t:Trace) RETURN t, size((t)-[:HAS_PROCESS]->()-[:CONNECTED_TO]->()) AS n ORDER BY t")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val wantTwo = nodes.filter(col("label") === "Trace").select(col("id").as("t"))
      .join(et("HAS_PROCESS").select(col("src").as("t"), col("dst").as("p"))
          .join(et("CONNECTED_TO").select(col("src").as("p")), Seq("p"))
          .groupBy(col("t")).agg(count(lit(1)).as("n")),
        Seq("t"), "left")
      .select(col("t"), coalesce(col("n"), lit(0L)).as("n"))
      .orderBy(col("t"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(two.sameElements(wantTwo) && two.exists(_._2 > 0L))
  }

  test("WITH ... ORDER BY ... LIMIT: top-k mid-pipeline, then continue") {
    val (nodes, edges) = graph
    val got = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[:CONNECTED_TO]->(ip:Ip) " +
        "WITH p, count(*) AS n ORDER BY n DESC, p LIMIT 3 " +
        "MATCH (t:Trace)-[:HAS_PROCESS]->(p) " +
        "RETURN t, p, n ORDER BY p, t")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val top3 = et("CONNECTED_TO").groupBy(col("src").as("p"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("p")).limit(3)
    val want = et("HAS_PROCESS").select(col("src").as("t"), col("dst").as("p"))
      .join(top3, Seq("p"))
      .select(col("t"), col("p"), col("n")).orderBy(col("p"), col("t"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.sameElements(want) && got.nonEmpty)
    // SKIP pages the intermediate too
    val paged = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[:CONNECTED_TO]->(ip:Ip) " +
        "WITH p, count(*) AS n ORDER BY n DESC, p SKIP 1 LIMIT 2 RETURN p, n ORDER BY p")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val wantPaged = et("CONNECTED_TO").groupBy(col("src").as("p"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("p")).offset(1).limit(2)
      .orderBy(col("p"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(paged.sameElements(wantPaged) && paged.length == 2)
  }

  test("Cypher 5 COUNT {} / EXISTS {} subqueries equal their classic spellings") {
    val (nodes, edges) = graph
    val braceCount = CypherLite.run(nodes, edges,
      "MATCH (t:Trace)-[:HAS_PROCESS]->(p:Process) " +
        "RETURN DISTINCT p, COUNT { (p)-[:CONNECTED_TO]->() } AS deg ORDER BY p")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val parenSize = CypherLite.run(nodes, edges,
      "MATCH (t:Trace)-[:HAS_PROCESS]->(p:Process) " +
        "RETURN DISTINCT p, size((p)-[:CONNECTED_TO]->()) AS deg ORDER BY p")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(braceCount.sameElements(parenSize) && braceCount.nonEmpty)
    val braceExists = CypherLite.run(nodes, edges,
      "MATCH (t:Trace)-[:HAS_PROCESS]->(p:Process) " +
        "WHERE EXISTS { (p)-[:SPAWNS]->() } AND NOT EXISTS { (p)-[:CONNECTED_TO]->() } " +
        "RETURN DISTINCT t, p ORDER BY t, p")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val parenExists = CypherLite.run(nodes, edges,
      "MATCH (t:Trace)-[:HAS_PROCESS]->(p:Process) " +
        "WHERE exists((p)-[:SPAWNS]->()) AND NOT exists((p)-[:CONNECTED_TO]->()) " +
        "RETURN DISTINCT t, p ORDER BY t, p")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(braceExists.sameElements(parenExists) && braceExists.nonEmpty)
  }

  test("repeated variable within a pattern binds as an equality join (cycles)") {
    val (nodes, edges) = graph
    // any 2-cycle over arbitrary edge types: (a)-[]->(x)-[]->(a)
    val got = CypherLite.run(nodes, edges,
      "MATCH (a)-[]->(x)-[]->(a) RETURN DISTINCT a, x")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val e = graph._2.select(col("src"), col("dst")).distinct()
    val want = e.alias("e1").join(e.alias("e2"),
        col("e1.dst") === col("e2.src") && col("e2.dst") === col("e1.src"))
      .select(col("e1.src"), col("e1.dst"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == want) // may be empty on this corpus — equality of SETS is the check
  }

  test("EXISTS { MATCH … WHERE … } filters the witnessing matches (edge-property condition)") {
    val (nodes, edges) = graph
    val got = CypherLite.run(nodes, edges,
      "MATCH (p:Process) " +
        "WHERE EXISTS { MATCH (p)-[r:CONNECTED_TO]->(i) WHERE r.dport = '443' } " +
        "RETURN DISTINCT p ORDER BY p")
      .collect().map(_.getString(0)).toSeq
    val want = et("CONNECTED_TO")
      .filter(element_at(col("props"), "dport") === "443")
      .select(col("src").as("p")).distinct()
      .join(graph._1.filter(col("label") === "Process").select(col("id").as("p")), Seq("p"), "left_semi")
      .orderBy(col("p")).collect().map(_.getString(0)).toSeq
    assert(got == want && got.nonEmpty)
    // the unfiltered spelling must be a SUPERSET (the inner WHERE bites)
    val all443orNot = CypherLite.run(nodes, edges,
      "MATCH (p:Process) WHERE EXISTS { (p)-[:CONNECTED_TO]->(i) } " +
        "RETURN DISTINCT p ORDER BY p")
      .collect().map(_.getString(0)).toSet
    assert(got.toSet.subsetOf(all443orNot) && got.size < all443orNot.size)
  }

  test("COUNT { MATCH … WHERE … } counts only the filtered matches") {
    val (nodes, edges) = graph
    val got = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[:CONNECTED_TO]->() " +
        "RETURN DISTINCT p, COUNT { MATCH (p)-[r:CONNECTED_TO]->(i) WHERE r.dport = '443' } AS n ORDER BY p")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val cnt443 = et("CONNECTED_TO")
      .filter(element_at(col("props"), "dport") === "443")
      .groupBy(col("src").as("p")).count()
    val want = et("CONNECTED_TO").select(col("src").as("p")).distinct()
      .join(cnt443, Seq("p"), "left")
      .select(col("p"), coalesce(col("count"), lit(0L)))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == want && got.nonEmpty && got.values.exists(_ == 0L) && got.values.exists(_ > 0L))
  }

  test("UNION deduplicates, UNION ALL keeps multiplicity; trailing ORDER BY orders the union") {
    val (nodes, edges) = graph
    val union = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[:CREATED_FILE]->(f:File) RETURN DISTINCT p " +
        "UNION MATCH (p:Process)-[:SPAWNS]->(c:Process) RETURN DISTINCT p ORDER BY p")
      .collect().map(_.getString(0)).toSeq
    val want = et("CREATED_FILE").select(col("src").as("p"))
      .unionByName(et("SPAWNS").select(col("src").as("p")))
      .distinct().orderBy(col("p"))
      .collect().map(_.getString(0)).toSeq
    assert(union == want && union.nonEmpty) // ordered-seq equality: ORDER BY spans the union
    val a = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[:CREATED_FILE]->(f:File) RETURN DISTINCT p").count()
    val b = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[:SPAWNS]->(c:Process) RETURN DISTINCT p").count()
    val all = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[:CREATED_FILE]->(f:File) RETURN DISTINCT p " +
        "UNION ALL MATCH (p:Process)-[:SPAWNS]->(c:Process) RETURN DISTINCT p").count()
    assert(all == a + b && union.size < all)
    intercept[IllegalArgumentException] {
      CypherLite.run(nodes, edges,
        "MATCH (p:Process) RETURN p UNION MATCH (q:Process) RETURN q")
        .collect()
    }
    intercept[IllegalArgumentException] {
      CypherLite.run(nodes, edges,
        "MATCH (p:Process) RETURN p UNION MATCH (p:Process) RETURN p " +
          "UNION ALL MATCH (p:Process) RETURN p").collect()
    }
  }

  test("Cypher-5 WITH clause order: WHERE after ORDER BY/SKIP/LIMIT filters after the top-k") {
    val (nodes, edges) = graph
    val got = CypherLite.run(nodes, edges,
      "MATCH (t:Trace)-[:HAS_PROCESS]->(p:Process) " +
        "WITH DISTINCT p ORDER BY p LIMIT 50 WHERE p CONTAINS 'powershell' " +
        "RETURN p ORDER BY p")
      .collect().map(_.getString(0)).toSeq
    val want = et("HAS_PROCESS").select(col("dst").as("p")).distinct()
      .orderBy(col("p")).limit(50)
      .filter(col("p").contains("powershell"))
      .orderBy(col("p")).collect().map(_.getString(0)).toSeq
    assert(got == want)
    // and it genuinely differs from the filter-first spelling
    val preFilter = CypherLite.run(nodes, edges,
      "MATCH (t:Trace)-[:HAS_PROCESS]->(p:Process) " +
        "WITH DISTINCT p WHERE p CONTAINS 'powershell' ORDER BY p LIMIT 50 " +
        "RETURN p ORDER BY p")
      .collect().map(_.getString(0)).toSeq
    val wantPre = et("HAS_PROCESS").select(col("dst").as("p")).distinct()
      .filter(col("p").contains("powershell"))
      .orderBy(col("p")).limit(50)
      .collect().map(_.getString(0)).toSeq
    assert(preFilter == wantPre)
    intercept[IllegalArgumentException] {
      CypherLite.run(nodes, edges,
        "MATCH (t:Trace)-[:HAS_PROCESS]->(p:Process) " +
          "WITH DISTINCT p WHERE p CONTAINS 'a' ORDER BY p LIMIT 5 WHERE p CONTAINS 'b' " +
          "RETURN p").collect()
    }
  }

  test("size() over a lambda variable counts elements when the source is list-of-lists") {
    val (nodes, edges) = graph
    // split each collected ip into octets: the quantifier variable is
    // LIST-typed, so size(x) must count elements (not string length)
    val got = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[:CONNECTED_TO]->(ip:Ip) WITH p, collect(DISTINCT ip) AS ips " +
        "WHERE any(x IN [y IN ips | split(y, '.')] WHERE size(x) = 4) " +
        "RETURN p ORDER BY p")
      .collect().map(_.getString(0)).toSeq
    val want = et("CONNECTED_TO")
      .select(col("src").as("p"), col("dst").as("ip")).distinct()
      .groupBy(col("p")).agg(collect_list(col("ip")).as("ips"))
      .filter(exists(col("ips"), x => size(split(x, "\\.")) === 4))
      .select(col("p")).orderBy(col("p"))
      .collect().map(_.getString(0)).toSeq
    assert(got == want && got.nonEmpty)
    // string-typed lambda variable: size() stays string length
    val strLen = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[:CONNECTED_TO]->(ip:Ip) WITH p, collect(DISTINCT ip) AS ips " +
        "WHERE all(x IN ips WHERE size(x) >= 7) RETURN p ORDER BY p")
      .collect().map(_.getString(0)).toSeq
    val wantLen = et("CONNECTED_TO")
      .select(col("src").as("p"), col("dst").as("ip")).distinct()
      .groupBy(col("p")).agg(collect_list(col("ip")).as("ips"))
      .filter(forall(col("ips"), x => length(x) >= 7))
      .select(col("p")).orderBy(col("p"))
      .collect().map(_.getString(0)).toSeq
    assert(strLen == wantLen)
  }

  test("bare pattern predicate: WHERE (p)-[:T]->(x) is sugar for exists(); NOT inverts it") {
    val (nodes, edges) = graph
    val bare = CypherLite.run(nodes, edges,
      "MATCH (p:Process) WHERE (p)-[:CONNECTED_TO]->(:Ip) AND (p)-[:CREATED_FILE]->() " +
        "RETURN DISTINCT p ORDER BY p")
      .collect().map(_.getString(0)).toSeq
    val viaExists = CypherLite.run(nodes, edges,
      "MATCH (p:Process) WHERE exists((p)-[:CONNECTED_TO]->(:Ip)) " +
        "AND exists((p)-[:CREATED_FILE]->()) RETURN DISTINCT p ORDER BY p")
      .collect().map(_.getString(0)).toSeq
    val want = et("CONNECTED_TO").select(col("src").as("p")).distinct()
      .join(et("CREATED_FILE").select(col("src").as("p")).distinct(), Seq("p"), "left_semi")
      .join(graph._1.filter(col("label") === "Process").select(col("id").as("p")),
        Seq("p"), "left_semi")
      .orderBy(col("p")).collect().map(_.getString(0)).toSeq
    assert(bare == viaExists && bare == want && bare.nonEmpty)
    // NOT (p)-[:T]->() composes into the anti shape
    val not = CypherLite.run(nodes, edges,
      "MATCH (p:Process) WHERE NOT (p)-[:CONNECTED_TO]->() RETURN DISTINCT p ORDER BY p")
      .collect().map(_.getString(0)).toSeq
    val wantNot = graph._1.filter(col("label") === "Process").select(col("id").as("p"))
      .join(et("CONNECTED_TO").select(col("src").as("p")).distinct(), Seq("p"), "left_anti")
      .distinct().orderBy(col("p")).collect().map(_.getString(0)).toSeq
    assert(not == wantNot && not.nonEmpty)
    // parenthesized arithmetic is NOT swallowed by the pattern branch
    val arith = CypherLite.run(nodes, edges,
      "MATCH (t:Trace)-[:HAS_PROCESS]->(p) WITH t, count(p) AS c " +
        "WHERE (c) - 1 > 0 RETURN t ORDER BY t")
      .collect().map(_.getString(0)).toSeq
    val wantArith = et("HAS_PROCESS").groupBy(col("src").as("t"))
      .agg(count(lit(1)).as("c")).filter(col("c") - 1 > 0)
      .select(col("t")).orderBy(col("t")).collect().map(_.getString(0)).toSeq
    assert(arith == wantArith && arith.nonEmpty)
  }

  test("calendar durations: datetime ± duration('P1M'/{months: 1}) via month arithmetic") {
    import spark.implicits._
    val nodes = Seq(
      ("Event", "e1", Map("ts" -> "2024-01-31 10:00:00")), // +1M clamps to Feb 29 (leap)
      ("Event", "e2", Map("ts" -> "2024-05-01 10:03:00")),
      ("Event", "e3", Map("ts" -> "2024-12-15 09:00:00"))) // +1M rolls the year
      .toDF("label", "id", "props")
    val edges = Seq(("NEXT", "e1", "e2", 1, Map.empty[String, String]))
      .toDF("etype", "src", "dst", "event_id", "props")
    val got = CypherLite.run(nodes, edges,
      "MATCH (a:Event) RETURN a, datetime(a.ts) + duration('P1M') AS plus_m, " +
        "date(a.ts) - duration({years: 1, days: 2}) AS minus_yd ORDER BY a")
      .collect().map(r => (r.getString(0), r.get(1), r.get(2))).toSeq
    val want = nodes
      .select(col("id").as("a"), element_at(col("props"), "ts").as("ts"))
      .select(col("a"),
        (to_timestamp(col("ts")) + make_interval(lit(0), lit(1), lit(0), lit(0), lit(0), lit(0), lit(0))).as("plus_m"),
        (to_date(col("ts")) + make_interval(lit(-1), lit(0), lit(0), lit(-2), lit(0), lit(0), lit(0))).as("minus_yd"))
      .orderBy(col("a"))
      .collect().map(r => (r.getString(0), r.get(1), r.get(2))).toSeq
    assert(got == want && got.nonEmpty)
    // month-end clamping (Jan 31 + 1M = Feb 29) and year roll are real
    assert(got.head._2.toString.startsWith("2024-02-29"))
    assert(got.last._2.toString.startsWith("2025-01-15"))
    // map form == ISO form
    val iso = CypherLite.run(nodes, edges,
      "MATCH (a:Event) RETURN datetime(a.ts) + duration('P1M') AS t ORDER BY t")
      .collect().map(_.get(0)).toSeq
    val viaMap = CypherLite.run(nodes, edges,
      "MATCH (a:Event) RETURN datetime(a.ts) + duration({months: 1}) AS t ORDER BY t")
      .collect().map(_.get(0)).toSeq
    assert(iso == viaMap && iso.nonEmpty)
    // day/time-only durations still compile to plain millis arithmetic
    val fast = CypherLite.run(nodes, edges,
      "MATCH (a:Event)-[:NEXT]->(b:Event) " +
        "WHERE timestamp(b.ts) - timestamp(a.ts) > duration('P30D') RETURN a, b").count()
    assert(fast == 1) // e1→e2 is ~3 months of fixed millis
    // calendar duration outside the additive anchor is a clear error
    val err = intercept[IllegalArgumentException] {
      CypherLite.run(nodes, edges,
        "MATCH (a:Event) WHERE timestamp(a.ts) > duration('P1M') RETURN a").collect()
    }
    assert(err.getMessage.contains("date anchor"))
  }

  // ---- inline property maps: (p:Process {image: 'x'}) — the
  // reference's own MERGE idiom (events.py:75-257) ----

  /** An image value carried by some process that has a CONNECTED_TO
    * edge (so map-vs-WHERE comparisons are non-vacuous). */
  private lazy val connectedImage: String = {
    val (nodes, _) = graph
    et("CONNECTED_TO").select(col("src").as("id"))
      .join(nodes.filter(col("label") === "Process"), Seq("id"), "left_semi")
      .join(nodes, Seq("id"))
      .select(element_at(col("props"), "image").as("img"))
      .filter(col("img").isNotNull && !col("img").contains("'"))
      .limit(1).collect().head.getString(0)
  }

  test("node property-map pattern equals the WHERE spelling") {
    val (nodes, edges) = graph
    val viaMap = CypherLite.run(nodes, edges,
      s"MATCH (p:Process {image: '$connectedImage'})-[:CONNECTED_TO]->(ip:Ip) " +
        "RETURN DISTINCT p, ip")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val viaWhere = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[:CONNECTED_TO]->(ip:Ip) " +
        s"WHERE p.image = '$connectedImage' RETURN DISTINCT p, ip")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(viaMap == viaWhere && viaMap.nonEmpty)
  }

  test("edge property-map pattern equals WHERE on the edge variable") {
    val (nodes, edges) = graph
    val viaMap = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[r:CONNECTED_TO {dport: '443'}]->(ip:Ip) " +
        "RETURN DISTINCT p, ip")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val viaWhere = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[r:CONNECTED_TO]->(ip:Ip) WHERE r.dport = '443' " +
        "RETURN DISTINCT p, ip")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(viaMap == viaWhere && viaMap.nonEmpty)
    // numeric literal compares through a double cast (dport is stored
    // as a string property)
    val viaNum = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[r:CONNECTED_TO {dport: 443}]->(ip:Ip) " +
        "RETURN DISTINCT p, ip")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(viaNum == viaWhere)
  }

  test("anonymous interior node with a property map filters mid-chain") {
    val (nodes, edges) = graph
    val got = CypherLite.run(nodes, edges,
      s"MATCH (t:Trace)-[:HAS_PROCESS]->(:Process {image: '$connectedImage'}) " +
        "RETURN DISTINCT t")
      .collect().map(_.getString(0)).toSet
    val procs = nodes.filter(col("label") === "Process" &&
        element_at(col("props"), "image") === connectedImage)
      .select(col("id").as("p"))
    val want = et("HAS_PROCESS").select(col("src").as("t"), col("dst").as("p"))
      .join(procs, Seq("p"), "left_semi")
      .select(col("t")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(got == want && got.nonEmpty)
  }

  test("property map inside exists() and the bare pattern predicate") {
    val (nodes, edges) = graph
    val want = CypherLite.run(nodes, edges,
      "MATCH (p:Process) " +
        "WHERE EXISTS { MATCH (p)-[r:CONNECTED_TO]->(i) WHERE r.dport = '443' } " +
        "RETURN DISTINCT p")
      .collect().map(_.getString(0)).toSet
    val viaExists = CypherLite.run(nodes, edges,
      "MATCH (p:Process) WHERE exists((p)-[:CONNECTED_TO {dport: '443'}]->()) " +
        "RETURN DISTINCT p")
      .collect().map(_.getString(0)).toSet
    val viaBare = CypherLite.run(nodes, edges,
      "MATCH (p:Process) WHERE (p)-[:CONNECTED_TO {dport: '443'}]->() " +
        "RETURN DISTINCT p")
      .collect().map(_.getString(0)).toSet
    assert(viaExists == want && viaBare == want && want.nonEmpty)
  }

  test("property-map values keep spaces and brackets inside quotes") {
    import spark.implicits._
    val nodes = Seq(("Doc", "d1", Map("title" -> "a b)] c")),
      ("Doc", "d2", Map("title" -> "other")))
      .toDF("label", "id", "props")
    val edges = Seq(("REFS", "d1", "d2", 1, Map.empty[String, String]))
      .toDF("etype", "src", "dst", "event_id", "props")
    val got = CypherLite.run(nodes, edges,
      "MATCH (d:Doc {title: 'a b)] c'})-[:REFS]->(x) RETURN d, x")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq(("d1", "d2")))
    // and through the predicate-position pattern scanner too
    val viaPred = CypherLite.run(nodes, edges,
      "MATCH (d:Doc) WHERE (d:Doc {title: 'a b)] c'})-[:REFS]->() RETURN d")
      .collect().map(_.getString(0)).toSeq
    assert(viaPred == Seq("d1"))
  }

  test("size() over an opaque lambda element type is a clear error, not a guess") {
    import spark.implicits._
    val nodes = Seq(("Doc", "d1", Map("tags" -> "a,b;c,d")))
      .toDF("label", "id", "props")
    val edges = Seq(("REFS", "d1", "d1", 1, Map.empty[String, String]))
      .toDF("etype", "src", "dst", "event_id", "props")
    // inside a nested lambda, a projecting comprehension's element
    // type is opaque → size(x) must refuse rather than silently
    // compile to length() (top-level sources resolve from the frame
    // schema and are unaffected)
    val err = intercept[IllegalArgumentException] {
      CypherLite.run(nodes, edges,
        "MATCH (d:Doc) RETURN [y IN split(d.tags, ';') | reduce(acc = 0, " +
          "x IN [z IN split(y, ',') | [z]] | acc + size(x))] AS n").collect()
    }
    assert(err.getMessage.contains("size(x)"))
    // known string elements from a nested split still take length()
    val ok = CypherLite.run(nodes, edges,
      "MATCH (d:Doc) RETURN [y IN split(d.tags, ';') | reduce(acc = 0, " +
        "x IN split(y, ',') | acc + size(x))] AS n").collect()
    // per y-group: 'a,b' → 1+1, 'c,d' → 1+1
    assert(ok.head.getSeq[Any](0).map(_.toString.toDouble) == Seq(2.0, 2.0))
  }

  test("parser rejects malformed property maps") {
    intercept[IllegalArgumentException](
      CypherLite.parse("MATCH (p:Process {image: cmd}) RETURN p"))
    intercept[IllegalArgumentException](
      CypherLite.parse("MATCH (p:Process {image 'x'}) RETURN p"))
  }

  test("inline WHERE in node and relationship patterns") {
    val (nodes, edges) = graph
    def rows(q: String): Set[(String, String)] =
      CypherLite.run(nodes, edges, q)
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // node inline WHERE ≡ the clause WHERE spelling
    val inl = rows("MATCH (p:Process WHERE p.image ENDS WITH '.exe')" +
      "-[:CONNECTED_TO]->(ip:Ip) RETURN DISTINCT p, ip")
    val cls = rows("MATCH (p:Process)-[:CONNECTED_TO]->(ip:Ip) " +
      "WHERE p.image ENDS WITH '.exe' RETURN DISTINCT p, ip")
    assert(inl == cls && inl.nonEmpty)
    // relationship inline WHERE ≡ the clause WHERE spelling
    val einl = rows("MATCH (p:Process)-[r:CONNECTED_TO WHERE r.dport = '443']" +
      "->(ip:Ip) RETURN DISTINCT p, ip")
    val ecls = rows("MATCH (p:Process)-[r:CONNECTED_TO]->(ip:Ip) " +
      "WHERE r.dport = '443' RETURN DISTINCT p, ip")
    assert(einl == ecls && einl.nonEmpty)
    // inline + clause WHERE compose (both filters apply)
    val both = rows("MATCH (p:Process WHERE p.image ENDS WITH '.exe')" +
      "-[r:CONNECTED_TO WHERE r.dport = '443']->(ip:Ip) " +
      "WHERE NOT ip.id STARTS WITH '10.' RETURN DISTINCT p, ip")
    val bothCls = rows("MATCH (p:Process)-[r:CONNECTED_TO]->(ip:Ip) " +
      "WHERE p.image ENDS WITH '.exe' AND r.dport = '443' " +
      "AND NOT ip.id STARTS WITH '10.' RETURN DISTINCT p, ip")
    assert(both == bothCls && both.nonEmpty)
    // inline WHERE inside EXISTS{} / COUNT{} bodies
    val ex = CypherLite.run(nodes, edges,
      "MATCH (p:Process) WHERE EXISTS { (p)-[:CONNECTED_TO]->" +
        "(ip:Ip WHERE ip.id STARTS WITH '172.') } RETURN DISTINCT p")
      .collect().map(_.getString(0)).toSet
    val exCls = CypherLite.run(nodes, edges,
      "MATCH (p:Process) WHERE EXISTS { (p)-[:CONNECTED_TO]->(ip:Ip) " +
        "WHERE ip.id STARTS WITH '172.' } RETURN DISTINCT p")
      .collect().map(_.getString(0)).toSet
    assert(ex == exCls && ex.nonEmpty)
  }

  test("inline WHERE: OPTIONAL MATCH pre-join semantics and rejections") {
    import spark.implicits._
    val n = Seq(("a", "A", Map("k" -> "1")), ("b", "B", Map("k" -> "2")))
      .toDF("id", "label", "props")
    val e = Seq(("T", "a", "b", 1, Map.empty[String, String]))
      .toDF("etype", "src", "dst", "event_id", "props")
    // the inline predicate filters BEFORE the left join: x survives
    // with a null y (Cypher's OPTIONAL WHERE semantics)
    val kept = CypherLite.run(n, e,
      "MATCH (x:A) OPTIONAL MATCH (x)-[:T]->(y:B WHERE y.k = '9') RETURN x, y")
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toSet
    assert(kept == Set(("a", None)))
    val hit = CypherLite.run(n, e,
      "MATCH (x:A) OPTIONAL MATCH (x)-[:T]->(y:B WHERE y.k = '2') RETURN x, y")
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toSet
    assert(hit == Set(("a", Some("b"))))
    // var-length hop + inline WHERE is a loud error
    val err = intercept[IllegalArgumentException] {
      CypherLite.run(n, e,
        "MATCH (x:A)-[r:T*1..2 WHERE r.w = '1']->(y) RETURN x, y").collect()
    }
    assert(err.getMessage.contains("variable-length"))
    // empty inline WHERE is a loud error
    intercept[IllegalArgumentException] {
      CypherLite.parse("MATCH (x:A WHERE ) RETURN x")
    }
  }

  test("label predicates in WHERE and elementId()") {
    val (nodes, edges) = graph
    // WHERE x:Ip on an untyped pattern ≡ typing the pattern node
    val got = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[:CONNECTED_TO]->(x) WHERE x:Ip RETURN DISTINCT p, x")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val want = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[:CONNECTED_TO]->(x:Ip) RETURN DISTINCT p, x")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == want && got.nonEmpty)
    // NOT x:Label and label expressions compose in predicate position
    import spark.implicits._
    val n = Seq(("a", "A"), ("a", "B"), ("b", "A"), ("c", "C"))
      .map(t => (t._1, t._2, Map.empty[String, String]))
      .toDF("id", "label", "props")
    val e = Seq(("T", "a", "b", 1, Map.empty[String, String]),
        ("T", "a", "c", 1, Map.empty[String, String]))
      .toDF("etype", "src", "dst", "event_id", "props")
    def ids(q: String): Set[String] =
      CypherLite.run(n, e, q).collect().map(_.getString(0)).toSet
    assert(ids("MATCH (x) WHERE x:A&B RETURN DISTINCT x") == Set("a"))
    assert(ids("MATCH (x) WHERE NOT x:A RETURN DISTINCT x") == Set("c"))
    assert(ids("MATCH (x) WHERE x:C OR x:B RETURN DISTINCT x") == Set("a", "c"))
    // elementId(v) ≡ id(v)
    val eid = CypherLite.run(n, e,
      "MATCH (x:A) RETURN elementId(x) AS i ORDER BY i")
      .collect().map(_.getString(0)).toSeq
    assert(eid == Seq("a", "b"))
    // a label test inside a list lambda is a loud error
    intercept[IllegalArgumentException](CypherLite.run(n, e,
      "MATCH (x:A) RETURN [y IN ['a'] WHERE y:A | y] AS l").collect())
  }

  test("toBoolean, left and right string functions") {
    import spark.implicits._
    val n = Seq(("d1", "Doc", Map("flag" -> "true", "name" -> "abcdef")),
        ("d2", "Doc", Map("flag" -> "nope", "name" -> "xy")))
      .toDF("id", "label", "props")
    val e = Seq(("T", "d1", "d2", 1, Map.empty[String, String]))
      .toDF("etype", "src", "dst", "event_id", "props")
    val rows = CypherLite.run(n, e,
      "MATCH (d:Doc) RETURN d, toBoolean(d.flag) AS b, " +
        "left(d.name, 3) AS l, right(d.name, 3) AS r ORDER BY d")
      .collect().map(r => (r.getString(0), Option(r.get(1)), r.getString(2), r.getString(3)))
    assert(rows.toSeq == Seq(
      ("d1", Some(true), "abc", "def"),
      // toBoolean('nope') → null (Cypher contract); right() of a
      // too-short string returns the whole string
      ("d2", None, "xy", "xy")))
    // left/right compose with other term machinery
    val t = CypherLite.run(n, e,
      "MATCH (d:Doc) WHERE left(d.name, 2) = 'xy' RETURN d")
      .collect().map(_.getString(0)).toSeq
    assert(t == Seq("d2"))
  }

  test("quantified path patterns desugar to var-length hops") {
    val (nodes, edges) = graph
    def pairs(q: String): Set[(String, String)] =
      CypherLite.run(nodes, edges, q)
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // -[:T]->{1,3} ≡ -[:T*1..3]->
    val star = pairs("MATCH (a:Process)-[:SPAWNS*1..3]->(b:Process) RETURN DISTINCT a, b")
    assert(pairs("MATCH (a:Process)-[:SPAWNS]->{1,3}(b:Process) RETURN DISTINCT a, b") == star)
    // the anonymous group spelling and the + quantifier
    assert(pairs("MATCH (a:Process)(()-[:SPAWNS]->()){1,3}(b:Process) RETURN DISTINCT a, b") == star)
    val plus = pairs("MATCH (a:Process)-[:SPAWNS*1..10]->(b:Process) RETURN DISTINCT a, b")
    assert(pairs("MATCH (a:Process)-[:SPAWNS]->+(b:Process) RETURN DISTINCT a, b") == plus)
    // exact {2} and open {2,}
    val two = pairs("MATCH (a:Process)-[:SPAWNS*2..2]->(b:Process) RETURN DISTINCT a, b")
    assert(pairs("MATCH (a:Process)-[:SPAWNS]->{2}(b:Process) RETURN DISTINCT a, b") == two)
    val open = pairs("MATCH (a:Process)-[:SPAWNS*2..10]->(b:Process) RETURN DISTINCT a, b")
    assert(pairs("MATCH (a:Process)-[:SPAWNS]->{2,}(b:Process) RETURN DISTINCT a, b") == open)
    // reverse-direction quantified hop
    val rev = pairs("MATCH (a:Process)<-[:SPAWNS*1..2]-(b:Process) RETURN DISTINCT a, b")
    assert(pairs("MATCH (a:Process)<-[:SPAWNS]-{1,2}(b:Process) RETURN DISTINCT a, b") == rev)
    // loud: zero repetitions, bound inner nodes, already-var-length
    intercept[IllegalArgumentException](
      CypherLite.parse("MATCH (a)-[:SPAWNS]->{0,3}(b) RETURN a"))
    intercept[IllegalArgumentException](
      CypherLite.parse("MATCH (a)((x)-[:SPAWNS]->(y)){1,3}(b) RETURN a"))
    intercept[IllegalArgumentException](
      CypherLite.parse("MATCH (a)-[:SPAWNS*1..2]->{1,3}(b) RETURN a"))
  }

  test("COLLECT { } subqueries compile onto the pattern-comprehension shape") {
    val (nodes, edges) = graph
    // COLLECT { MATCH … RETURN expr } ≡ the pattern comprehension twin
    val got = CypherLite.run(nodes, edges,
      "MATCH (p:Process) RETURN p, COLLECT { MATCH (p)-[:CONNECTED_TO]->" +
        "(ip:Ip) RETURN ip.id } AS ips")
      .collect().map(r => (r.getString(0), r.getSeq[String](1).toList)).toSet
    val twin = CypherLite.run(nodes, edges,
      "MATCH (p:Process) RETURN p, [(p)-[:CONNECTED_TO]->(ip:Ip) | ip.id] AS ips")
      .collect().map(r => (r.getString(0), r.getSeq[String](1).toList)).toSet
    assert(got == twin && got.nonEmpty)
    assert(got.exists(_._2.nonEmpty))
    // inner WHERE filters matches; empty matches fill []
    val filt = CypherLite.run(nodes, edges,
      "MATCH (p:Process) RETURN p, COLLECT { MATCH (p)-[r:CONNECTED_TO]->" +
        "(ip:Ip) WHERE r.dport = '443' RETURN ip.id } AS ips")
      .collect().map(r => (r.getString(0), r.getSeq[String](1).toList)).toMap
    val filtTwin = CypherLite.run(nodes, edges,
      "MATCH (p:Process) RETURN p, [(p)-[r:CONNECTED_TO]->(ip:Ip) " +
        "WHERE r.dport = '443' | ip.id] AS ips")
      .collect().map(r => (r.getString(0), r.getSeq[String](1).toList)).toMap
    assert(filt == filtTwin && filt.values.exists(_.isEmpty))
    // DISTINCT dedups the list; size() composes
    import spark.implicits._
    val dn = Seq(("a", "A"), ("b", "B"), ("c", "B")).map(t => (t._1, t._2, Map("k" -> "v")))
      .toDF("id", "label", "props")
    val de = Seq(("T", "a", "b"), ("T", "a", "c"))
      .map(t => (t._1, t._2, t._3, 1, Map.empty[String, String]))
      .toDF("etype", "src", "dst", "event_id", "props")
    val dis = CypherLite.run(dn, de,
      "MATCH (x:A) RETURN x, COLLECT { MATCH (x)-[:T]->(y:B) " +
        "RETURN DISTINCT y.k } AS ks, " +
        "size(COLLECT { MATCH (x)-[:T]->(y:B) RETURN y.k }) AS n")
      .collect().map(r => (r.getString(0), r.getSeq[String](1).toList,
        r.getAs[Number](2).intValue)).toSet
    assert(dis == Set(("a", List("v"), 2)))
    // COLLECT{} in WITH position carries into the next stage
    val viaWith = CypherLite.run(dn, de,
      "MATCH (x:A) WITH x, COLLECT { MATCH (x)-[:T]->(y:B) RETURN y.k } AS ks " +
        "RETURN x, size(ks) AS n")
      .collect().map(r => (r.getString(0), r.getAs[Number](1).intValue)).toSet
    assert(viaWith == Set(("a", 2)))
    // inner ORDER BY / pipelines are loud (sorted-list house rule)
    intercept[IllegalArgumentException](CypherLite.run(dn, de,
      "MATCH (x:A) RETURN COLLECT { MATCH (x)-[:T]->(y) RETURN y.k " +
        "ORDER BY y.k } AS ks"))
    intercept[IllegalArgumentException](CypherLite.run(dn, de,
      "MATCH (x:A) RETURN COLLECT { MATCH (x)-[:T]->(y) WITH y RETURN y.k } AS ks"))
  }

  test("COLLECT { } accepts STARTS WITH / ENDS WITH in its WHERE body " +
       "(the clause scan must not read the operator's WITH as a clause)") {
    val (nodes, edges) = graph
    // r12 ADVICE fix: the ' WITH ' keyword scan used to match inside
    // STARTS WITH / ENDS WITH and reject the whole subquery
    val got = CypherLite.run(nodes, edges,
      "MATCH (p:Process) RETURN p, COLLECT { MATCH (p)-[:CREATED_FILE]->" +
        "(f:File) WHERE f.id ENDS WITH '.exe' RETURN f.id } AS exes")
      .collect().map(r => (r.getString(0), r.getSeq[String](1).toList)).toMap
    val twin = CypherLite.run(nodes, edges,
      "MATCH (p:Process) RETURN p, [(p)-[:CREATED_FILE]->(f:File) " +
        "WHERE f.id ENDS WITH '.exe' | f.id] AS exes")
      .collect().map(r => (r.getString(0), r.getSeq[String](1).toList)).toMap
    assert(got == twin && got.nonEmpty)
    val st = CypherLite.run(nodes, edges,
      "MATCH (p:Process) RETURN p, COLLECT { MATCH (p)-[:CONNECTED_TO]->" +
        "(ip:Ip) WHERE ip.id STARTS WITH '1' RETURN ip.id } AS ips")
      .collect()
    assert(st.nonEmpty)
    // a REAL clause keyword in the body is still loud
    intercept[IllegalArgumentException](CypherLite.run(nodes, edges,
      "MATCH (p:Process) RETURN COLLECT { MATCH (p)-[:CONNECTED_TO]->(ip) " +
        "WITH ip RETURN ip.id } AS ips"))
    // masking survives locale-expanding characters in string literals
    // ('ß'.toUpperCase = "SS" — offset-desync regression guard)
    val sz = CypherLite.run(nodes, edges,
      "MATCH (p:Process) WHERE p.id = 'straße' RETURN p, " +
        "COLLECT { MATCH (p)-[:CONNECTED_TO]->(ip:Ip) RETURN ip.id } AS ips")
      .collect()
    assert(sz.isEmpty) // no such process; the point is it parses exactly
  }

  test("quantified path patterns tolerate whitespace before the quantifier " +
       "and unconsumed quantifiers stay loud") {
    val (nodes, edges) = graph
    def pairs(q: String): Set[(String, String)] =
      CypherLite.run(nodes, edges, q)
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // r12 ADVICE fix: '-> {1,2}' used to silently parse as a single
    // hop with the stray '{1,2}' dropped
    val star = pairs("MATCH (a:Process)-[:SPAWNS*1..3]->(b:Process) RETURN DISTINCT a, b")
    assert(pairs("MATCH (a:Process)-[:SPAWNS]-> {1,3} (b:Process) RETURN DISTINCT a, b") == star)
    val plus = pairs("MATCH (a:Process)-[:SPAWNS*1..10]->(b:Process) RETURN DISTINCT a, b")
    assert(pairs("MATCH (a:Process)-[:SPAWNS]-> + (b:Process) RETURN DISTINCT a, b") == plus)
    val grp = pairs("MATCH (a:Process)(()-[:SPAWNS]->()) {1,3} (b:Process) RETURN DISTINCT a, b")
    assert(grp == star)
    // a quantifier the rewrite cannot consume still fails loudly
    intercept[IllegalArgumentException](
      CypherLite.parse("MATCH (a)((x)-[:SPAWNS]->(y)) {1,3} (b) RETURN a"))
    intercept[IllegalArgumentException](
      CypherLite.parse("MATCH (a)-[:SPAWNS*1..2]-> {1,3} (b) RETURN a"))
  }

  test("label expressions: alternation and negation on the corpus") {
    val (nodes, edges) = graph
    // :File|RegistryKey ≡ union of the two label scans
    val got = CypherLite.run(nodes, edges,
      "MATCH (x:File|RegistryKey) RETURN DISTINCT x")
      .collect().map(_.getString(0)).toSet
    val want = nodes.filter(col("label").isin("File", "RegistryKey"))
      .select("id").distinct().collect().map(_.getString(0)).toSet
    assert(got == want && got.nonEmpty)
    // :!Process ≡ all ids minus ids carrying a Process row
    val neg = CypherLite.run(nodes, edges,
      "MATCH (x:!Process) RETURN DISTINCT x").collect().map(_.getString(0)).toSet
    val all = nodes.select("id").distinct().collect().map(_.getString(0)).toSet
    val procs = nodes.filter(col("label") === "Process")
      .select("id").collect().map(_.getString(0)).toSet
    assert(neg == (all -- procs) && neg.nonEmpty)
    // alternation composes with a hop: sources of CREATED_FILE|SPAWNS
    val hop = CypherLite.run(nodes, edges,
      "MATCH (p:Process)-[:CREATED_FILE|SPAWNS]->(x) RETURN DISTINCT p, x")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val hopWant = graph._2.filter(col("etype").isin("CREATED_FILE", "SPAWNS"))
      .select(col("src"), col("dst")).distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(hop == hopWant && hop.nonEmpty)
  }

  test("label expressions: conjunction, precedence, props, rejections") {
    import spark.implicits._
    // multi-label fixture: a is A+B, b is A only, c is B only, d is C
    val n = Seq(("a", "A"), ("a", "B"), ("b", "A"), ("c", "B"), ("d", "C"))
      .map { case (i, l) => (i, l, Map("k" -> i)) }
      .toDF("id", "label", "props")
    val e = Seq(("T", "a", "b", 1, Map.empty[String, String]))
      .toDF("etype", "src", "dst", "event_id", "props")
    def ids(q: String): Set[String] =
      CypherLite.run(n, e, q).collect().map(_.getString(0)).toSet
    assert(ids("MATCH (x:A&B) RETURN DISTINCT x") == Set("a"))
    assert(ids("MATCH (x:A&!B) RETURN DISTINCT x") == Set("b"))
    assert(ids("MATCH (x:!A&!B) RETURN DISTINCT x") == Set("d"))
    // precedence ! > & > | : A&B|C = (A&B)|C
    assert(ids("MATCH (x:A&B|C) RETURN DISTINCT x") == Set("a", "d"))
    // alternation + inline props: props gate on ANY row of the id
    assert(ids("MATCH (x:A|B {k: 'c'}) RETURN DISTINCT x") == Set("c"))
    assert(ids("MATCH (x:A|C) RETURN DISTINCT x") == Set("a", "b", "d"))
    // a node with both labels matches the alternation exactly once
    val rows = CypherLite.run(n, e, "MATCH (x:A|B) RETURN x").collect()
    assert(rows.map(_.getString(0)).sorted.toSeq == Seq("a", "b", "c"))
    // malformed expressions are loud
    intercept[IllegalArgumentException](ids("MATCH (x:A||B) RETURN x"))
    intercept[IllegalArgumentException](ids("MATCH (x:A&) RETURN x"))
    // type position takes | only; & fails the edge-token scan
    intercept[IllegalArgumentException](
      CypherLite.parse("MATCH (a)-[:A&B]->(b) RETURN a"))
  }
}
