package graft

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
    intercept[IllegalArgumentException](
      CypherLite.parse("MATCH (a)-[:X]->(b), (c)-[:Y]->(d) RETURN a"))
    intercept[IllegalArgumentException](
      CypherLite.parse("MATCH (a)-[r:X*1..3]->(b) RETURN a"))
  }
}
