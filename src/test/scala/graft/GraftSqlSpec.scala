package graft

class GraftSqlSpec extends SparkSpec {

  test("SQL interface: star-schema query + native function") {
    GraftSql.registerTables(spark, sf)
    val rev = spark.sql(
      """SELECT n_name, round(sum(o_totalprice), 2) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY revenue DESC LIMIT 3""".stripMargin).collect()
    assert(rev.length == 3 && rev.head.getDouble(1) > 0)

    val cos = spark.sql(
      """SELECT a.vec_id, b.vec_id,
        |  cosine_sim(CAST(a.embedding AS array<double>),
        |             CAST(b.embedding AS array<double>)) AS c
        |FROM embeddings a JOIN embeddings b ON a.vec_id = 0 AND b.vec_id = 1""".stripMargin)
      .collect().head.getDouble(2)
    assert(cos >= -1.0 && cos <= 1.0)
  }

  test("SQL interface over the trace graph views") {
    GraftSql.registerGraph(spark, "/root/reference/malware/T1031+T1050-2.json")
    val spawns = spark.sql(
      "SELECT count(*) FROM edges WHERE etype = 'SPAWNS'").collect().head.getLong(0)
    assert(spawns == 58L) // pinned from tools/sysmon_oracle.py
    val procs = spark.sql(
      "SELECT count(*) FROM nodes WHERE label = 'Process'").collect().head.getLong(0)
    assert(procs == 64L)
  }

  test("Cypher strings run against the registered graph views") {
    GraftSql.registerGraph(spark, "/root/reference/malware/T1031+T1050-2.json")
    val out = GraftSql.cypher(spark,
      "MATCH (p:Process)-[:SPAWNS]->(c:Process) RETURN p, count(*) AS n ORDER BY n DESC LIMIT 3")
      .collect()
    assert(out.nonEmpty && out.head.getLong(1) >= out.last.getLong(1))
    // the per-parent counts must sum to the pinned SPAWNS edge count
    val all = GraftSql.cypher(spark,
      "MATCH (p:Process)-[:SPAWNS]->(c:Process) RETURN p, count(*) AS n")
      .collect().map(_.getLong(1)).sum
    assert(all == 58L)
  }
}
