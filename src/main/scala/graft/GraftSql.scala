package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-string interface: registers the star-schema tables (and
  * optionally a trace graph) as temp views so users can drive the
  * whole engine with `spark.sql(...)`, including graft's native
  * functions (cosine_sim via [[GraftExtensions]]).
  */
object GraftSql {

  /** Register every testdata table under its name. */
  def registerTables(spark: SparkSession, dir: String): Unit = {
    Tables.names.foreach { t =>
      Tables.load(spark, dir, t).createOrReplaceTempView(t)
    }
    GraftExtensions.install(spark)
  }

  /** Register a trace graph as `nodes` / `edges` views. */
  def registerGraph(spark: SparkSession, tracePath: String): Unit = {
    val (n, e) = graph.SysmonGraph.build(spark, tracePath)
    n.createOrReplaceTempView("nodes")
    e.createOrReplaceTempView("edges")
  }

  def sql(spark: SparkSession, query: String): DataFrame = spark.sql(query)

  /** Run a Cypher query ([[graph.CypherLite]] subset) against the
    * `nodes`/`edges` views registered by [[registerGraph]] — the
    * string-in, DataFrame-out surface a Neo4j user migrates to. */
  def cypher(spark: SparkSession, query: String): DataFrame =
    graph.CypherLite.run(spark.table("nodes"), spark.table("edges"), query)
}
