package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.graph.SysmonGraph

/** CLI entry: trace JSON file(s)/glob → property-graph parquet.
  *
  * Usage: runMain graft.GraphDump <trace-json-path-or-glob> <outDir>
  * Prints per-label node counts and per-type edge counts, then writes
  * nodes/ and edges/ parquet (partitioned by label / etype).
  */
object GraphDump {
  def main(args: Array[String]): Unit = {
    val Array(in, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (nodes, edges) = SysmonGraph.build(spark, in)
    nodes.persist(); edges.persist()
    nodes.groupBy(col("label")).count().orderBy(col("label")).collect()
      .foreach(r => println(s"NODE ${r.getString(0)} ${r.getLong(1)}"))
    edges.groupBy(col("etype")).count().orderBy(col("etype")).collect()
      .foreach(r => println(s"EDGE ${r.getString(0)} ${r.getLong(1)}"))
    nodes.write.mode("overwrite").partitionBy("label").parquet(s"$outDir/nodes")
    edges.write.mode("overwrite").partitionBy("etype").parquet(s"$outDir/edges")
    println(s"TOTAL nodes=${nodes.count()} edges=${edges.count()}")
    spark.stop()
  }
}
