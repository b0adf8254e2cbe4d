package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.graph.SysmonGraph
import graft.sources.TraceJson

/** Streaming trace ingestion (SURVEY §2 H4, trace-specific): watch a
  * directory for new trace JSON files, emit raw node/edge rows per
  * micro-batch into an append store, and compact with the batch MERGE
  * semantics on demand — an LSM-style incremental build of the same
  * graph `SysmonGraph.build` produces in one shot.
  *
  * The reference loader is batch-only (rerun per file set); this keeps
  * a live graph current as sandbox detonations land.
  */
object TraceStream {

  /** Start the ingestion stream: trace files under `watchDir` →
    * raw emission rows appended under `storeDir`/{nodes_raw,edges_raw}.
    */
  def start(spark: SparkSession, watchDir: String, storeDir: String,
            checkpoint: String): StreamingQuery = {
    val rawSpans = spark.readStream
      .schema(TraceJson.schema)
      .option("multiLine", "true")
      .option("maxFilesPerTrigger", "64")
      .json(watchDir)
    rawSpans.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val spans = TraceJson.spansFromRaw(batch)
          val (n, e) = SysmonGraph.rawGraph(SysmonGraph.eventsNorm(spans))
          n.write.mode("append").parquet(s"$storeDir/nodes_raw")
          e.write.mode("append").parquet(s"$storeDir/edges_raw")
        }
      }
      .start()
  }

  /** Compact the raw append store into merged (nodes, edges) with the
    * same MERGE semantics as the batch build. */
  def compact(spark: SparkSession, storeDir: String): (DataFrame, DataFrame) = (
    SysmonGraph.mergeNodes(spark.read.parquet(s"$storeDir/nodes_raw")),
    SysmonGraph.mergeEdges(spark.read.parquet(s"$storeDir/edges_raw")))
}
