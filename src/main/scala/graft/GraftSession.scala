package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the confs this engine assumes everywhere.
  *
  * Local runs use `local[N]` with `shuffle.partitions = N`; on a real
  * cluster the same builder is used with a higher parallelism. AQE is on
  * so skewed shuffles re-plan at runtime.
  */
object GraftSession {
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession =
    configure(SparkSession.builder().master(s"local[$cores]"), cores).getOrCreate()

  def configure(b: SparkSession.Builder, parallelism: Int): SparkSession.Builder =
    b.appName("graft")
      .config("spark.sql.shuffle.partitions", parallelism.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS) which the vectorized
      // reader rejects; read as long and convert (Tables.events).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // parquet writers flip between tz'd and tz-less µs timestamps
      // across testdata regenerations; read both flavors as
      // TimestampType (session tz is UTC, so the instants agree) so
      // time arithmetic like unix_millis never hits TIMESTAMP_NTZ
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // duplicate span-tag keys: last wins, like the reference's
      // taglist_to_dict (events.py:17-22)
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      // mid-size build sides (graph closure sets, prefix indexes) are
      // worth broadcasting on a 128 GiB single node; SURVEY §5 covers
      // sizing this per executor memory at cluster scale
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      // iterative analytics (betweenness levels, BFS frontiers) build
      // plans whose debug strings exceed the 25-field default; the
      // truncation WARN is the last non-signal line in a clean bench
      // tail, and the longer debug strings are log-only cost
      .config("spark.sql.debug.maxToStringFields", "2000")
      .config("spark.ui.enabled", "false")
}
