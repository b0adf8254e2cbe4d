package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Jaeger-style trace JSON source (SURVEY §2 A1/A2).
  *
  * Input format (one JSON object per file — see
  * /root/reference/events.py:507-519 `load_trace_file`):
  * `{traceID, spans:[{spanID, operationName, references[{refType,
  * spanID}], startTime, duration, tags:[{key,type,value}], …}]}`.
  *
  * Spark-first design: an explicit schema (no inference pass over
  * 100 TB), `multiLine` whole-file parsing (one file = one task),
  * tags normalized to a `map<string,string>` with `map_from_entries`
  * so downstream extraction is pure column arithmetic.
  */
object TraceJson {

  /** Tag values are heterogeneous (string/int64/bool) in the source;
    * parsing them as StringType keeps the raw token text. */
  val schema: StructType = StructType(Seq(
    StructField("traceID", StringType),
    StructField("spans", ArrayType(StructType(Seq(
      StructField("traceID", StringType),
      StructField("spanID", StringType),
      StructField("operationName", StringType),
      StructField("references", ArrayType(StructType(Seq(
        StructField("refType", StringType),
        StructField("traceID", StringType),
        StructField("spanID", StringType))))),
      StructField("startTime", LongType),
      StructField("duration", LongType),
      StructField("tags", ArrayType(StructType(Seq(
        StructField("key", StringType),
        StructField("type", StringType),
        StructField("value", StringType))))),
      StructField("processID", StringType)))))))

  /** Read trace files into one span per row:
    * (trace_id, span_id, parent_span_id, span_ord, start_time,
    * duration, op_name, tags: map<string,string>).
    *
    * `span_ord` reproduces the reference's processing order
    * (spans sorted by startTime, stable — events.py:513-516): it is
    * the (startTime, original index) pair packed in a struct, usable
    * as an ordering key for first/last-write-wins aggregation.
    */
  def spans(spark: SparkSession, path: String): DataFrame = {
    // a trailing "/*.json" glob is rewritten to directory +
    // pathGlobFilter: Spark's analysis stats the LITERAL path first
    // (FileStreamSink.hasMetadata) and logs a caught
    // FileNotFoundException for the unexpanded glob — same file set,
    // clean logs
    val GlobTail = """(.*)/(\*\.\w+)$""".r
    val reader = spark.read.schema(schema).option("multiLine", "true")
    spansFromRaw(path match {
      case GlobTail(dir, pat) if !dir.contains("*") =>
        reader.option("pathGlobFilter", pat).json(dir)
      case p => reader.json(p)
    })
  }

  /** The same projection over an already-read raw frame (streaming
    * micro-batches arrive pre-read — see streaming.TraceStream). */
  def spansFromRaw(rawIn: DataFrame): DataFrame = {
    val raw = rawIn
      // files without a traceID get a synthetic one, like the
      // reference's FILE::<basename> fallback (events.py:510)
      .withColumn("trace_id",
        coalesce(col("traceID"),
          concat(lit("FILE::"), element_at(split(input_file_name(), "/"), -1))))
    // posexplode_outer: a zero-span trace file still yields one row
    // (null span) so the Trace node itself is not lost
    raw.select(col("trace_id"), posexplode_outer(col("spans")).as(Seq("idx", "sp")))
      .select(
        col("trace_id"),
        col("sp.spanID").as("span_id"),
        filter(col("sp.references"), r => r.getField("refType") === "CHILD_OF")
          .getItem(0).getField("spanID").as("parent_span_id"),
        // file-major ordering: the reference loader processes files in
        // sorted-path order and sorts spans by startTime within a file
        // (main.py INPUT_FILES sorted glob; events.py:513). Identical
        // spans duplicated across trace files MUST order by file, or
        // both copies look like the node-creating event.
        struct(input_file_name().as("f"), col("sp.startTime").as("t"),
          col("idx").as("i")).as("span_ord"),
        col("sp.startTime").as("start_time"),
        col("sp.duration").as("duration"),
        col("sp.operationName").as("op_name"),
        map_from_entries(transform(
          filter(col("sp.tags"), t => !isFalsy(t.getField("value"), t.getField("type"))),
          t => struct(t.getField("key"), t.getField("value")))).as("tags"))
  }

  // ===== tag-normalization kit (A2) — Spark analogs of the reference
  // utils (events.py:9-57), as pure column expressions =====

  /** The reference reads tags through Python-truthiness coalesce
    * (events.py:24-28): numeric 0, empty string, and false are skipped
    * everywhere a tag is consumed. We normalize equivalently at map
    * construction by dropping per-type falsy values. */
  def isFalsy(value: Column, typ: Column): Column =
    value.isNull || value === "" ||
      (typ.isin("int64", "float64") && coalesce(value.cast("double") === 0.0, lit(false))) ||
      (typ === "bool" && value === "false")

  /** First non-null, non-empty tag among aliases (events.py:24 coalesce). */
  def tag(tags: Column, keys: String*): Column =
    coalesce(keys.map(k => {
      val v = element_at(tags, k)
      when(v.isNotNull && v =!= "", v)
    }): _*)

  /** Final path segment following the reference's os.path.basename
    * semantics — '/' is the only separator, so Windows backslash paths
    * pass through whole (events.py:282 runs on a POSIX host). */
  def basename(c: Column): Column = element_at(split(c, "/"), -1)

  /** Registry target split: parent key path + value name
    * (events.py:30-36 parse_reg_target). */
  def regParent(c: Column): Column = {
    val trimmed = regexp_replace(c, "\\\\+$", "")
    val parts = split(trimmed, "\\\\")
    when(size(parts) >= 2, array_join(slice(parts, lit(1), size(parts) - 1), "\\"))
      .otherwise(trimmed)
  }

  /** Registry value name (last path segment), null when no separator. */
  def regValueName(c: Column): Column = {
    val trimmed = regexp_replace(c, "\\\\+$", "")
    val parts = split(trimmed, "\\\\")
    when(size(parts) >= 2, element_at(parts, -1))
  }

  /** UTC-normalized ISO timestamp from a free-form tag (events.py:9-15
    * to_utc): parses the common Sysmon formats, null on failure. */
  def toUtc(c: Column): Column =
    date_format(coalesce(
      try_to_timestamp(c, lit("yyyy-MM-dd HH:mm:ss.SSS")),
      try_to_timestamp(c, lit("MM/dd/yyyy HH:mm:ss")),
      try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ss")),
      try_to_timestamp(c)), "yyyy-MM-dd'T'HH:mm:ssXXX")

  /** JSON array or delimited token list → array<string>
    * (events.py:38-49 json_or_list): tries a JSON string array first,
    * else splits on whitespace/comma/semicolon/pipe, dropping empty
    * tokens and bare "-" placeholders. */
  def jsonOrList(c: Column): Column = {
    val parsed = from_json(trim(c), org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType))
    val tokens = filter(split(trim(c), "[\\s,;|]+"), t => t =!= "" && t =!= "-")
    when(c.isNull, array().cast("array<string>"))
      .when(parsed.isNotNull, filter(parsed, t => t.isNotNull && t =!= ""))
      .otherwise(tokens)
  }

  /** Last path segment handling both separators (events.py:51-57
    * last_segment): backslash preferred, else POSIX basename. */
  def lastSegment(c: Column): Column = {
    val s = regexp_replace(c, "[/\\\\]+$", "")
    when(s.contains("\\"), element_at(split(s, "\\\\"), -1))
      .otherwise(element_at(split(s, "/"), -1))
  }
}
