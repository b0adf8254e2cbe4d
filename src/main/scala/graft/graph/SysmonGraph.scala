package graft.graph

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.TraceJson

/** Sysmon trace spans → property graph (SURVEY §2 A3-A5), with the
  * reference loader's exact MERGE semantics re-expressed as distributed
  * aggregations (reference: /root/reference/events.py:74-505).
  *
  * Output frames:
  *  - nodes(label, id, props: map<string,string>)
  *  - edges(etype, src, dst, event_id: int, props: map<string,string>)
  *
  * Scale design: the whole ETL is two shuffles — one `groupBy(label,id)`
  * for node upserts and one `groupBy(etype,src,dst)` for edge upserts —
  * with map-side partial aggregation; per-event routing is a single
  * projection pass (arrays of conditional structs, exploded), so the
  * spans scan is read exactly once per output frame.
  */
object SysmonGraph {

  import TraceJson.{tag, basename, regParent, regValueName}

  /** Normalized per-span event frame: the reference's handle_span
    * preamble (events.py:265-319) as one projection. */
  def eventsNorm(spans: DataFrame): DataFrame = {
    val tags = col("tags")
    val ev = tag(tags, "EventID", "ID").cast("int")
    val isSrcEv = ev.isin(8, 10, 25)
    val guid0 = tag(tags, "ProcessGuid", "process_guid", "ProcessGUID")
    val pid0 = tag(tags, "ProcessId", "process_id", "pid", "Pid", "processId")
    val img0 = tag(tags, "Image", "process_path", "ImagePath", "image", "PathToImage")
    // events 8/10/25 fall back to Source* identity (events.py:286-293)
    val guid = when(isSrcEv && guid0.isNull,
      tag(tags, "SourceProcessGuid", "SourceProcessGUID", "source_process_guid"))
      .otherwise(guid0)
    val pid = when(isSrcEv && pid0.isNull,
      tag(tags, "SourceProcessId", "source_process_id")).otherwise(pid0)
    val imgRaw = when(isSrcEv && img0.isNull, tag(tags, "SourceImage")).otherwise(img0)
    val pguid = tag(tags, "ParentProcessGuid", "parent_process_guid", "ParentProcessGUID")
    val ppid = tag(tags, "ParentProcessId", "parent_pid", "ParentPid", "ppid",
      "parentPid", "sysmon.ppid")
    val dstGuid = tag(tags, "TargetProcessGuid", "TargetProcessGUID", "target_process_guid")
    val dstPid = tag(tags, "TargetProcessId", "TargetPid")
    spans.select(
      col("trace_id"), col("span_id"), col("span_ord"), col("tags"),
      ev.as("ev"),
      guid.as("guid"), pguid.as("pguid"),
      // key resolution: GUID, else trace:pid (events.py:296)
      coalesce(guid, when(pid.isNotNull, concat(col("trace_id"), lit(":"), pid))).as("pkey"),
      coalesce(pguid, when(ppid.isNotNull, concat(col("trace_id"), lit(":"), ppid))).as("parent_key"),
      // basename('') == '' — the reference always passes a non-null
      // (possibly empty) image string, so last-event-wins applies
      coalesce(basename(imgRaw), lit("")).as("image"),
      tag(tags, "CommandLine", "command_line").as("cmd"),
      coalesce(dstGuid,
        when(dstPid.isNotNull, concat(col("trace_id"), lit(":"), dstPid))).as("dst_key"),
      dstGuid.as("dst_guid"))
  }

  private def emptyProps: Column = map()
  private def props(kvs: (String, Column)*): Column =
    map_from_arrays(
      array(kvs.map(kv => lit(kv._1)): _*),
      array(kvs.map(_._2.cast("string")): _*))

  /** Conditional node row. */
  private def nodeW(cond: Column, label: String, id: Column,
                    p: Column = emptyProps): Column =
    when(cond && id.isNotNull,
      struct(lit(label).as("label"), id.as("id"), p.as("props")))

  /** Conditional edge row. */
  private def edgeW(cond: Column, etype: String, src: Column, dst: Column,
                    p: Column = emptyProps): Column =
    when(cond && src.isNotNull && dst.isNotNull,
      struct(lit(etype).as("etype"), src.as("src"), dst.as("dst"), p.as("props")))

  /** Per-event routed fields, computed once: every downstream branch
    * references a plain column instead of re-expanding the coalesce
    * chains (this also keeps the generated code for the emission
    * projection under Janino's 64KB method limit). */
  def routed(norm: DataFrame): DataFrame = {
    val tags = col("tags")
    val kpath = tag(tags, "TargetObject")
    norm.select(col("*"),
      tag(tags, "TargetFilename", "Path").as("target_file"),
      tag(tags, "ImageLoaded", "Image").as("img_loaded"),
      tag(tags, "DestinationIp", "dst_ip").as("dip"),
      tag(tags, "DestinationPort", "dst_port").as("dport"),
      tag(tags, "Protocol").as("proto"),
      lower(tag(tags, "DestinationHostname")).as("dhost"),
      tag(tags, "Device").as("device"),
      lower(tag(tags, "EventType")).as("reg_etype"),
      kpath.as("kpath"),
      regValueName(kpath).as("vname"),
      regParent(kpath).as("kparent"),
      tag(tags, "NewName", "NewDetails").as("rename_new"),
      tag(tags, "StreamName", "Stream").as("stream"),
      tag(tags, "Hash", "Hashes").as("hashv"),
      tag(tags, "PipeName", "Pipe").as("pipe_name"),
      tag(tags, "FilterName", "Name", "EventFilterName").as("wmi_fname"),
      tag(tags, "Query", "QueryName").as("wmi_fquery"),
      tag(tags, "ConsumerName", "Name", "Consumer").as("wmi_cname"),
      tag(tags, "CommandLine", "Command").as("wmi_ccmd"),
      tag(tags, "FilterName", "Filter").as("bind_f"),
      tag(tags, "ConsumerName", "Consumer").as("bind_c"),
      tag(tags, "GrantedAccess").as("granted"),
      tag(tags, "Details", "Info").as("details"))
  }

  /** All raw node/edge emissions per span (before MERGE aggregation),
    * mirroring the per-EventID router (events.py:321-505). */
  def rawGraph(normIn: DataFrame): (DataFrame, DataFrame) = {
    val norm = routed(normIn)
    val ev = col("ev")
    val pk = col("pkey")
    val hasP = pk.isNotNull
    val targetFile = col("target_file")
    val imgLoaded = col("img_loaded")
    val dip = col("dip")
    val dport = col("dport")
    val proto = col("proto")
    val dhost = col("dhost")
    val device = col("device")
    val regEtype = col("reg_etype")
    val kpath = col("kpath")
    val vname = col("vname")
    val kparent = col("kparent")
    val renameNew = col("rename_new")
    val stream = col("stream")
    val hashv = col("hashv")
    val pipeName = col("pipe_name")
    val wmiFName = col("wmi_fname")
    val wmiFQuery = col("wmi_fquery")
    val wmiCName = col("wmi_cname")
    val wmiCCmd = col("wmi_ccmd")
    val bindF = col("bind_f")
    val bindC = col("bind_c")
    val granted = col("granted")
    val details = col("details")
    val dk = col("dst_key")

    val nodes = norm.select(col("trace_id"), col("span_ord"), col("ev"), posexplode_outer(array(
      nodeW(lit(true), "Trace", col("trace_id")),
      // process + parent stub + target stub: props aggregated in mergeNodes
      nodeW(hasP, "Process", pk, props(
        "ProcessGuid" -> col("guid"), "ParentProcessGuid" -> col("pguid"),
        "image" -> col("image"), "CommandLine" -> col("cmd"), "main" -> lit("1"))),
      nodeW(hasP && col("parent_key").isNotNull, "Process", col("parent_key"),
        props("ProcessGuid" -> col("pguid"))),
      nodeW(ev.isin(8, 10, 25) && hasP, "Process", dk,
        props("ProcessGuid" -> col("dst_guid"))),
      nodeW(ev === 2 && hasP, "File", targetFile),
      nodeW(ev === 3 && hasP, "Ip", dip),
      nodeW(ev === 3 && hasP, "Ip", dhost),
      nodeW(ev.isin(6, 7) && hasP, "File", imgLoaded),
      nodeW(ev === 9 && hasP, "Device", device),
      nodeW(ev === 11 && hasP, "File", targetFile),
      nodeW(ev === 12 && hasP, "RegistryKey", kpath),
      nodeW(ev === 13 && hasP && kpath.isNotNull, "RegistryKey", kparent),
      nodeW(ev === 13 && hasP, "RegistryValue", kpath,
        props("valueName" -> vname)),
      nodeW(ev === 14 && hasP && renameNew.isNotNull, "RegistryKey", kpath),
      nodeW(ev === 14 && hasP && kpath.isNotNull, "RegistryKey", renameNew),
      nodeW(ev === 15 && hasP, "File", targetFile),
      nodeW(ev.isin(17, 18) && hasP, "Pipe", pipeName),
      nodeW(ev === 19 && hasP, "WmiFilter", wmiFName, props("query" -> wmiFQuery)),
      nodeW(ev === 20 && hasP, "WmiConsumer", wmiCName, props("command" -> wmiCCmd)),
      nodeW(ev.isin(23, 26) && hasP, "File", targetFile))).as(Seq("emit_pos", "n")))
      .filter(col("n").isNotNull)
      .select(col("trace_id"), col("span_ord"), col("emit_pos"), col("ev"),
        col("n.label"), col("n.id"), col("n.props"))

    val edges = norm.select(col("trace_id"), col("span_ord"), col("ev"), posexplode_outer(array(
      edgeW(hasP, "HAS_PROCESS", col("trace_id"), pk),
      edgeW(hasP && col("parent_key").isNotNull, "HAS_PROCESS", col("trace_id"), col("parent_key")),
      edgeW(ev.isin(8, 10, 25) && hasP, "HAS_PROCESS", col("trace_id"), dk),
      edgeW(hasP && col("parent_key").isNotNull, "SPAWNS", col("parent_key"), pk),
      edgeW(ev === 2 && hasP, "MODIFIED_FILE_TIME", pk, targetFile,
        props("what" -> lit("CreationTime"))),
      edgeW(ev === 3 && hasP, "CONNECTED_TO", pk, dip,
        props("proto" -> proto, "dport" -> dport)),
      edgeW(ev === 3 && hasP, "CONNECTED_TO", pk, dhost,
        props("proto" -> proto, "dport" -> dport)),
      edgeW(ev === 6 && hasP, "LOADED_DRIVER", pk, imgLoaded),
      edgeW(ev === 7 && hasP, "LOADED_MODULE", pk, imgLoaded),
      edgeW(ev === 8 && hasP, "INJECTED_THREAD", pk, dk),
      edgeW(ev === 9 && hasP, "RAW_READ", pk, device),
      edgeW(ev === 10 && hasP, "ACCESSED_PROCESS", pk, dk,
        props("grantedAccess" -> granted)),
      edgeW(ev === 11 && hasP, "CREATED_FILE", pk, targetFile),
      edgeW(ev === 12 && hasP && regEtype.startsWith("create"), "CREATED_REG_KEY", pk, kpath),
      edgeW(ev === 12 && hasP && regEtype.startsWith("delete"), "DELETED_REG_KEY", pk, kpath),
      edgeW(ev === 13 && hasP, "SET_REG_VALUE", pk, kpath,
        props("valueName" -> vname)),
      edgeW(ev === 13 && hasP && kpath.isNotNull, "UNDER_KEY", kpath, kparent),
      edgeW(ev === 14 && hasP && kpath.isNotNull, "RENAMED_REG_KEY", pk, renameNew),
      edgeW(ev === 14 && hasP && kpath.isNotNull && renameNew.isNotNull,
        "RENAMED_TO", kpath, renameNew),
      edgeW(ev === 15 && hasP, "CREATED_STREAM", pk, targetFile,
        props("stream" -> stream, "hash" -> hashv)),
      edgeW(ev === 17 && hasP, "CREATED_PIPE", pk, pipeName),
      edgeW(ev === 18 && hasP, "CONNECTED_PIPE", pk, pipeName),
      edgeW(ev === 21 && hasP, "BIND_TO", bindF, bindC),
      edgeW(ev.isin(23, 26) && hasP, "DELETED_FILE", pk, targetFile),
      edgeW(ev === 25 && hasP, "TAMPERED", pk, dk, props("details" -> details)),
      edgeW(ev === 27 && hasP, "CREATED_EXECUTABLE", pk, targetFile,
        props("mode" -> lit("blocked"))),
      edgeW(ev === 29 && hasP, "CREATED_EXECUTABLE", pk, targetFile,
        props("mode" -> lit("detected"))))).as(Seq("emit_pos", "e")))
      .filter(col("e").isNotNull)
      .select(col("span_ord"), col("emit_pos"), col("ev"),
        col("e.etype"), col("e.src"), col("e.dst"), col("e.props"))

    // BIND_TO (event 21) is MATCH-only in the reference (events.py:155-160):
    // the edge exists only if BOTH the WmiFilter and WmiConsumer nodes were
    // already created by an earlier event 19/20 at the time the bind event
    // is processed. Gate on the first-creation span_ord of each name —
    // the name frames are tiny (WMI events are rare), so both joins
    // broadcast at any corpus scale.
    val filterFirst = norm
      .filter(ev === 19 && hasP && wmiFName.isNotNull)
      .groupBy(wmiFName.as("wmi_name")).agg(min(col("span_ord")).as("created_ord"))
    val consumerFirst = norm
      .filter(ev === 20 && hasP && wmiCName.isNotNull)
      .groupBy(wmiCName.as("wmi_name")).agg(min(col("span_ord")).as("created_ord"))
    val gatedBinds = edges.filter(col("etype") === "BIND_TO")
      .join(broadcast(filterFirst),
        col("src") === col("wmi_name") && col("created_ord") < col("span_ord"), "left_semi")
      .join(broadcast(consumerFirst),
        col("dst") === col("wmi_name") && col("created_ord") < col("span_ord"), "left_semi")

    (nodes, edges.filter(col("etype") =!= "BIND_TO").unionByName(gatedBinds))
  }

  /** MERGE node rows → one row per (label, id).
    *
    * Property semantics per the reference Cypher:
    * image/CommandLine: ON CREATE SET + ON MATCH coalesce(new, old) —
    * since non-stub rows always carry a (possibly empty) image, this is
    * last-non-null-wins; ProcessGuid/ParentProcessGuid are only set ON
    * MATCH, so the creating row's values don't count
    * (events.py:79-92); WmiFilter.query / WmiConsumer.command are
    * last-non-null (events.py:147-154); RegistryValue.valueName is an
    * unconditional SET — last row wins (events.py:117-120).
    */
  def mergeNodes(nodes: DataFrame): DataFrame = {
    // emission order = statement execution order in the reference loader:
    // span processing order, then the per-span emission-array index (a span
    // can emit the same Process key twice — e.g. dst_key == pkey on events
    // 8/10/25 or a self-parent — and only the FIRST emission is the
    // node-creating MERGE; the second already runs ON MATCH).
    val ord = struct(col("span_ord"), col("emit_pos"))
    val minOrd = min(ord).over(Window.partitionBy(col("label"), col("id")))
    def lastNonNull(key: String): Column =
      max(when(element_at(col("props"), key).isNotNull,
        struct(col("span_ord"), col("emit_pos"),
          element_at(col("props"), key).as("v")))).getField("v")
    def lastNonNullAfterCreate(key: String): Column =
      max(when(element_at(col("props"), key).isNotNull && !col("is_create"),
        struct(col("span_ord"), col("emit_pos"),
          element_at(col("props"), key).as("v")))).getField("v")
    def last(key: String): Column =
      max(struct(col("span_ord"), col("emit_pos"),
        element_at(col("props"), key).as("v"))).getField("v")
    nodes
      .withColumn("is_create", ord === minOrd)
      .groupBy(col("label"), col("id"))
      .agg(
        lastNonNullAfterCreate("ProcessGuid").as("ProcessGuid"),
        lastNonNullAfterCreate("ParentProcessGuid").as("ParentProcessGuid"),
        lastNonNull("image").as("image"),
        lastNonNull("CommandLine").as("CommandLine"),
        lastNonNull("query").as("query"),
        lastNonNull("command").as("command"),
        last("valueName").as("valueName"),
        count(lit(1)).as("n_events"))
      .select(col("label"), col("id"),
        map_filter(
          map(
            lit("ProcessGuid"), col("ProcessGuid"),
            lit("ParentProcessGuid"), col("ParentProcessGuid"),
            lit("image"), col("image"),
            lit("CommandLine"), col("CommandLine"),
            lit("query"), col("query"),
            lit("command"), col("command"),
            lit("valueName"), col("valueName")),
          (_, v) => v.isNotNull).as("props"),
        col("n_events"))
  }

  /** MERGE edge rows → one row per (etype, src, dst): props are the
    * last event's values (unconditional SET), except TAMPERED.details
    * which is last-non-null (events.py:169-174). */
  def mergeEdges(edges: DataFrame): DataFrame = {
    val lastStruct = max_by(struct(col("ev").as("ev"), col("props").as("p")),
      struct(col("span_ord"), col("emit_pos")))
    val lastDetails = max(when(element_at(col("props"), "details").isNotNull,
      struct(col("span_ord"), col("emit_pos"),
        element_at(col("props"), "details").as("v")))).getField("v")
    edges.groupBy(col("etype"), col("src"), col("dst"))
      .agg(lastStruct.as("l"), lastDetails.as("details_nn"), count(lit(1)).as("n_events"))
      .select(col("etype"), col("src"), col("dst"),
        col("l.ev").as("event_id"),
        when(col("etype") === "TAMPERED",
          map_concat(
            map_filter(col("l.p"), (k, _) => k =!= "details"),
            map_filter(map(lit("details"), col("details_nn")), (_, v) => v.isNotNull)))
          .otherwise(col("l.p")).as("props"),
        col("n_events"))
  }

  /** Full pipeline: trace JSON files → (nodes, edges).
    *
    * The normalized span frame is materialized once (eager local
    * checkpoint): nodes, edges, AND the BIND_TO gating aggregates all
    * fan out from it, and without the checkpoint each consumer would
    * re-parse every JSON file (4 full corpus parses). `coalesce` packs
    * the one-task-per-file read into cpu-sized partitions so the
    * downstream stages aren't scheduling thousands of micro-tasks; on
    * a cluster the same call sites scale with executor count. */
  def build(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val par = spark.sparkContext.defaultParallelism * 2
    val norm = eventsNorm(TraceJson.spans(spark, path))
      .coalesce(par).localCheckpoint()
    val (n, e) = rawGraph(norm)
    (mergeNodes(n), mergeEdges(e))
  }

  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), (DataFrame, DataFrame)]()

  /** Session-memoized build: several queries over the same corpus share
    * one persisted graph instead of re-running the ETL each.
    *
    * Keyed by the session REFERENCE itself (SparkSession uses reference
    * equality — collision-proof, unlike an identity hash, which can
    * collide across sessions in one JVM); entries whose owning context
    * has stopped are swept on the next call — their persisted blocks
    * died with the context, so only the map entry (plans + session ref)
    * needs releasing. */
  def buildCached(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    memo.forEach((k, v) => if (k._1.sparkContext.isStopped) memo.remove(k, v))
    memo.computeIfAbsent((spark, path), { _ =>
      val (n, e) = build(spark, path)
      (n.persist(), e.persist())
    })
  }
}
