package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Detection motif library over the Sysmon property graph (SURVEY §2
  * B9) — the multi-hop Cypher patterns an analyst runs on the
  * reference's Neo4j graph, as composed DataFrame joins over the
  * (nodes, edges) frames from [[SysmonGraph.build]].
  */
object Detections {

  private def et(edges: DataFrame, t: String) = edges.filter(col("etype") === t)

  /** Process injects a thread AND makes a network connection —
    * `(p)-[:INJECTED_THREAD]->() , (p)-[:CONNECTED_TO]->(ip)`. */
  def injectAndBeacon(edges: DataFrame): DataFrame =
    et(edges, "INJECTED_THREAD").select(col("src").as("process"), col("dst").as("target"))
      .join(et(edges, "CONNECTED_TO").select(col("src").as("process"), col("dst").as("ip")),
        Seq("process"))
      .select(col("process"), col("target"), col("ip"))
      .distinct()

  /** WMI event-subscription persistence:
    * `(f:WmiFilter)-[:BIND_TO]->(c:WmiConsumer)`, annotated with the
    * consumer command when present. */
  def wmiPersistence(nodes: DataFrame, edges: DataFrame): DataFrame =
    et(edges, "BIND_TO").select(col("src").as("filter"), col("dst").as("consumer"))
      .join(nodes.filter(col("label") === "WmiConsumer")
        .select(col("id").as("consumer"),
          element_at(col("props"), "command").as("command")), Seq("consumer"), "left")

  /** Registry run-key autostart: SET_REG_VALUE under a *\\Run* key. */
  def runKeyAutostart(edges: DataFrame): DataFrame =
    et(edges, "SET_REG_VALUE")
      .filter(upper(col("dst")).contains("\\CURRENTVERSION\\RUN"))
      .select(col("src").as("process"), col("dst").as("reg_value"),
        element_at(col("props"), "valueName").as("value_name"))

  /** Executable dropped by one process and loaded/spawned via another:
    * `(a)-[:CREATED_FILE]->(f)<-[:LOADED_MODULE|LOADED_DRIVER]-(b)`. */
  def droppedAndLoaded(edges: DataFrame): DataFrame = {
    val loads = edges.filter(col("etype").isin("LOADED_MODULE", "LOADED_DRIVER"))
    et(edges, "CREATED_FILE").select(col("src").as("dropper"), col("dst").as("file"))
      .join(loads.select(col("src").as("loader"), col("dst").as("file")), Seq("file"))
      .filter(col("dropper") =!= col("loader"))
      .distinct()
  }

  /** Self-deleting process: deletes a file whose basename equals its
    * own image basename (classic installer/wiper trick). */
  def selfDeletion(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val base = (c: org.apache.spark.sql.Column) => element_at(split(c, "\\\\"), -1)
    val procs = nodes.filter(col("label") === "Process")
      .select(col("id").as("process"), element_at(col("props"), "image").as("image"))
    et(edges, "DELETED_FILE").select(col("src").as("process"), col("dst").as("file"))
      .join(procs, Seq("process"))
      .filter(col("image").isNotNull && col("image") =!= "" &&
        lower(base(col("file"))) === lower(base(col("image"))))
      .select(col("process"), col("image"), col("file"))
  }

  /** Deep spawn chains: processes ≥ `minDepth` SPAWNS-hops below a
    * root (no parent) — variable-length traversal via GraphOps.bfs. */
  def deepSpawnChains(edges: DataFrame, minDepth: Int, maxIter: Int = 12): DataFrame = {
    val spawns = et(edges, "SPAWNS").select(col("src"), col("dst"))
    val roots = spawns.select(col("src").as("id")).distinct()
      .join(spawns.select(col("dst").as("id")).distinct(), Seq("id"), "left_anti")
    GraphOps.bfs(spawns, roots, maxIter).filter(col("dist") >= minDepth)
  }

  /** Cross-process named-pipe rendezvous: one process CREATED_PIPE a
    * pipe another process CONNECTED_PIPE to — classic C2/lateral-
    * movement channel (e.g., Cobalt Strike `\postex_*`, `\MSSE-*`). */
  def pipeRendezvous(edges: DataFrame): DataFrame =
    et(edges, "CREATED_PIPE").select(col("src").as("creator"), col("dst").as("pipe"))
      .join(et(edges, "CONNECTED_PIPE").select(col("src").as("connector"), col("dst").as("pipe")),
        Seq("pipe"))
      .filter(col("creator") =!= col("connector"))
      .distinct()

  /** Raw device access (credential dumping / disk wiping prep):
    * RAW_READ edges with the reading process's image. */
  def rawDiskAccess(nodes: DataFrame, edges: DataFrame): DataFrame =
    et(edges, "RAW_READ").select(col("src").as("process"), col("dst").as("device"))
      .join(nodes.filter(col("label") === "Process")
        .select(col("id").as("process"), element_at(col("props"), "image").as("image")),
        Seq("process"), "left")

  /** Script-host spawn chains: a scripting LOLBin (powershell/wscript/
    * cscript/mshta/rundll32) spawning a process that then connects out. */
  def scriptHostBeacon(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val hosts = Seq("powershell.exe", "wscript.exe", "cscript.exe",
      "mshta.exe", "rundll32.exe", "cmd.exe")
    val base = (c: org.apache.spark.sql.Column) =>
      lower(element_at(split(c, "\\\\"), -1))
    val procs = nodes.filter(col("label") === "Process")
      .select(col("id"), element_at(col("props"), "image").as("image"))
    val scriptProcs = procs.filter(base(col("image")).isin(hosts: _*))
      .select(col("id"))
    Traverse.from(edges, scriptProcs)
      .out("SPAWNS", 1 to 3)
      .pairs.select(col("start").as("script_host"), col("cur").as("descendant"))
      .join(et(edges, "CONNECTED_TO").select(col("src").as("descendant"), col("dst").as("ip")),
        Seq("descendant"))
      .distinct()
  }

  /** Registry persistence beyond Run keys: SET_REG_VALUE / CREATED_REG_KEY
    * under Services, Image File Execution Options, or Winlogon paths
    * (T1543.003 / T1546.012 / T1547.004). */
  def persistenceRegistry(edges: DataFrame): DataFrame = {
    val needles = Seq("\\SERVICES\\", "\\IMAGE FILE EXECUTION OPTIONS\\", "\\WINLOGON\\")
    edges.filter(col("etype").isin("SET_REG_VALUE", "CREATED_REG_KEY"))
      .filter(needles.map(n => upper(col("dst")).contains(n)).reduce(_ || _))
      .select(col("src").as("process"), col("etype"), col("dst").as("reg_path"))
      .distinct()
  }

  /** Tampered process that then connects out (process hollowing /
    * herpaderping followed by C2): `()-[:TAMPERED]->(p)-[:CONNECTED_TO]->(ip)`. */
  def tamperAndBeacon(edges: DataFrame): DataFrame =
    et(edges, "TAMPERED").select(col("src").as("tamperer"), col("dst").as("process"))
      .join(et(edges, "CONNECTED_TO").select(col("src").as("process"), col("dst").as("ip")),
        Seq("process"))
      .distinct()

  /** Timestomping (T1070.006): a process that BOTH creates a file and
    * modifies its creation time — `(p)-[:CREATED_FILE]->(f)` and
    * `(p)-[:MODIFIED_FILE_TIME]->(f)`. */
  def timestomp(edges: DataFrame): DataFrame =
    et(edges, "CREATED_FILE").select(col("src").as("process"), col("dst").as("file"))
      .join(et(edges, "MODIFIED_FILE_TIME")
        .select(col("src").as("process"), col("dst").as("file")), Seq("process", "file"))
      .distinct()

  /** Alternate-data-stream drops (T1564.4 defense evasion): files
    * written with a named NTFS stream, excluding the browser-standard
    * Zone.Identifier mark-of-the-web. */
  def adsDrops(edges: DataFrame): DataFrame =
    et(edges, "CREATED_STREAM")
      .select(col("src").as("process"), col("dst").as("file"),
        element_at(col("props"), "stream").as("stream"),
        element_at(col("props"), "hash").as("hash"))
      .filter(col("stream").isNull || !upper(col("stream")).contains("ZONE.IDENTIFIER"))

  /** Per-trace detection summary: counts of each motif, joined to the
    * trace via HAS_PROCESS. */
  def summary(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val hp = et(edges, "HAS_PROCESS").select(col("src").as("trace"), col("dst").as("process"))
    val beacons = injectAndBeacon(edges).select(col("process")).distinct()
      .join(hp, Seq("process")).groupBy(col("trace"))
      .agg(count(lit(1)).as("inject_beacon_procs"))
    val autostarts = runKeyAutostart(edges).select(col("process")).distinct()
      .join(hp, Seq("process")).groupBy(col("trace"))
      .agg(count(lit(1)).as("runkey_procs"))
    hp.groupBy(col("trace")).agg(countDistinct(col("process")).as("n_procs"))
      .join(beacons, Seq("trace"), "left")
      .join(autostarts, Seq("trace"), "left")
      .na.fill(0L)
  }
}
