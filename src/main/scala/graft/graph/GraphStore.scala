package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph persistence (SURVEY §2 A6): nodes/edges as bucketed, sorted
  * managed tables so traversal joins are shuffle-free.
  *
  * At cluster scale the payoff is structural: BFS/CC/motif queries
  * join edges.src ↔ frontier.id every round — with both sides bucketed
  * by the join key into the same bucket count, Spark plans a
  * SortMergeJoin with NO Exchange (verified in GraphStoreSpec by
  * asserting the physical plan has no shuffle).
  */
object GraphStore {

  /** Save nodes/edges as bucketed tables (`<prefix>_nodes`,
    * `<prefix>_edges`). Buckets on the id/src join keys. */
  def save(nodes: DataFrame, edges: DataFrame, prefix: String, buckets: Int = 8): Unit = {
    val spark = nodes.sparkSession
    // a stale managed-table location (e.g. from a killed run) blocks
    // CREATE TABLE even with mode=overwrite — drop table AND location
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    Seq(s"${prefix}_nodes", s"${prefix}_edges", s"${prefix}_edges_rev").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      fs.delete(new org.apache.hadoop.fs.Path(s"$warehouse/$t"), true)
    }
    nodes.write.mode("overwrite")
      .bucketBy(buckets, "id").sortBy("id")
      .saveAsTable(s"${prefix}_nodes")
    // forward + reverse adjacency: traversals key alternately on src
    // and dst, so keep one copy bucketed on each
    edges.write.mode("overwrite")
      .bucketBy(buckets, "src").sortBy("src")
      .saveAsTable(s"${prefix}_edges")
    edges.write.mode("overwrite")
      .bucketBy(buckets, "dst").sortBy("dst")
      .saveAsTable(s"${prefix}_edges_rev")
  }

  def nodes(spark: SparkSession, prefix: String): DataFrame =
    spark.table(s"${prefix}_nodes")

  def edges(spark: SparkSession, prefix: String): DataFrame =
    spark.table(s"${prefix}_edges")

  def edgesRev(spark: SparkSession, prefix: String): DataFrame =
    spark.table(s"${prefix}_edges_rev")

  /** Run any CypherLite statement — reads, `$params`, and `CALL`
    * procedures — over a PERSISTED graph without rebuilding it: the
    * textual surface on top of the bucketed tables. Traversal joins
    * keyed on src ride the bucket layout (no Exchange, as the spec
    * pins for twoHop); CALL procedures get the same frames the Scala
    * API would. */
  def query(spark: SparkSession, prefix: String, cypher: String,
            params: Map[String, Any] = Map.empty): DataFrame =
    CypherLite.run(nodes(spark, prefix), edges(spark, prefix), cypher, params)

  /** WRITE counterpart of [[query]] (r12): run a write or read→write
    * statement against the persisted graph and persist the result
    * back. The reference user's triage statement runs against the
    * stored tables in one call:
    *
    * {{{
    * GraphStore.update(s, "g",
    *   "MATCH (p:Process) WHERE p.image CONTAINS 'powershell' SET p.flag = '1'")
    * }}}
    *
    * Statements with a read stage (`MATCH … WITH … SET/MERGE/…`)
    * route through [[CypherWrite.runComposed]]; plain write
    * statements through [[CypherWrite.mergeOne]] with `params` as the
    * one-row batch.
    *
    * STAGED swap (r13, advice — update used to drop-then-rewrite in
    * place, so a crash mid-write lost the graph): the updated frames
    * are written to `<prefix>__stage_*` tables FIRST — their lazy
    * plans read the live tables, which stay untouched through the
    * whole write — and only then swapped in (drop old, rename staged).
    * The remaining crash window is the swap itself: a failure between
    * drop and rename leaves the data intact under the stage names
    * (recover by renaming manually); a failure any earlier leaves the
    * live tables exactly as they were. Rewrite-on-update is still the
    * honest trade in plain-parquet managed tables (upsert-in-place
    * needs a table format this container doesn't ship); the bucketed
    * layout is preserved for the next read. */
  def update(spark: SparkSession, prefix: String, statement: String,
             params: Map[String, String] = Map.empty,
             buckets: Int = 8): Unit = {
    val n0 = nodes(spark, prefix)
    val e0 = edges(spark, prefix)
    val (n1, e1) =
      if (CypherWrite.isComposed(statement)) {
        require(params.isEmpty,
          "GraphStore.update: composed statements take no params " +
            "(the read stage produces the parameter frame)")
        CypherWrite.runComposed(n0, e0, statement)
      } else CypherWrite.mergeOne(n0, e0, statement, params)
    // persist (recomputable), not localCheckpoint: the edge frame is
    // written twice (fwd + rev) and the source tables stay readable
    // until the swap, so an executor loss mid-write can recompute
    val nC = n1.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val eC = e1.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stage = s"${prefix}__stage"
    save(nC, eC, stage, buckets)
    Seq("nodes", "edges", "edges_rev").foreach { sfx =>
      spark.sql(s"DROP TABLE IF EXISTS ${prefix}_$sfx")
      spark.sql(s"ALTER TABLE ${stage}_$sfx RENAME TO ${prefix}_$sfx")
    }
    nC.unpersist(); eC.unpersist()
  }

  /** Declarative uniqueness validator — the migration aid for the
    * reference's constraint DDL (events.py:60-71 `CREATE CONSTRAINT …
    * REQUIRE n.key IS UNIQUE`). This engine enforces uniqueness BY
    * CONSTRUCTION (groupBy-MERGE keys every upsert), so the validator
    * exists for a migrating user to ASSERT the invariant on any node
    * frame — e.g. externally produced parquet — before trusting joins
    * keyed on it.
    *
    * Checks, per label: (a) `id` is unique within the label; (b) when
    * `prop` is given, the props-map entry agrees with `id` on every row
    * (the reference's key property IS the node id here). Returns the
    * violating (label, id, n) rows — EMPTY means the constraint holds;
    * `strict = true` (default) throws with a bounded sample instead of
    * returning them. One aggregation; no driver materialization beyond
    * the sample. */
  def assertUnique(nodes: DataFrame, label: String, prop: Option[String] = None,
                   strict: Boolean = true): DataFrame = {
    val scoped = nodes.filter(col("label") === label)
    val dup = scoped.groupBy(col("id")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .select(lit(label).as("label"), col("id"), col("n"))
    val mism = prop.map { p =>
      scoped.filter(element_at(col("props"), p).isNotNull &&
          element_at(col("props"), p) =!= col("id"))
        .select(lit(label).as("label"), col("id"), lit(-1L).as("n"))
    }
    val bad = mism.fold(dup)(dup.unionByName(_))
    if (strict) {
      val sample = bad.limit(5).collect()
      require(sample.isEmpty,
        s"uniqueness violated for ($label${prop.map("." + _).getOrElse("")}): " +
          sample.map(r => s"${r.get(1)}(n=${r.get(2)})").mkString(", ") +
          (if (sample.length == 5) ", …" else ""))
    }
    bad
  }

  /** Bucket-aligned 2-hop expansion: reverse copy (bucketed on dst)
    * joined to the forward copy (bucketed on src) — same bucket count
    * on both join keys, so the SortMergeJoin needs no Exchange. */
  def twoHop(spark: SparkSession, prefix: String): DataFrame =
    edgesRev(spark, prefix).select(col("src").as("a"), col("dst").as("b"))
      .join(edges(spark, prefix).select(col("src").as("b2"), col("dst").as("c")),
        col("b") === col("b2"))
      .select(col("a"), col("b"), col("c"))
}
