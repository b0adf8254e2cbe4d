package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deterministic graphs derived from the testdata star schema, used to
  * exercise the graph operators against a DuckDB oracle (the driver can
  * recompute the same edges with plain SQL).
  *
  * - `hierarchy`: the region→nation→customer→order forest (directed,
  *   arbitrary-depth traversals are BFS over it).
  * - `partSupplier`: the bipartite part—supplier co-occurrence graph from
  *   lineitem, sparsified deterministically (`l_partkey % 20 == 0`) so
  *   closure-style oracles stay bounded.
  *
  * Vertex ids are namespaced strings ("r:0", "n:3", "c:42", "o:17",
  * "p:20", "s:5") — ASCII, so Spark and DuckDB order them identically.
  */
object TestGraph {

  def hierarchyEdges(s: SparkSession, dir: String): DataFrame = {
    val rn = Tables.nation(s, dir).select(
      concat(lit("r:"), col("n_regionkey")).as("src"),
      concat(lit("n:"), col("n_nationkey")).as("dst"))
    val nc = Tables.customer(s, dir).select(
      concat(lit("n:"), col("c_nationkey")).as("src"),
      concat(lit("c:"), col("c_custkey")).as("dst"))
    val co = Tables.orders(s, dir).select(
      concat(lit("c:"), col("o_custkey")).as("src"),
      concat(lit("o:"), col("o_orderkey")).as("dst"))
    rn.unionByName(nc).unionByName(co)
  }

  def partSupplierEdges(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_partkey") % 20 === 0)
      .select(concat(lit("p:"), col("l_partkey")).as("src"),
              concat(lit("s:"), col("l_suppkey")).as("dst"))
      .distinct()

  /** Part co-purchase graph: an (undirected, id-canonical src < dst)
    * edge between two parts whenever they appear in the same order.
    * Unlike the bipartite part—supplier graph this one has triangles,
    * so it exercises closure-style analytics. */
  def coPurchaseEdges(s: SparkSession, dir: String): DataFrame = {
    val lp = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    lp.alias("a").join(lp.alias("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p").as("src"), col("b.p").as("dst"))
      .distinct()
  }

  /** Supply-chain DAG: region→nation→customer→order→part→supplier.
    * Acyclic BY CONSTRUCTION (the six namespaces are stage-ordered and
    * every edge crosses one stage forward), multi-parent from the
    * order→part stage on (a part sits in many orders), so longest-path
    * layering is non-trivial. The o→p/p→s stages reuse the
    * `l_partkey % 20` sparsifier so closure oracles stay bounded. */
  def supplyChainDagEdges(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).filter(col("l_partkey") % 20 === 0)
    hierarchyEdges(s, dir)
      .unionByName(li.select(concat(lit("o:"), col("l_orderkey")).as("src"),
        concat(lit("p:"), col("l_partkey")).as("dst")).distinct())
      .unionByName(li.select(concat(lit("p:"), col("l_partkey")).as("src"),
        concat(lit("s:"), col("l_suppkey")).as("dst")).distinct())
  }

  /** Weighted part—supplier edges: weight is a deterministic small
    * integer derived from the endpoint keys (1..5), so hop-bounded
    * shortest-path oracles stay enumerable. */
  def weightedPartSupplierEdges(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_partkey") % 20 === 0)
      .select(concat(lit("p:"), col("l_partkey")).as("src"),
              concat(lit("s:"), col("l_suppkey")).as("dst"),
              (pmod(col("l_partkey") + col("l_suppkey"), lit(5)) + 1)
                .cast("bigint").as("w"))
      .distinct()

  /** Sparser weighted part—supplier graph for the MST gate (r13): the
    * cycle-property DuckDB oracle walks per-edge lighter-than
    * reachability, so the gate graph adds a supplier sparsifier.
    * `% 3` (not `% 5`): 20 and 5 share the factor 5, so a `% 5`
    * supplier filter would collapse every (partkey + suppkey) % 5
    * weight to the same residue — degenerate uniform weights. */
  def mstEdges(s: SparkSession, dir: String): DataFrame =
    weightedPartSupplierEdges(s, dir)
      .filter(substring(col("dst"), 3, 100).cast("int") % 3 === 0)

  /** Sparse part—supplier subgraph with real cut structure (r13): at
    * `l_suppkey % 7` the graph develops articulation points and
    * bridges (3 APs / 4 bridges at sf0.01, 56 / 70 at sf0.1 — the
    * denser variants are 2-edge-connected, which would make the
    * B37 gates vacuous). */
  def cutEdges(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_partkey") % 20 === 0 && col("l_suppkey") % 7 === 0)
      .select(concat(lit("p:"), col("l_partkey")).as("src"),
              concat(lit("s:"), col("l_suppkey")).as("dst"))
      .distinct()
}
