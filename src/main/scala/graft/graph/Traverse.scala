package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fluent Cypher-style traversal over an edge frame — the DataFrame
  * equivalent of `MATCH (a)-[:SPAWNS*1..3]->(m)-[:CREATED_FILE]->(f)
  * WHERE … RETURN a, f`:
  *
  * {{{
  * Traverse.from(edges, roots)            // (start)
  *   .out("SPAWNS", 1 to 3)               // -[:SPAWNS*1..3]->
  *   .out("CREATED_FILE")                 // -[:CREATED_FILE]->
  *   .where(col("cur").endsWith(".exe"))
  *   .pairs                               // DataFrame(start, cur)
  * }}}
  *
  * Each single hop is one equi-join; a variable-length hop is a
  * bounded BFS accumulating distinct (start, cur) pairs — no driver
  * materialization, identical shape at any scale.
  */
final class Traverse private (edges: DataFrame, state: DataFrame) {

  private def step(rel: DataFrame): DataFrame =
    state.join(rel, state("cur") === rel("_src"))
      .select(col("start"), rel("_dst").as("cur"))
      .distinct()

  private def rel(etype: String, reverse: Boolean): DataFrame = {
    val e = edges.filter(col("etype") === etype)
    if (reverse) e.select(col("dst").as("_src"), col("src").as("_dst"))
    else e.select(col("src").as("_src"), col("dst").as("_dst"))
  }

  /** One hop along `etype` edges. */
  def out(etype: String): Traverse = new Traverse(edges, step(rel(etype, reverse = false)))

  /** One reverse hop (`<-[:etype]-`). */
  def in(etype: String): Traverse = new Traverse(edges, step(rel(etype, reverse = true)))

  /** Variable-length hop: `-[:etype*min..max]->`. */
  def out(etype: String, hops: Range): Traverse = varHop(hops, reverse = false, etype)

  /** Variable-length reverse hop. */
  def in(etype: String, hops: Range): Traverse = varHop(hops, reverse = true, etype)

  private def varHop(hops: Range, reverse: Boolean, etype: String): Traverse = {
    require(hops.start >= 0 && hops.end >= hops.start, s"bad hop range $hops")
    val r = rel(etype, reverse).persist()
    var cur = state
    var acc: DataFrame = if (hops.start == 0) state else null
    for (h <- 1 to hops.end) {
      cur = cur.join(r, cur("cur") === r("_src"))
        .select(col("start"), r("_dst").as("cur"))
        .distinct()
        .localCheckpoint()
      if (h >= hops.start) acc = if (acc == null) cur else acc.unionByName(cur).distinct()
    }
    r.unpersist()
    new Traverse(edges, acc.localCheckpoint())
  }

  /** Filter current endpoints. `col("cur")` addresses the node id. */
  def where(pred: Column): Traverse = new Traverse(edges, state.filter(pred))

  /** All (start, cur) endpoint pairs. */
  def pairs: DataFrame = state

  /** Distinct reachable endpoints. */
  def ends: DataFrame = state.select(col("cur")).distinct()

  /** Distinct start nodes with at least one surviving path. */
  def starts: DataFrame = state.select(col("start")).distinct()
}

object Traverse {
  /** Begin at `starts` (a frame whose FIRST column holds node ids). */
  def from(edges: DataFrame, starts: DataFrame): Traverse = {
    val idCol = starts.columns.head
    new Traverse(edges,
      starts.select(col(idCol).as("start"), col(idCol).as("cur")).distinct())
  }
}
