package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph traversal as iterative Dataset joins (SURVEY §2.10).
  *
  * The reference walks its SNOMED DiGraph recursively in NetworkX
  * (`2nd Place/src/snomed_graph.py:212-256` get_descendants/get_ancestors);
  * here the graph stays a relation and each BFS level is one equi-join,
  * `localCheckpoint` per round to cut lineage — the same skeleton as the
  * large-star/small-star clustering.
  */
object Graph {

  /** Full ancestor closure: edges (child, parent) → (node, ancestor) pairs
    * for every node with at least one ancestor. BFS over levels; O(depth)
    * rounds. */
  def ancestorClosure(edges: DataFrame, maxIter: Int = 64)
                     (implicit spark: SparkSession): DataFrame = {
    val e = edges.select(col("child"), col("parent")).localCheckpoint()
    var frontier = e.select(col("child").as("node"), col("parent").as("anc"))
      .distinct().localCheckpoint()
    var acc = frontier
    var iter = 0
    var done = frontier.isEmpty
    while (!done && iter < maxIter) {
      // next level: (node, anc) ⋈ (anc=child, parent) → (node, parent)
      val next = frontier.join(e, frontier("anc") === e("child"))
        .select(frontier("node"), e("parent").as("anc"))
        .distinct()
        .exceptAll(acc).distinct()
        .localCheckpoint()
      done = next.isEmpty
      if (!done) {
        acc = acc.union(next).distinct().localCheckpoint()
        frontier = next
      }
      iter += 1
    }
    acc
  }

  /** G2 descendants of `roots`: nodes whose ancestor closure contains the
    * root. */
  def descendants(edges: DataFrame, roots: DataFrame)
                 (implicit spark: SparkSession): DataFrame =
    ancestorClosure(edges)
      .join(roots.select(col("root")), col("anc") === col("root"))
      .select(col("root"), col("node").as("descendant"))
      .distinct()

  /** G4: isolate removal — nodes that appear in no edge. */
  def removeIsolates(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val endpoints = edges.select(col("child").as("id"))
      .union(edges.select(col("parent").as("id"))).distinct()
    nodes.join(endpoints, Seq("id"), "left_semi")
  }
}
