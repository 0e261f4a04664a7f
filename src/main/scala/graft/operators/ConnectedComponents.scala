package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Transitive closure via alternating large-star / small-star (the public
  * MapReduce CC algorithm of Kiveris et al., "Connected Components in
  * MapReduce and Beyond"). Converges in O(log n) rounds — the reference's
  * recursive NetworkX traversals (`2nd Place/src/snomed_graph.py:212-256`)
  * re-expressed as iterative Dataset joins, per the north rule.
  *
  * Works on string node ids (lexicographic min is the component
  * representative — deterministic, no 64-bit-hash collision risk).
  * Each round `localCheckpoint`s to cut lineage (SURVEY §7.4.4).
  *
  * large-star: for each node u, m = min(Γ(u) ∪ {u}); emit (v, m) ∀v ∈ Γ(u), v > u
  * small-star: orient edges to (max, min); m = min(N(u) ∪ {u}) = min N(u);
  *             emit (v, m) ∀v ∈ N(u) \ {m}, plus (u, m)
  */
object ConnectedComponents {

  /** edges(a, b) → assignment(id, component) for every endpoint. */
  def apply(edgesIn: DataFrame, maxIter: Int = 40)
           (implicit spark: SparkSession): DataFrame = {
    // materialize the input once: cuts whatever upstream plan produced the
    // edges (UDF filters, joins) so the iteration joins against a stable
    // leaf — required for the loop anyway, and avoids re-executing the
    // upstream pipeline for the nodes scan
    val edges0 = edgesIn.select(col("a"), col("b")).localCheckpoint()
    val nodes = edges0.select(col("a").as("id")).toDF("id")
      .union(edges0.select(col("b").as("id")).toDF("id")).distinct()

    var edges = edges0.filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .distinct()
      .localCheckpoint()

    var stable = false
    var iter = 0
    var sig = signature(edges)
    while (!stable && iter < maxIter) {
      val ls = largeStar(edges)
      // LAZY localCheckpoint: the signature aggregation below is the one
      // action that materializes the checkpoint — one pass per round
      // (compute + cache + aggregate), not a checkpoint pass plus a
      // separate count+hash pass
      val ss = smallStar(ls).localCheckpoint(false)
      val newSig = signature(ss)
      stable = newSig == sig
      sig = newSig
      edges = ss
      iter += 1
    }

    // after convergence every edge is (node, root); roots + isolated nodes map to themselves
    val assign = edges.select(col("v"), col("u")).toDF("id", "component")
      .union(edges.select(col("u"), col("u")).toDF("id", "component"))
      .groupBy("id").agg(min(col("component")).as("component"))
    nodes.join(assign, Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
  }

  private def signature(edges: DataFrame): (Long, String) = {
    // decimal(38,0) accumulation: order-independent and ANSI-overflow-safe
    val r = edges.agg(
      count(lit(1)).as("n"),
      coalesce(sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)")), lit(0))
        .cast("string").as("h")).head()
    (r.getLong(0), r.getString(1))
  }

  /** Undirected adjacency as (u, neighbor v). */
  private def adjacency(edges: DataFrame): DataFrame =
    edges.select(col("u"), col("v")).toDF("u", "v")
      .union(edges.select(col("v"), col("u")).toDF("u", "v"))

  private def largeStar(edges: DataFrame): DataFrame = {
    val adj = adjacency(edges)
    val mins = adj.groupBy("u")
      .agg(least(min(col("v")), first(col("u"))).as("m"))
    adj.filter(col("v") > col("u"))
      .join(mins, "u")
      .select(least(col("v"), col("m")).as("u"), greatest(col("v"), col("m")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  private def smallStar(edges: DataFrame): DataFrame = {
    val o = edges.select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
    val mins = o.groupBy("u").agg(min(col("v")).as("m"))
    val reattach = o.join(mins, "u")
      .filter(col("v") =!= col("m"))
      .select(least(col("v"), col("m")).as("u"), greatest(col("v"), col("m")).as("v"))
    val selfToMin = mins.select(col("m"), col("u")).toDF("u", "v")
    reattach.toDF("u", "v").union(selfToMin)
      .filter(col("u") =!= col("v"))
      .distinct()
  }
}
