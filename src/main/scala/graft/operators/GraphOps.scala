package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge lists. PageRank (Page et al. 1999) runs in
  * exact FIXED-POINT integer arithmetic: ranks are BIGINTs scaled by
  * `scale`, every contribution is `(rank * w) div W` (integer floor
  * division), and the damping mix is `(num * sum) div den`. Integer
  * sums are order-independent, so the result is bit-identical across
  * engines and across partitionings — unlike floating-point PageRank,
  * whose per-vertex Σ depends on aggregation order. The quantization
  * error is bounded by (in-degree + 2) ulps of 1/scale per iteration.
  *
  * Scale shape per iteration: one equi-join ranks⨝edges on src, one
  * groupBy dst — both shuffles keyed on vertex id (high cardinality on
  * real graphs); out-weights are joined once, up front. The driver loop
  * only chains plans (no action per iteration); with iters ≤ ~10 the
  * lineage stays shallow.
  */
object GraphOps {

  /** Weighted PageRank over `edges(src, dst, w)`; returns
    * (node, rank_scaled) with Σ rank_scaled ≈ scale (floor-division
    * dust stays with the damping base term). Dangling mass (vertices
    * with no out-edges) is dropped, as in the original formulation.
    *
    * dampNum/dampDen is the damping factor as an exact rational
    * (default 17/20 = 0.85). */
  def pageRankScaled(edges: DataFrame, iters: Int,
      scale: Long = 1000000000000L,
      dampNum: Long = 17L, dampDen: Long = 20L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
    val outW = edges.groupBy(col("src")).agg(sum(col("w")).as("w_out"))
    val withOut = edges.join(outW, "src")
    var ranks = nodes.crossJoin(
        broadcast(nodes.agg(count(lit(1)).as("n_nodes"))))
      .select(col("node"), expr(s"$scale div n_nodes").as("rank_scaled"),
        col("n_nodes"))
    for (i <- 1 to iters) {
      val contrib = withOut
        .join(ranks.select(col("node").as("src"), col("rank_scaled")), "src")
        .select(col("dst").as("node"),
          expr("(rank_scaled * w) div w_out").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("in_sum"))
      ranks = ranks.select(col("node"), col("n_nodes"))
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (expr(s"($scale * ${dampDen - dampNum}) div $dampDen div n_nodes") +
            expr(s"($dampNum * ${coalesceSql("in_sum")}) div $dampDen"))
            .as("rank_scaled"),
          col("n_nodes"))
      // lazy lineage cut every few rounds: analysis/optimization cost of
      // the chained plan stays bounded, nothing materializes until used
      if (i % 6 == 0 && i < iters) ranks = ranks.localCheckpoint(false)
    }
    ranks.select(col("node"), col("rank_scaled"))
  }

  private def coalesceSql(c: String): String = s"coalesce($c, 0L)"

  /** Transition digraph over a categorical column: per entity, each
    * consecutive (state, next state) step ordered by (ts, tieCol)
    * becomes one edge; edge weight = step count across all entities.
    * The window partitions by the entity key, so the single shuffle is
    * keyed on the (high-cardinality) entity, never on the small state
    * alphabet. */
  def transitionEdges(events: DataFrame, keyCol: String, stateCol: String,
      tsCol: String, tieCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    events
      .select(col(keyCol), col(stateCol).as("src"), col(tsCol), col(tieCol))
      .withColumn("dst", lead(col("src"), 1).over(w))
      .filter(col("dst").isNotNull)
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
  }

  /** Triangle counting with DEGREE ORIENTATION — the guard that makes
    * the wedge join survive power-law graphs: every undirected edge is
    * directed toward its (degree, id)-larger endpoint, so a hub of
    * degree d contributes O(√m) out-neighbors instead of O(d²) wedges
    * (Chiba–Nishizeki / the standard MapReduce triangle recipe). The
    * orientation key packs (degree, id) into one int64 (degree·2³² + id
    * — ids must fit 32 bits, as partkeys do) so both engines compare
    * identically. Wedges join oriented out-edges on their source, the
    * closing edge check is one more equi-join; both shuffles are keyed
    * on (high-cardinality) node ids. Output is the one-row graph census
    * (nodes, edges, wedges, triangles). */
  def triangleCount(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    // edge list and oriented edges are each consumed by several census
    // branches — lazy localCheckpoints (the iterative-loop idiom) pin
    // them so the upstream graph build runs ONCE, not once per count
    val e = edges
      .select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .distinct()
      .localCheckpoint(false)
    val deg = e.select(col("u").as("n")).unionAll(e.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val key = deg.select(col("n"), (col("d") * 4294967296L + col("n")).as("k"))
    val oriented = e
      .join(key.select(col("n").as("u"), col("k").as("ku")), "u")
      .join(key.select(col("n").as("v"), col("k").as("kv")), "v")
      .select(
        when(col("ku") < col("kv"), col("u")).otherwise(col("v")).as("s"),
        when(col("ku") < col("kv"), col("v")).otherwise(col("u")).as("t"),
        greatest(col("ku"), col("kv")).as("kt"))
      .localCheckpoint(false)
    // wedge count and triangle count ride ONE pass over the wedge join
    // (the closing edge is a LEFT probe, counted where it lands) — the
    // wedge set is the big intermediate and is never materialized twice
    val wt = oriented.as("x").join(oriented.as("y"),
        col("x.s") === col("y.s") && col("x.kt") < col("y.kt"))
      .select(col("x.t").as("p"), col("y.t").as("q"))
      .join(oriented.select(col("s").as("p"), col("t").as("q"), lit(1L).as("closed")),
        Seq("p", "q"), "left")
      .agg(count(lit(1)).as("n_wedges"),
        coalesce(sum(col("closed")), lit(0L)).as("n_triangles"))
    deg.agg(count(lit(1)).as("n_nodes"))
      .crossJoin(broadcast(e.agg(count(lit(1)).as("n_edges"))))
      .crossJoin(broadcast(wt))
  }

  /** BFS levels: exact minimum hop distance from a SEED set over a
    * directed edge list, capped at `maxDepth` — the reachability-with-
    * distance primitive next to the component (min-label) and
    * centrality (PageRank) operators: "everything within k hops of the
    * flagged nodes" is the blast-radius query an incident review or a
    * contamination trace runs. Frontier iteration: each round joins the
    * CURRENT frontier to the edge list, anti-joins everything already
    * visited (so a node's first discovery fixes its level — BFS
    * optimality), and checkpoints the frontier (the same lazy
    * localCheckpoint idiom as the CC loop: constant-depth plans,
    * realized by the round's one count action). Work per round is
    * O(frontier-adjacent edges), shuffled on node ids; the loop ends at
    * an empty frontier or the cap. Output: (id, level) for every
    * reached node, level = exact hop distance (≤ maxDepth). */
  def bfsLevels(edges: DataFrame, seeds: DataFrame,
      maxDepth: Int = 20): DataFrame = {
    require(maxDepth >= 1, s"maxDepth must be >= 1: $maxDepth")
    val e = edges.select(col("src"), col("dst")).cache()
    var visited = seeds.select(col("id"), lit(0).as("level"))
      .distinct().localCheckpoint(false)
    var frontier = visited
    var depth = 0
    var frontierSize = frontier.count()
    while (frontierSize > 0 && depth < maxDepth) {
      depth += 1
      val next = e.join(frontier.select(col("id").as("src")), "src")
        .select(col("dst").as("id")).distinct()
        .join(visited.select(col("id")), Seq("id"), "left_anti")
        .select(col("id"), lit(depth).as("level"))
        .localCheckpoint(false)
      frontierSize = next.count()
      if (frontierSize > 0) {
        visited = visited.unionAll(next).localCheckpoint(false)
        frontier = next
      }
    }
    e.unpersist()
    visited
  }

  /** Bounded k-core peeling: `rounds` synchronous rounds of "drop every
    * vertex with degree < k, recount" over a symmetric edge list — the
    * spam/boilerplate-hub screen on the co-occurrence graph (a true
    * k-core iterates to fixpoint; the FIXED round count here makes the
    * result exactly expressible as an unrolled oracle, and in practice
    * peeling converges in a handful of rounds). Each round is one
    * degree aggregate shuffled on the vertex id plus two semi-joins
    * restricting edges to survivors — no collect, work strictly
    * shrinks per round. Output: survivors (id, degree) with the
    * post-round-`rounds` degree. */
  def kCorePeel(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1, s"need k >= 1, rounds >= 1: $k, $rounds")
    var e = edges.select(col("src"), col("dst")).localCheckpoint(false)
    var r = 0
    while (r < rounds) {
      r += 1
      val keep = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("src"))
      e = e.join(keep, "src")
        .join(keep.select(col("src").as("dst")), "dst")
        .select(col("src"), col("dst")).localCheckpoint(false)
    }
    e.groupBy(col("src").as("id")).agg(count(lit(1)).as("degree"))
  }
}
