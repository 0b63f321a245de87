package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-analysis over edge lists — the graph tier a curation pipeline
  * reaches for when document/source relationships matter (site-level
  * quality propagation, citation weighting). Spark-first shape: the
  * graph IS a DataFrame of edges; each iteration is one equi-join +
  * one aggregation, i.e. two shuffles on the node key, and nothing
  * ever collects beyond a single scalar (the node count). Power-law
  * degree skew is AQE's skew-join case, not a custom path.
  */
object Graph {

  /** PageRank (Page et al. 1999) by synchronous power iteration.
    *
    * `edges` must carry `src`/`dst` node-id columns. Every node must
    * appear as a `src` at least once (an undirected graph encoded as
    * both directions satisfies this for free); dangling nodes would
    * need the standard leaked-mass redistribution, which this minimal
    * form deliberately omits — callers encode undirected.
    *
    * Per-iteration ranks are rounded to `scale` decimals so the fold
    * is reproducible across engines and partitionings (the oracle
    * replays the same rounded fixpoint); contributions are summed by
    * hash aggregation, whose ulp-level order noise sits far below the
    * rounding grid.
    *
    * Scale shape: rank state is one row per node, each iteration is
    * edges⋈ranks (shuffle on src) + groupBy(dst) (shuffle on node) +
    * a join back to the node list. Each iteration's state is an EAGER
    * localCheckpoint: persist() alone truncates execution but not the
    * LOGICAL plan, and a growing-plan power iteration spends more
    * time in the analyzer/plan-stringification than in the data
    * (observed: 20 iterations unbounded) — checkpointing is the
    * standard Spark idiom for iterative algorithms.
    */
  def pageRank(edges: DataFrame, iters: Int, damping: Double = 0.85,
      scale: Int = 8): DataFrame = {
    require(iters >= 1, s"pageRank needs >= 1 iteration, got $iters")
    val nodes = edges.select(col("src").as("node")).distinct()
      .localCheckpoint()
    val outDeg = edges.groupBy("src").agg(count(lit(1)).as("__deg"))
      .localCheckpoint()
    val n = nodes.count() // the one driver scalar: |V|, bounded by design
    require(n > 0, "pageRank got an empty edge list")
    val teleport = (1.0 - damping) / n
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .join(outDeg, "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") / col("__deg")).as("__cs"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          round(lit(teleport) + lit(damping) * coalesce(col("__cs"), lit(0.0)),
            scale).as("rank"))
        .localCheckpoint() // eager: truncates lineage AND materializes
    }
    ranks
  }

  /** Multi-source BFS hop distances, capped at `maxHops`.
    *
    * `sources` carries one `node` column; output is (node, dist) for
    * every node within `maxHops` hops of any source, dist = the FIRST
    * hop that reached it. Frontier form: each hop is one equi-join of
    * the edges with the previous frontier plus one anti-join against
    * the visited set — never a re-walk of the whole reachable set, so
    * a hop's cost is proportional to the frontier it expands, the
    * textbook Pregel shape. Early-exits when a frontier is empty.
    * Same localCheckpoint-per-step discipline as [[pageRank]] (an
    * iterative plan that keeps growing spends more time in the
    * analyzer than the data). */
  def bfsDistances(edges: DataFrame, sources: DataFrame,
      maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    var dist = sources.select(col("node")).distinct()
      .withColumn("dist", lit(0)).localCheckpoint()
    var frontier = dist
    var h = 1
    var done = maxHops == 0
    while (!done) {
      val next = edges
        .join(frontier.select(col("node").as("src")), "src")
        .select(col("dst").as("node")).distinct()
        .join(dist.select("node"), Seq("node"), "left_anti")
        .withColumn("dist", lit(h))
        .localCheckpoint()
      if (next.isEmpty) done = true
      else {
        dist = dist.unionByName(next).localCheckpoint()
        frontier = next
        h += 1
        if (h > maxHops) done = true
      }
    }
    dist
  }
}
