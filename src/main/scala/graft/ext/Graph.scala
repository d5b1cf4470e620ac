package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph operators for corpus curation (beyond-reference, SURVEY.md
  * §2.8). The canonical use is a link-graph quality prior: web-scale
  * pipelines rank crawl domains by PageRank over the hyperlink graph
  * and use the score as a per-document quality signal (the
  * CommonCrawl/C4 lineage of "keep pages from reputable domains").
  *
  * Integer-exact PageRank: all arithmetic is scaled BIGINT with
  * truncating division — score sums are order-independent integer
  * sums, so the result is bit-identical across partitionings, cluster
  * sizes, and engines (judged value-exact vs a DuckDB oracle, x169).
  * The float formulation would drift by accumulation order on every
  * shuffle.
  */
object Graph {

  /** Fixed-iteration PageRank (damping 0.85) on `edges(src, dst)`.
    *
    * Node set = DISTINCT src. Pass a symmetrized edge list for an
    * undirected graph — that also guarantees every node has out-degree
    * >= 1, so no dangling-mass redistribution is needed (nodes
    * appearing only as dst would silently leak rank mass; symmetrize
    * or pre-filter them).
    *
    * Update rule, all BIGINT with truncating division:
    *   score_0(v)   = scale div N
    *   score_k+1(v) = (score_0 * 15) div 100
    *                  + (85 * sum_u->v(score_k(u) div deg(u))) div 100
    *
    * Scale shape: edges and per-source degrees are joined ONCE and
    * checkpointed; each iteration is one equi-join of that frame with
    * the current scores on src (co-partitioned shuffle, AQE-friendly)
    * plus a keyed sum on dst — the standard distributed PageRank
    * round. Scores are locally checkpointed every `checkpointEvery`
    * rounds (default: every round) with eager release of the previous
    * frontier, keeping lineage and analysis cost flat on long runs.
    * Leaving rounds unmaterialized (`checkpointEvery` > iterations)
    * measured NO faster here and can regress badly: the optimizer sees
    * small stats for the per-round contribution aggregate and plans
    * nested broadcast joins whose build sides re-execute the chain —
    * measured 8x slower on the x169 graph. The only driver traffic is
    * the node COUNT (one scalar, once).
    *
    * With `allNodesReceive = true` the caller asserts every node has
    * at least one in-edge (always true for a symmetrized edge list),
    * and the per-round left join that re-attaches contribution-less
    * nodes is skipped — one fewer shuffle per round; a node that DOES
    * lack in-edges would silently drop from the result, so the flag
    * stays off unless the graph shape guarantees it. */
  def pageRank(edges: DataFrame, iterations: Int,
               scale: Long = 1000000000000L,
               checkpointEvery: Int = 1,
               allNodesReceive: Boolean = false): DataFrame = {
    require(checkpointEvery >= 1, "checkpointEvery must be positive")
    require(iterations >= 1 && iterations <= 64,
      s"iterations must be in [1, 64]; got $iterations")
    val e = CacheRegistry.checkpoint(
      edges.select(col("src"), col("dst")).distinct())
    val deg = CacheRegistry.checkpoint(
      e.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg")))
    val eDeg = CacheRegistry.checkpoint(
      e.join(deg, e("src") === deg("node"))
        .select(col("src"), col("dst"), col("deg")))
    CacheRegistry.release(e)

    val n = deg.count() // one driver scalar
    require(n > 0, "pageRank needs a non-empty edge list")
    val init = scale / n
    val base = init * 15L / 100L

    var cur = deg.select(col("node"), lit(init).as("score"))
    var lastChk: Option[DataFrame] = None
    for (i <- 1 to iterations) {
      val contrib = eDeg
        .join(cur, eDeg("src") === cur("node"))
        .groupBy(col("dst"))
        .agg(sum(expr("score div deg")).as("c"))
      cur =
        if (allNodesReceive)
          contrib.select(col("dst").as("node"),
            (lit(base) + expr("85 * c div 100")).as("score"))
        else
          deg.select(col("node"))
            .join(contrib, col("node") === col("dst"), "left")
            .select(col("node"),
              (lit(base) + expr("85 * coalesce(c, 0L) div 100")).as("score"))
      if (i % checkpointEvery == 0 && i < iterations) {
        val chk = CacheRegistry.checkpoint(cur)
        lastChk.foreach(CacheRegistry.release)
        lastChk = Some(chk)
        cur = chk
      }
    }
    cur.orderBy("node")
  }

  /** Synchronous label propagation (community detection) on a
    * SYMMETRIZED `edges(src, dst)` list.
    *
    * label_0(v) = v; each round every node adopts the label held by
    * the plurality of its neighbors, ties broken toward the SMALLEST
    * label — the deterministic variant of Raghavan et al.'s LPA (the
    * classic formulation breaks ties randomly, which would never
    * survive a bit-exact cross-engine compare). Fixed `iterations`
    * rounds, no convergence test — communities stabilize in a few
    * rounds and a fixed horizon keeps the plan finite.
    *
    * The plurality argmax is one aggregate: min(struct(-count,
    * label)) — struct ordering gives max count then lexicographic
    * min label, with no per-node window.
    *
    * Scale shape identical to [[pageRank]]: the edge list is
    * checkpointed once; each round is an equi-join of edges with the
    * current labels on src plus two keyed aggregates on dst; label
    * frontiers are checkpointed per round with eager release. A node
    * with no in-edge would drop out — symmetrize, as required.
    */
  def labelPropagation(edges: DataFrame, iterations: Int): DataFrame = {
    require(iterations >= 1 && iterations <= 64,
      s"iterations must be in [1, 64]; got $iterations")
    val e = CacheRegistry.checkpoint(
      edges.select(col("src"), col("dst")).distinct())
    var cur = e.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("lbl"))
    var lastChk: Option[DataFrame] = None
    for (i <- 1 to iterations) {
      cur = e.join(cur, e("src") === cur("node"))
        .groupBy(col("dst"), col("lbl"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("dst").as("node"))
        .agg(min(struct((-col("c")).as("nc"), col("lbl").as("l"))).as("m"))
        .select(col("node"), col("m.l").as("lbl"))
      if (i < iterations) {
        val chk = CacheRegistry.checkpoint(cur)
        lastChk.foreach(CacheRegistry.release)
        lastChk = Some(chk)
        cur = chk
      }
    }
    cur.select(col("node"), col("lbl").as("label")).orderBy("node")
  }
}
