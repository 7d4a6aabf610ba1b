package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Staging

/** Power-iteration PageRank (Brin & Page 1998; damping 0.85, dangling
  * mass redistributed uniformly) over an undirected candidate-pair
  * graph — ONE implementation of the rank arithmetic, shared by the
  * batch query (q131) and the streaming edge-state re-rank (q144,
  * [[graft.streaming.PageRankStream]]), so the streamed graph provably
  * answers the batch oracle.
  *
  * Deterministic cross-engine because ranks live on a 1e-9 integer
  * grid: every division (contribution r/deg, dangling share, the damped
  * update) is ONE IEEE op on exact BIGINTs rounded straight back to the
  * grid, and every per-node inflow is an exact integer sum — the DuckDB
  * oracle unrolls the iterations as a CTE chain. The two execution
  * strategies below are arithmetic-identical (the same expressions over
  * the same exact integers), so the choice never touches results.
  *
  * Scale shape: an iteration is two keyed joins plus one keyed
  * aggregation — edge- and node-sized shuffles, no broadcast mandate on
  * anything corpus-sized. The node count is a bounded-scalar collect
  * re-entered as a constant-folded literal; the per-iteration dangling
  * mass is a 1-row aggregate riding a broadcast (lazy mode) or a
  * collected literal (staged mode).
  */
object PageRank {

  /** Fixed iteration count — the replayable statistic (a convergence
    * test could not be unrolled by the oracle). */
  val iters = 3

  /** Ranks over `nodes0` (one `doc_id` per vertex, isolated vertices
    * included) given undirected candidate `pairs` (doc_a, doc_b).
    *
    * @param stageIterations execution strategy, measured per calling
    *   context (arithmetic identical either way). `false` — ONE lazy
    *   plan over the staged inputs, dangling mass as broadcast 1-row
    *   subframes; fastest everywhere measured since the folds started
    *   releasing their dead staged blocks (q131 standalone: 5.5 s →
    *   3.5 s at sf0.1; q144's post-fold re-rank: lazy 1.5 s vs staged
    *   7.0 s — the staged mode's earlier in-context win was executor-
    *   storage pressure from dead fold blocks taxing the lazy plan's
    *   exchange-reuse materializations, gone once Staging.release ran
    *   at fold end). `true` — checkpoint the rank frame each iteration
    *   and collect the dangling mass as a scalar; kept as the bounded-
    *   memory strategy for graphs whose per-iteration frame outgrows
    *   what one lazy plan should hold live at once.
    * @return (doc_id, pr) — pr is the 1e-9 grid point emitted at 9 dp
    *   (8 dp would sit ON the .5 boundary for odd grid values and
    *   diverge between decimal and binary rounding) */
  def ranks(nodes0: DataFrame, pairs: DataFrame,
            stageIterations: Boolean = false): DataFrame = {
    val edges = Staging.stage(
      pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .unionByName(
          pairs.select(col("doc_b").as("src"), col("doc_a").as("dst"))))
    val outd = Staging.stage(
      edges.groupBy("src").agg(count(lit(1)).as("deg")))
    // the edge ⋈ degree join is ITERATION-INVARIANT — staged once, each
    // iteration pays ONE edge-sized join (vs two) against the rank
    // frame. (Round 13 measured-and-rejected this hoist, but under a
    // count()-shaped consumer whose column pruning had deleted the rank
    // arithmetic being measured; against the real materialized plan the
    // hoist is worth ~1/3 of the re-rank.)
    val edgesW = Staging.stage(edges.join(outd, Seq("src")))
    val nodes = Staging.stage(nodes0.select("doc_id"))
    val nd = nodes.count() // bounded scalar: the vertex count
    var r = Staging.stage(nodes.select(col("doc_id"),
      round(lit(1e9) / lit(nd)).cast("long").as("r")))
    for (_ <- 1 to iters) {
      // dangling mass: ranks of vertices with no out-edges — a 1-row
      // exact integer aggregate
      val dangDf = r.join(outd, r("doc_id") === outd("src"), "left_anti")
        .agg(coalesce(sum("r"), lit(0L)).as("dang"))
      val dangCol =
        if (stageIterations) lit(dangDf.head().getLong(0))
        else col("dang")
      val inflow = edgesW
        .join(r, edgesW("src") === r("doc_id"))
        .select(col("dst"),
          round(col("r").cast("double") / col("deg")).cast("long").as("w"))
        .groupBy("dst").agg(sum("w").cast("long").as("w"))
      val next = nodes
        .join(inflow, nodes("doc_id") === inflow("dst"), "left")
      val withDang =
        if (stageIterations) next else next.crossJoin(broadcast(dangDf))
      val updated = withDang.select(nodes("doc_id"),
        (round(lit(0.15) * lit(1e9) / lit(nd)).cast("long") +
          round(lit(0.85) * (coalesce(col("w"), lit(0L)) +
            round(dangCol.cast("double") / lit(nd)).cast("long")))
            .cast("long")).as("r"))
      if (stageIterations) {
        val prev = r
        r = Staging.stage(updated)
        // the previous iteration's rank blocks are dead the moment the
        // new checkpoint exists (only `r` is ever read again); released
        // per-iteration so the fixpoint holds ONE rank frame in executor
        // storage, not `iters`. Staged-mode only: lazy-mode intermediates
        // share the staged edge/node blocks, which stay live.
        Staging.release(prev)
      } else r = updated
    }
    if (stageIterations) Staging.release(edges, outd, edgesW, nodes)
    r.select(col("doc_id"),
      round(col("r").cast("double") / lit(1e9), 9).as("pr"))
  }
}
