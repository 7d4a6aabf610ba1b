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
  * oracle unrolls the iterations as a CTE chain.
  *
  * Scale shape: an iteration is two keyed joins plus one keyed
  * aggregation — edge- and node-sized shuffles, no broadcast mandate on
  * anything corpus-sized. The node count and the per-iteration dangling
  * mass are BOUNDED SCALARS (1 row each) collected to the driver and
  * re-entered as literals — the k-centroids discipline — which Catalyst
  * constant-folds, so the fold-in costs nothing per row and drops the
  * per-iteration broadcast-evaluation jobs the first version paid. The
  * rank frame is staged per iteration so plans stay bounded.
  */
object PageRank {

  /** Fixed iteration count — the replayable statistic (a convergence
    * test could not be unrolled by the oracle). */
  val iters = 3

  /** Ranks over `nodes0` (one `doc_id` per vertex, isolated vertices
    * included) given undirected candidate `pairs` (doc_a, doc_b).
    * @return (doc_id, pr) — pr is the 1e-9 grid point emitted at 9 dp
    *   (8 dp would sit ON the .5 boundary for odd grid values and
    *   diverge between decimal and binary rounding) */
  def ranks(nodes0: DataFrame, pairs: DataFrame): DataFrame = {
    val edges = Staging.stage(
      pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .unionByName(
          pairs.select(col("doc_b").as("src"), col("doc_a").as("dst"))))
    val outd = Staging.stage(
      edges.groupBy("src").agg(count(lit(1)).as("deg")))
    val nodes = Staging.stage(nodes0.select("doc_id"))
    val nd = nodes.count() // bounded scalar: the vertex count
    var r = Staging.stage(nodes.select(col("doc_id"),
      round(lit(1e9) / lit(nd)).cast("long").as("r")))
    for (_ <- 1 to iters) {
      // dangling mass: ranks of vertices with no out-edges — a 1-row
      // exact integer aggregate, collected and re-entered as a literal
      val dang = r.join(outd, r("doc_id") === outd("src"), "left_anti")
        .agg(coalesce(sum("r"), lit(0L)).as("dang")).head().getLong(0)
      val inflow = edges
        .join(r, edges("src") === r("doc_id"))
        .join(outd, Seq("src"))
        .select(col("dst"),
          round(col("r").cast("double") / col("deg")).cast("long").as("w"))
        .groupBy("dst").agg(sum("w").cast("long").as("w"))
      r = Staging.stage(nodes
        .join(inflow, nodes("doc_id") === inflow("dst"), "left")
        .select(nodes("doc_id"),
          (round(lit(0.15) * lit(1e9) / lit(nd)).cast("long") +
            round(lit(0.85) * (coalesce(col("w"), lit(0L)) +
              round(lit(dang).cast("double") / lit(nd)).cast("long")))
              .cast("long")).as("r")))
    }
    r.select(col("doc_id"),
      round(col("r").cast("double") / lit(1e9), 9).as("pr"))
  }
}
