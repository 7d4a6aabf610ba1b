package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Staging

/** Connected components over an undirected edge list — the collapse step
  * of a near-dup dedup pipeline: pair emission (MinHash/SimHash banding)
  * finds the edges, components turn transitive chains (A~B, B~C) into one
  * duplicate cluster, and the cluster's canonical member is the survivor
  * (the reference's dedup is exact-key only —
  * pipeline/functions/functions.py:91-106,149 — so clustering is the
  * engine going a stage beyond the system it models, per the builder
  * brief's LLM-pipeline scope).
  *
  * Algorithm: min-label CONTRACTION. Level 0 labels every node with the
  * minimum of itself and its direct neighbors (the only full-E
  * aggregation). The edge list is then rewritten into representative
  * space (`(label(a), label(b))`, loops dropped, duplicates collapsed —
  * the one other full-E pass) and the same min-merge repeats on the
  * CONTRACTED graph until no inter-representative edge remains. The
  * per-level relabelings compose in contracted space (small ⋈ small) and
  * fold into the full-resolution `(id, comp)` frame with ONE keyed join
  * after convergence.
  *
  * Why contraction instead of plain hash-min rounds: near-dup clusters
  * are DENSE (a k-member cluster emits Θ(k²) verified pairs — the sf0.1
  * simhash fixture is 5 000 docs / 1.35 M edges), and hash-min re-joins
  * the full edge list every round while labels converge — measured on
  * that fixture, 5 rounds × ~4 s of full-E joins after a 1.4 s level-0.
  * Contraction pays the full-E cost once more (the level-0 rewrite) and
  * every later level runs on the residue — a dense cluster's Θ(k²) edges
  * all map into its representative and vanish in the `distinct`, so the
  * contracted graph is roughly one node per already-merged cluster. At
  * production edge counts the per-level term is O(E_contracted), not
  * O(E) or O(V): the full edge list and the full node set are each
  * touched a constant number of times regardless of how many levels
  * convergence takes. Level count is still
  * bounded by component diameter (min-of-neighborhood merges at least
  * two nodes per component per level), the same shallow-cluster regime
  * as before — for genuinely deep graphs (social/link graphs) the
  * O(log n) alternating large-star/small-star algorithm (Kiveris et
  * al., "Connected Components in MapReduce and Beyond") remains the
  * drop-in upgrade; for dedup clustering its extra machinery buys
  * nothing.
  *
  * Scale notes:
  *  - every iterated frame (labels, contracted edges, per-level
  *    relabeling) is staged (Staging.stage), which truncates the
  *    iterated plan — without the cut, level k's logical plan embeds all
  *    k-1 predecessors and the optimizer re-plans the whole history;
  *  - the convergence probe is `isEmpty` on the STAGED contracted edge
  *    frame — a LocalLimit(1) scan of materialized blocks, not a
  *    recompute;
  *  - the caller's edge pipeline is staged once; both the level-0
  *    min-merge and the level-0 contraction re-scan that staging, never
  *    the upstream computation.
  */
object Components {

  /** Label every node of `edges` (columns `src`/`dst`) with the minimum
    * node id reachable from it. Returns (`id`, `comp`) — one row per
    * distinct node appearing in the edge list; isolated nodes (never in
    * an edge) are by definition absent. Edges with a null endpoint (a
    * null id, or a non-numeric string id — which ANSI mode rejects at
    * cast) carry no connectivity and are dropped up front rather than
    * silently vanishing inside the contraction joins.
    *
    * @param maxRounds fail-stop bound on contraction levels: if the
    *   contracted graph still has edges after this many levels the graph
    *   has a deeper diameter than dedup clustering produces and the
    *   caller picked the wrong algorithm — throw rather than return a
    *   wrong (unconverged) labeling. */
  def connected(
      edges: DataFrame,
      src: String = "src",
      dst: String = "dst",
      maxRounds: Int = 20): DataFrame = {
    // stage the caller's edge pipeline ONCE — every consumer below
    // (symmetrized min-merge, contraction joins) re-scans the staged
    // frame, not the (possibly expensive) upstream computation
    val e0 = Staging.stage(
      edges.select(col(src).cast("long").as("id"), col(dst).cast("long").as("nbr"))
        .filter(col("id").isNotNull && col("nbr").isNotNull))

    def symmetric(e: DataFrame): DataFrame =
      e.union(e.select(col("nbr").as("id"), col("id").as("nbr")))

    // min over the 1-hop neighborhood (self included), one row per node
    // of `e` — level 0 runs it on the full graph, later levels on the
    // contracted residue where it is a representative → representative map
    def minMerge(e: DataFrame): DataFrame = Staging.stage(
      symmetric(e).groupBy("id").agg(min(col("nbr")).as("mn"))
        .select(col("id"), least(col("id"), col("mn")).as("comp")))

    // rewrite `e` into representative space under `l` (which covers every
    // node of `e` by construction): intra-cluster edges drop, duplicates
    // collapse, orientation is normalized so (a,b)/(b,a) dedup together
    def contract(e: DataFrame, l: DataFrame): DataFrame = Staging.stage(
      e.join(l.select(col("id"), col("comp").as("ca")), "id")
        .join(l.select(col("id").as("nbr"), col("comp").as("cb")), "nbr")
        .filter(col("ca") =!= col("cb"))
        .select(least(col("ca"), col("cb")).as("id"),
          greatest(col("ca"), col("cb")).as("nbr"))
        .distinct())

    val labels = minMerge(e0)
    var e = contract(e0, labels)
    // Cumulative representative relabeling, kept in CONTRACTED space:
    // (rep, next) over the level-1 edge nodes. Contracted node sets only
    // shrink (every level's labels are drawn from the previous level's
    // nodes), so each new level map left-joins onto `next` and the
    // composition stays as small as the first contracted graph — the
    // full-resolution frame is touched once, after convergence, instead
    // of once per level.
    var repMap: DataFrame = null
    var level = 0
    var done = e.isEmpty
    while (!done && level < maxRounds) {
      val l = minMerge(e)
      val step = l.select(col("id").as("rep"), col("comp").as("next"))
      repMap = Staging.stage(
        if (repMap == null) step
        else repMap.join(
            step.select(col("rep").as("next"), col("next").as("next2")),
            Seq("next"), "left")
          .select(col("rep"), coalesce(col("next2"), col("next")).as("next")))
      e = contract(e, l)
      level += 1
      done = e.isEmpty
    }
    if (!done)
      throw new IllegalStateException(
        s"contraction did not converge in $maxRounds levels — component " +
          "diameter exceeds the dedup-cluster regime; use a log-round " +
          "algorithm (large-star/small-star) for deep graphs")
    if (repMap == null) labels
    else
      // one full-resolution fold: rows whose level-0 representative was
      // later merged follow the composed map, the rest keep theirs
      labels.join(repMap.withColumnRenamed("rep", "comp"), Seq("comp"), "left")
        .select(col("id"), coalesce(col("next"), col("comp")).as("comp"))
  }

  /** Incremental cluster maintenance: fold a new ingest's edges into an
    * existing labeling WITHOUT re-walking the old edge set (the
    * clustering continuation of q76's persisted-index architecture — the
    * prior run's (id, comp) table is the persisted artifact). Each old
    * label row is itself an edge to the component's canonical node, and
    * that star preserves the old connectivity exactly, with diameter 2 —
    * so propagation over star ∪ new edges converges in a few levels
    * regardless of how many ingests built the old labeling. Identical to
    * re-clustering the full history (ComponentsSpec pins it).
    *
    * Canonical ids can MOVE when a new edge bridges two old clusters or
    * a new doc has a smaller id than an old canonical — downstream
    * survivor tables key on cluster membership, not on a canonical
    * staying put. */
  def merge(
      labels: DataFrame,
      newEdges: DataFrame,
      src: String = "src",
      dst: String = "dst",
      maxRounds: Int = 20): DataFrame = {
    val star = labels.select(col("id").as(src), col("comp").as(dst))
    connected(star.union(newEdges.select(col(src), col(dst))), src, dst, maxRounds)
  }
}
