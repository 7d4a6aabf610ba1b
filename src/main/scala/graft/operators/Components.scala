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
  * as before — and for graphs that turn out deeper than that regime
  * (an unexpected template chain at production scale), exhausting
  * `maxRounds` no longer kills the job: the loop hands the contracted
  * residue to the alternating large-star/small-star algorithm (Kiveris
  * et al., "Connected Components in MapReduce and Beyond"), which
  * converges in a round count polylogarithmic in component size
  * REGARDLESS of diameter. Contraction stays the fast path; the
  * fallback pays its extra per-round machinery only on the residue a
  * pathological graph leaves behind, never on the full edge list.
  *
  * The trade is not free in the SPARSE direction either: on a sparse
  * graph whose contracted residue is nearly as large as E (little dense
  * mass to collapse at level 0), contraction's per-level staging and the
  * extra full-E rewrite cost more than plain hash-min rounds — measured
  * at sf0.1, q73's sparse MinHash graph pays ~0.4 s (1.6 → 2.0 s) while
  * q79's dense SimHash graph gains ~2 s (7.4 → 5.5 s). The dense case is
  * the one that decides survival at 100 TB (Θ(k²) cluster mass), so the
  * sparse overhead is the accepted price, not an oversight.
  *
  * Scale notes:
  *  - every iterated frame (labels, contracted edges, per-level
  *    relabeling) is staged (Staging.stage), which truncates the
  *    iterated plan — without the cut, level k's logical plan embeds all
  *    k-1 predecessors and the optimizer re-plans the whole history;
  *  - the convergence probe is the contracted frame's row count, taken
  *    by the SAME job that materializes the staging (Staging.stageCounted)
  *    — no separate isEmpty probe job per level;
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
    * @param maxRounds bound on contraction levels: if the contracted
    *   graph still has edges after this many levels the graph is deeper
    *   than the dedup-cluster regime contraction is tuned for, and the
    *   remaining residue is handed to the diameter-independent
    *   large-star/small-star fallback ([[starConverge]]) instead of
    *   spending more full-residue levels (or, as before round 8,
    *   throwing).
    * @param observe level telemetry hook, `(stage, edgeRows) => Unit`:
    *   called once per contraction level with the residue edge count
    *   (counted off the STAGED frame — a scan of materialized blocks,
    *   not a recompute), plus once if the star fallback engages. Wire it
    *   to `RunTelemetry.record` to make a production deep-graph incident
    *   diagnosable (which level stopped shrinking, how big the residue
    *   was). None — the default — costs zero: no counts are computed. */
  def connected(
      edges: DataFrame,
      src: String = "src",
      dst: String = "dst",
      maxRounds: Int = 20,
      observe: Option[(String, Long) => Unit] = None): DataFrame = {
    def report(stage: String)(rows: => Long): Unit =
      observe.foreach(_(stage, rows))
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
    // collapse, orientation is normalized so (a,b)/(b,a) dedup together.
    // Staged WITH its row count in one job (stageCounted): the count IS
    // the convergence probe, so the per-level isEmpty job the loop used
    // to pay on top of the staging job is gone — one scheduling round
    // trip per contraction level instead of two (plus the level-0 pair).
    def contract(e: DataFrame, l: DataFrame): (DataFrame, Long) =
      Staging.stageCounted(
        e.join(l.select(col("id"), col("comp").as("ca")), "id")
          .join(l.select(col("id").as("nbr"), col("comp").as("cb")), "nbr")
          .filter(col("ca") =!= col("cb"))
          .select(least(col("ca"), col("cb")).as("id"),
            greatest(col("ca"), col("cb")).as("nbr"))
          .distinct())

    val labels = minMerge(e0)
    var (e, eRows) = contract(e0, labels)
    report("components:level0_residue_edges")(eRows)
    // Cumulative representative relabeling, kept in CONTRACTED space:
    // (rep, next) over the level-1 edge nodes. Contracted node sets only
    // shrink (every level's labels are drawn from the previous level's
    // nodes), so each new level map left-joins onto `next` and the
    // composition stays as small as the first contracted graph — the
    // full-resolution frame is touched once, after convergence, instead
    // of once per level.
    var repMap: DataFrame = null
    var level = 0
    var done = eRows == 0L
    while (!done && level < maxRounds) {
      val l = minMerge(e)
      val step = l.select(col("id").as("rep"), col("comp").as("next"))
      repMap = Staging.stage(
        if (repMap == null) step
        else repMap.join(
            step.select(col("rep").as("next"), col("next").as("next2")),
            Seq("next"), "left")
          .select(col("rep"), coalesce(col("next2"), col("next")).as("next")))
      val (e2, n2) = contract(e, l)
      e = e2
      eRows = n2
      level += 1
      report(s"components:level${level}_residue_edges")(n2)
      done = n2 == 0L
    }
    if (!done) {
      report("components:star_fallback_residue_edges")(eRows)
      // deep-graph fallback: the residue's diameter outlived the
      // contraction budget. starConverge labels every residue node with
      // its component minimum in polylog rounds; that labeling composes
      // into the cumulative representative map exactly like one more
      // contraction level (its domain is the residue's node set, drawn
      // from the previous level's labels).
      val step = starConverge(e).select(col("id").as("rep"), col("comp").as("next"))
      repMap = Staging.stage(
        if (repMap == null) step
        else repMap.join(
            step.select(col("rep").as("next"), col("next").as("next2")),
            Seq("next"), "left")
          .select(col("rep"), coalesce(col("next2"), col("next")).as("next")))
    }
    if (repMap == null) labels
    else
      // one full-resolution fold: rows whose level-0 representative was
      // later merged follow the composed map, the rest keep theirs
      labels.join(repMap.withColumnRenamed("rep", "comp"), Seq("comp"), "left")
        .select(col("id"), coalesce(col("next"), col("comp")).as("comp"))
  }

  /** Alternating large-star/small-star (Kiveris et al., "Connected
    * Components in MapReduce and Beyond") — the deep-graph escape hatch
    * behind [[connected]]'s `maxRounds`. Where contraction's level count
    * tracks component DIAMETER, this pair of operations provably
    * converges in a number of rounds polylogarithmic in component size:
    * large-star hangs every larger neighbor off the minimum of a node's
    * closed neighborhood (halving tall trees), small-star re-points each
    * node's smaller neighbors at that side's minimum (flattening the
    * result), and the fixed point is one star per component rooted at the
    * component minimum — exactly the min-label contract the rest of the
    * pipeline expects.
    *
    * Runs only on the contracted residue a pathological graph leaves
    * after `maxRounds` levels, so its extra per-round machinery (two
    * aggregations + two joins per round instead of one) never touches the
    * full edge list. Each iterate is staged for the same reason the
    * contraction levels are; convergence ("the edge set is a star
    * forest") requires two facts about the staged iterate, each an
    * `isEmpty` probe: no node is both a leaf (appears as `id` — both
    * operations emit edges oriented child→root, id > nbr) and a root
    * (appears as `nbr`), AND no leaf carries edges to more than one
    * root. The second clause is load-bearing: the orientation check
    * alone accepts near-fixpoints where a node still points at two
    * roots, which would double-label it and split its component.
    *
    * Returns (`id`, `comp`) covering every node of `edges` (both
    * operations preserve the node set and component structure — an edge
    * (u,v) is always re-emitted linking v to a member of u's component,
    * and components of ≥2 nodes always keep ≥1 edge). */
  private def starConverge(edges: DataFrame): DataFrame = {
    def symmetric(e: DataFrame): DataFrame =
      e.union(e.select(col("nbr").as("id"), col("id").as("nbr")))

    // emit (v, min(Γ(u) ∪ {u})) for every neighbor v > u
    def largeStar(e: DataFrame): DataFrame = Staging.stage {
      val sym = symmetric(e)
      val mins = sym.groupBy("id").agg(min(col("nbr")).as("mn"))
        .select(col("id"), least(col("id"), col("mn")).as("m"))
      sym.join(mins, "id").filter(col("nbr") > col("id"))
        .select(col("nbr").as("id"), col("m").as("nbr"))
        .distinct()
    }

    // orient each edge large→small; emit (v, m) for every smaller
    // neighbor v of u (v ≠ m) plus (u, m), where m = min(Γ⁻(u))
    def smallStar(e: DataFrame): DataFrame = Staging.stage {
      val dir = symmetric(e).filter(col("nbr") < col("id"))
      val mins = dir.groupBy("id").agg(min(col("nbr")).as("m"))
      dir.join(mins, "id").filter(col("nbr") =!= col("m"))
        .select(col("nbr").as("id"), col("m").as("nbr"))
        .union(mins.select(col("id"), col("m").as("nbr")))
        .distinct()
    }

    var e = edges
    var rounds = 0
    var stars = false
    while (!stars) {
      e = smallStar(largeStar(e))
      rounds += 1
      // a star forest needs BOTH conditions: no node appears as a child
      // AND a root (edges are oriented child→root, so a root must never
      // reappear as an `id`), and every child hangs off exactly ONE root.
      // The first alone accepts a state where a node still carries edges
      // to two different roots — the final union would then label that
      // node twice and report one component under two ids. Rows of `e`
      // are distinct, so >1 row per id ⟺ >1 distinct root per id.
      stars =
        e.groupBy("id").agg(count(lit(1)).as("k")).filter(col("k") > 1).isEmpty &&
        e.join(e.select(col("id").as("nbr")).distinct(), Seq("nbr"), "left_semi").isEmpty
      // 2^100-node components do not exist; a failure to converge here is
      // a bug in the operations, not a property of any input graph
      if (!stars && rounds >= 100)
        throw new IllegalStateException(
          s"large-star/small-star did not reach a star forest in $rounds rounds")
    }
    e.select(col("id"), col("nbr").as("comp"))
      .union(e.select(col("nbr").as("id"), col("nbr").as("comp")).distinct())
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
      maxRounds: Int = 20,
      observe: Option[(String, Long) => Unit] = None): DataFrame = {
    val star = labels.select(col("id").as(src), col("comp").as(dst))
    connected(star.union(newEdges.select(col(src), col(dst))), src, dst,
      maxRounds, observe)
  }
}
