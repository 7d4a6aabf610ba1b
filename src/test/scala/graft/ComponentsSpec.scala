package graft

import org.apache.spark.sql.functions._

import graft.operators.Components

/** Min-label-contraction connected components
  * (operators/Components.scala) — the pairs→clusters collapse behind
  * q73/q74. */
class ComponentsSpec extends SparkSpec {

  private def edges(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF("src", "dst")
  }

  private def labels(pairs: (Long, Long)*): Map[Long, Long] =
    Components.connected(edges(pairs: _*))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap

  private def labels2(pairs: Seq[(Long, Long)], maxRounds: Int): Map[Long, Long] =
    Components.connected(edges(pairs: _*), maxRounds = maxRounds)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap

  test("transitive chain collapses to one cluster under the min id") {
    // 1-2, 2-3, 3-4 never pair 1 with 4 directly; the closure must
    assert(labels(1L -> 2L, 2L -> 3L, 3L -> 4L, 10L -> 11L) ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("deep path needs multiple propagation rounds and still converges") {
    // a 12-node path: the min label must travel 11 hops
    val path = (1L to 11L).map(i => i -> (i + 1))
    assert(labels(path: _*) === (1L to 12L).map(_ -> 1L).toMap)
  }

  test("edge orientation does not matter") {
    assert(labels(5L -> 2L, 2L -> 9L) === Map(2L -> 2L, 5L -> 2L, 9L -> 2L))
  }

  test("empty edge list yields an empty labeling") {
    assert(Components.connected(edges()).isEmpty)
  }

  test("exceeding maxRounds falls back to large-star/small-star and converges") {
    // before round 8 this threw; now the contracted residue left after
    // maxRounds levels is handed to the diameter-independent star
    // algorithm and the labeling must still be exactly right. A 64-node
    // path (diameter 63, far beyond what 2 contraction levels resolve)
    // plus a separate pair checks the fallback handles multiple
    // components in the residue.
    val path = (1L to 63L).map(i => i -> (i + 1))
    assert(labels2(path ++ Seq(100L -> 101L), maxRounds = 2) ===
      ((1L to 64L).map(_ -> 1L) ++ Seq(100L -> 100L, 101L -> 100L)).toMap)
  }

  test("maxRounds = 0 routes the whole level-1 residue through the fallback") {
    // repMap is still null when the fallback runs, so the star labeling
    // IS the composed map (the `repMap == null` branch); the triangle
    // converges at level 0 and must keep its label through the final
    // fold (the coalesce branch) even when the map came from the
    // fallback rather than contraction levels.
    val triangle = Seq(50L -> 51L, 51L -> 52L, 50L -> 52L)
    val path = (1L to 9L).map(i => i -> (i + 1))
    assert(labels2(triangle ++ path, maxRounds = 0) ===
      ((1L to 10L).map(_ -> 1L) ++ Seq(50L, 51L, 52L).map(_ -> 50L)).toMap)
  }

  test("star fallback does not stop at a near-fixpoint with split roots") {
    // Regression: the original convergence probe checked only that no
    // node appears as both child and root, which accepts a state where
    // a node still carries edges to TWO different roots — on this graph
    // with maxRounds = 0 the fallback then labeled node 12 with both 4
    // and 10 and reported one component under two ids. The strengthened
    // probe (exactly one root per child) must keep iterating until the
    // genuine star forest.
    val g = Seq(12L -> 54L, 14L -> 42L, 16L -> 23L, 16L -> 50L, 23L -> 10L,
      23L -> 43L, 27L -> 14L, 27L -> 16L, 27L -> 42L, 27L -> 54L, 40L -> 4L,
      40L -> 12L, 50L -> 56L, 56L -> 44L)
    val nodes = g.flatMap(p => Seq(p._1, p._2)).distinct
    // the whole graph is one component; its minimum is 4
    val expected = nodes.map(_ -> 4L).toMap
    assert(labels2(g, maxRounds = 0) === expected)
    assert(labels2(g, maxRounds = 20) === expected, "fast path agrees")
  }

  test("level-0-converged cluster keeps its label while a deep one contracts") {
    // A dense triangle {50,51,52} collapses entirely in the level-0
    // min-merge: its representative never enters the contracted graph,
    // so the final fold must find it ABSENT from the composed
    // relabeling and keep its label (the coalesce path). The 8-node
    // path forces several contraction levels in the same call, so both
    // fold branches run against one repMap.
    val triangle = Seq(50L -> 51L, 51L -> 52L, 50L -> 52L)
    val path = (1L to 7L).map(i => i -> (i + 1))
    assert(labels(triangle ++ path: _*) ===
      ((1L to 8L).map(_ -> 1L) ++ Seq(50L, 51L, 52L).map(_ -> 50L)).toMap)
  }

  test("incremental merge equals re-clustering the full edge history") {
    val oldEdges = Seq(1L -> 2L, 2L -> 3L, 10L -> 11L)
    val newEdges = Seq(3L -> 10L, 20L -> 21L) // bridges {1,2,3}+{10,11}, adds {20,21}
    val oldLabels = Components.connected(edges(oldEdges: _*))
    val merged = Components.merge(oldLabels, edges(newEdges: _*))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged === labels(oldEdges ++ newEdges: _*))
    assert(merged(11L) === 1L, "bridged clusters must re-canonicalize to the global min")
    assert(merged(21L) === 20L)
  }

  test("q73 clusters cover exactly the paired docs and q74 keeps canonicals") {
    val dir = "/root/testdata/sf0.01"
    val clusters = graft.queries.Llm.queries.find(_.name == "q73_dup_clusters").get
      .fn(spark, dir)
    val pairs = graft.queries.Llm.queries.find(_.name == "q49_jaccard_pairs").get
      .fn(spark, dir)
    val pairedDocs = pairs.select(col("doc_a").as("d"))
      .union(pairs.select(col("doc_b").as("d"))).distinct().count()
    assert(clusters.count() === pairedDocs)
    // every cluster id is itself a member (the canonical doc exists)
    assert(clusters.filter(col("doc_id") === col("cluster_id")).count() ===
      clusters.select("cluster_id").distinct().count())

    val docs = graft.core.Tables.load(spark, dir, "documents").count()
    val survivors = graft.queries.Llm.queries.find(_.name == "q74_dedup_survivors").get
      .fn(spark, dir).count()
    val removed = clusters.filter(col("doc_id") =!= col("cluster_id")).count()
    assert(survivors === docs - removed)
  }
}
