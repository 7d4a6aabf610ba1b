package graft

import scala.util.Random

import graft.operators.Components

/** Property-style tests for connected components: seeded random graphs
  * checked against a driver-side union-find — the strongest correctness
  * evidence available for an iterative distributed algorithm, since it
  * exercises graph shapes (chains crossing cluster boundaries, multiple
  * bridges, self-loops, duplicate and reversed edges) no hand-written
  * fixture enumerates. */
class ComponentsPropSpec extends SparkSpec {
  import spark.implicits._

  /** Classic union-find with path compression, canonical = min member. */
  private def model(edges: List[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      parent.getOrElse(a, { parent(a) = a; a })
      parent.getOrElse(b, { parent(b) = b; b })
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => List(e._1, e._2)).distinct
    // canonical root is already the min member: unions always point the
    // larger root at the smaller, so find() bottoms out at the minimum
    nodes.map(n => n -> find(n)).toMap
  }

  test("contraction labels match union-find on 12 seeded random graphs") {
    val rnd = new Random(2025)
    for (i <- 1 to 12) {
      // node universe larger than the edge count → a mix of chains,
      // small clusters, and singleton-free isolated regions; a few
      // duplicate/reversed/self edges land by construction
      val n = 6 + rnd.nextInt(20)
      val edges = List.fill(n)(
        (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      val got = Components.connected(edges.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === model(edges), s"iteration $i: edges=$edges")
    }
  }

  test("star-fallback labels match union-find on seeded random graphs") {
    // small maxRounds forces nearly every graph through the
    // large-star/small-star fallback after 0–1 contraction levels — the
    // same union-find parity bar as the fast path, over shapes no
    // hand-written fixture enumerates. Alternating 0 and 1 covers both
    // fallback entry points (repMap null vs composed); the deterministic
    // split-roots regression lives in ComponentsSpec.
    val rnd = new Random(2027)
    for (i <- 1 to 12) {
      val n = 8 + rnd.nextInt(18)
      val edges = List.fill(n)(
        (rnd.nextInt(26).toLong, rnd.nextInt(26).toLong))
      val got = Components.connected(edges.toDF("src", "dst"), maxRounds = i % 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === model(edges), s"iteration $i: edges=$edges")
    }
  }

  test("merge after a random split equals clustering the whole edge set") {
    val rnd = new Random(2026)
    for (i <- 1 to 6) {
      val edges = List.fill(14)(
        (rnd.nextInt(24).toLong, rnd.nextInt(24).toLong))
      val (oldE, newE) = edges.splitAt(rnd.nextInt(edges.size - 1) + 1)
      val oldLabels = Components.connected(oldE.toDF("src", "dst"))
      val merged = Components.merge(oldLabels, newE.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(merged === model(edges), s"iteration $i: old=$oldE new=$newE")
    }
  }
}
