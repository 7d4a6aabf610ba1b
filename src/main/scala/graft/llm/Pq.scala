package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Staging

/** Product-quantization codebook TRAINING — the piece q94's ADC machinery
  * deliberately left out (its fixed corpus-slice codebook is replayable by
  * the DuckDB oracle; a trained one isn't). Deterministic per-subspace
  * Lloyd iterations (k-means), per Jégou et al., "Product Quantization
  * for Nearest Neighbor Search" (TPAMI 2011) §III: split each vector
  * into `m` subvectors, learn `k` centroids per subspace independently,
  * and a vector's code is its per-subspace nearest-centroid tuple.
  *
  * Determinism (no RNG anywhere):
  *  - init: the `k` seed vectors are the corpus's first `k` in
  *    md5(vec_id) order — a reproducible pseudo-random spread, the same
  *    trick every deterministic sampler in the engine rides;
  *  - assignment ties break on (d2, cent_id), update means are averaged
  *    per fixed dimension position, and empty clusters KEEP their previous
  *    centroid (no re-seeding), so two runs produce identical codebooks;
  *  - each iteration's means are ROUNDED to 6 dp and distances go through
  *    the dot-identity fold (see [[sqDist]]) — the Kmeans discipline that
  *    makes training itself a DuckDB-replayable oracle row (q111).
  *
  * Scale shape (the q57 assignment shape, per iteration):
  *  - centroid table is m*k rows — broadcast, never shuffled;
  *  - assignment is a broadcast join + per-(vec, sub) window rank over k
  *    candidate rows — linear in corpus size, no corpus shuffle;
  *  - the update aggregates map-side partials per (sub, cent, dim):
  *    shuffle volume is m*k*subDim rows — codebook-sized, independent of
  *    corpus size;
  *  - each iteration stages the (tiny) codebook, so the loop never builds
  *    an iters-deep optimizer plan over the corpus.
  */
object Pq {

  /** ||a-b||² via the dot identity |a|² - 2·a.b + |b|² — the same
    * left-to-right float fold as DuckDB's `list_dot_product` (through
    * the codegen'd [[graft.plans.VectorDot]]), so every distance the
    * trainer, encoder, and ADC scan compare is bit-identical
    * cross-engine. The squared-diff fold it replaces has no DuckDB twin
    * with a guaranteed accumulation order. */
  private def sqDist(a: String, b: String): String =
    s"vector_dot($a, $a) - 2 * vector_dot($a, $b) + vector_dot($b, $b)"

  private def slices(df: DataFrame, keep: Seq[String], m: Int, subDim: Int): DataFrame =
    df.select(keep.map(col) :+ explode(expr(
      s"""transform(sequence(0, ${m - 1}), i -> struct(i AS sub,
            transform(slice(embedding, $subDim * i + 1, $subDim),
                      x -> CAST(x AS DOUBLE)) AS sv))""")).as("x"): _*)
      .select(keep.map(col) :+ col("x.sub").as("sub") :+ col("x.sv").as("sv"): _*)

  /** (vec_id, sub, sv: array<double>) — the per-subspace slice table. */
  def subVectors(vectors: DataFrame, m: Int, subDim: Int): DataFrame =
    slices(vectors, Seq("vec_id"), m, subDim)

  /** q94's untrained scheme generalized: centroids are the subspace slices
    * of the corpus's `k` lowest-vec_id vectors. The baseline a trained
    * codebook has to beat (PqRecallSpec). */
  def fixedCodebooks(vectors: DataFrame, m: Int, subDim: Int, k: Int): DataFrame = {
    val seeds = vectors.orderBy("vec_id").limit(k)
      .withColumn("cent_id",
        (row_number().over(Window.orderBy("vec_id")) - 1).cast("int"))
    slices(seeds, Seq("cent_id"), m, subDim)
      .select(col("sub"), col("cent_id"), col("sv").as("cv"))
  }

  /** Nearest-centroid assignment of every (vec, sub) slice: the shared
    * inner step of training, encoding, and IVF-style listing. */
  private def assign(subs: DataFrame, codebooks: DataFrame): DataFrame = {
    val w = Window.partitionBy("vec_id", "sub").orderBy(col("d2"), col("cent_id"))
    subs.join(broadcast(codebooks), Seq("sub"))
      .withColumn("d2", expr(sqDist("sv", "cv")))
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select("vec_id", "sub", "cent_id", "sv")
  }

  /** Train per-subspace codebooks with `iters` Lloyd iterations.
    * @return (sub, cent_id, cv: array<double>) — m*k rows */
  def trainCodebooks(vectors: DataFrame, m: Int, subDim: Int, k: Int,
                     iters: Int = 5): DataFrame = {
    graft.plans.VectorDot.register(vectors.sparkSession)
    val subs = Staging.stage(subVectors(vectors, m, subDim))
    // deterministic spread init: first k vectors in md5(vec_id) order
    val seeds = vectors
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(k)
      .withColumn("cent_id",
        (row_number().over(Window.orderBy(md5(col("vec_id").cast("string")),
          col("vec_id"))) - 1).cast("int"))
    var cb = Staging.stage(slices(seeds, Seq("cent_id"), m, subDim)
      .select(col("sub"), col("cent_id"), col("sv").as("cv")))
    for (_ <- 0 until iters) {
      val means = assign(subs, cb)
        .select(col("sub"), col("cent_id"), posexplode(col("sv")).as(Seq("pos", "v")))
        // means ROUNDED to 6 dp each iteration — the Kmeans.meansOf
        // discipline: collapses cross-engine partial-sum order before it
        // can drift an assignment, making TRAINING itself replayable by
        // the q111 oracle's unrolled CTE chain
        .groupBy("sub", "cent_id", "pos").agg(round(avg("v"), 6).as("mv"))
        .groupBy("sub", "cent_id")
        // collect is per (sub, cent): subDim rows, sorted in-row by pos —
        // deterministic regardless of arrival order
        .agg(expr("transform(array_sort(collect_list(struct(pos, mv))), p -> p.mv)")
          .as("ncv"))
      // empty cluster → no mean row → keep the previous centroid
      cb = Staging.stage(cb.join(means, Seq("sub", "cent_id"), "left")
        .select(col("sub"), col("cent_id"),
          coalesce(col("ncv"), col("cv")).as("cv")))
    }
    cb
  }

  /** Encode the corpus against a codebook: (vec_id, codes) where codes is
    * the sub-sorted array<struct<sub:int, code:int>> q94's ADC folds over. */
  def encode(vectors: DataFrame, codebooks: DataFrame, m: Int, subDim: Int): DataFrame = {
    graft.plans.VectorDot.register(vectors.sparkSession)
    assign(subVectors(vectors, m, subDim), codebooks)
      .groupBy("vec_id")
      .agg(sort_array(collect_list(struct(col("sub"), col("cent_id").as("code"))))
        .as("codes"))
  }

  /** ADC top-k over a coded corpus (q94's scan shape, codebook-agnostic):
    * per-query LUT of m*k sub-distances broadcast as a map column, one
    * map-only fold per corpus code row, candidates collapsed map-side in
    * the bounded-heap TopK aggregator — shuffle is queries*topK rows,
    * independent of corpus size.
    * @return (query_id, vec_id, approx_dist) ordered best-first per query */
  def adcTopK(queries: DataFrame, codes: DataFrame, codebooks: DataFrame,
              m: Int, subDim: Int, k: Int, topK: Int): DataFrame = {
    graft.plans.VectorDot.register(queries.sparkSession)
    val lut = subVectors(queries, m, subDim)
      .join(broadcast(codebooks), Seq("sub"))
      .withColumn("d2", expr(sqDist("sv", "cv")))
      .groupBy(col("vec_id").as("query_id"))
      .agg(map_from_entries(collect_list(
        struct(col("sub") * lit(k) + col("cent_id"), col("d2")))).as("lutmap"))
    val agg = TopK.topK(topK)
    codes.crossJoin(broadcast(lut))
      .filter(col("vec_id") =!= col("query_id"))
      // the rank cut runs on the ROUNDED distance (q94's rule): the
      // m-term double sum has no specified accumulation order on the
      // oracle side, so rounding first makes both engines break ties on
      // the id, not on summation order
      .withColumn("nscore", -round(expr(
        s"aggregate(codes, 0D, (acc, c) -> acc + element_at(lutmap, c.sub * $k + c.code))"), 6))
      .groupBy("query_id")
      .agg(agg(col("vec_id"), col("nscore")).as("nn"))
      .select(col("query_id"), explode(col("nn")).as("n"))
      .select(col("query_id"), col("n.id").as("vec_id"),
        (-col("n.score")).as("approx_dist"))
  }
}
