package graft

import org.apache.spark.sql.functions._

import graft.core.Tables

/** Approximate aggregates — the 100 TB profiling path. Sketch outputs
  * (HLL, KLL/GK) are implementation-specific, so they cannot be
  * hash-compared against a DuckDB oracle; they verify by error bound
  * against the exact answers (which q59 oracle-checks). */
class ApproxSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("approx_count_distinct is within its rsd bound of exact") {
    val li = Tables.load(spark, sf, "lineitem")
    val row = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), rsd = 0.02).as("approx"))
      .collect().head
    val exact = row.getLong(0).toDouble
    val approx = row.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.06,
      s"HLL estimate $approx vs exact $exact drifted past 3x rsd")
  }

  test("percentile_approx converges to the exact percentile") {
    val li = Tables.load(spark, sf, "lineitem")
    val row = li.agg(
      expr("percentile(l_quantity, 0.5)").as("exact"),
      expr("percentile_approx(l_quantity, 0.5, 10000)").as("approx"))
      .collect().head
    val exact = row.getDouble(0)
    val approx = row.getDouble(1)
    assert(math.abs(approx - exact) <= 1.0,
      s"approx median $approx vs exact $exact outside tolerance")
  }

  test("datasketches HLL via hll_sketch_agg round-trips through a merge") {
    val li = Tables.load(spark, sf, "lineitem").select("l_partkey", "l_linenumber")
    // partial sketches per group, merged to a global estimate — the
    // distributed two-level rollup shape sketches exist for
    val merged = li.groupBy("l_linenumber")
      .agg(hll_sketch_agg(col("l_partkey")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect().head.getLong(0).toDouble
    val exact = li.select(countDistinct(col("l_partkey"))).collect().head.getLong(0).toDouble
    assert(math.abs(merged - exact) / exact < 0.05,
      s"merged HLL $merged vs exact $exact")
  }

  // ---- the graft Sketches family (q120–q123) ---------------------------
  // The oracle rows pin sketch CONSTRUCTION bit-for-bit; these pin the
  // semantic claims a value-compare can't see — mergeability (the
  // property that makes a sketch a sketch: partial summaries combine
  // associatively across shards/days) and the error envelope.

  import graft.llm.Sketches

  /** n synthetic items offset by `from`, with the sketch family's 32-bit
    * hash — the q120 hashing path verbatim. */
  private def items(from: Int, n: Int) = {
    import spark.implicits._
    (from until from + n).map(i => s"item-$i").toDF("item")
      .withColumn("hh", md5(concat(lit("kmv|"), col("item"))))
      .select(col("item"), Sketches.hexFold32("hh").as("h"))
  }

  private val kmvK = 256
  private def kminOf(hs: Seq[Long]): Seq[Long] = hs.distinct.sorted.take(kmvK)

  test("KMV is mergeable: k-min of two sketches' union == k-min of the union") {
    val a = items(0, 4000).select("h").collect().map(_.getLong(0)).toSeq
    val b = items(2000, 4000).select("h").collect().map(_.getLong(0)).toSeq
    val merged = kminOf(kminOf(a) ++ kminOf(b))
    val direct = kminOf(a ++ b)
    assert(merged == direct, "sketch-level merge drifted from direct build")
  }

  test("HLL is mergeable: register-wise max of two sketches == sketch of the union") {
    def regsOf(df: org.apache.spark.sql.DataFrame): Map[Int, Int] = df
      .withColumn("reg", Sketches.hllRegister(col("h"), 9))
      .withColumn("rho", Sketches.hllRho(col("h"), 9))
      .groupBy("reg").agg(max("rho").as("mrho"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    val a = regsOf(items(0, 4000))
    val b = regsOf(items(2000, 4000))
    val merged = (a.keySet ++ b.keySet).map(k =>
      k -> math.max(a.getOrElse(k, 0), b.getOrElse(k, 0))).toMap
    val direct = regsOf(items(0, 4000).unionByName(items(2000, 4000)))
    assert(merged == direct, "register max-merge drifted from direct build")
  }

  test("KMV and HLL estimates sit inside 4x their standard error on 6000 items") {
    val df = items(0, 6000)
    val hs = df.select("h").collect().map(_.getLong(0)).toSeq
    val kth = kminOf(hs).last
    val kmvEst = (kmvK - 1).toDouble / ((kth + 0.5) / 4294967296.0)
    assert(math.abs(kmvEst - 6000) / 6000 < 4.0 / math.sqrt(kmvK - 2),
      s"KMV $kmvEst vs 6000 outside envelope") // rel stderr ~ 1/sqrt(k-2)
    val agg = df
      .withColumn("reg", Sketches.hllRegister(col("h"), 9))
      .withColumn("rho", Sketches.hllRho(col("h"), 9))
      .groupBy("reg").agg(max("rho").as("mrho"))
      .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), 24 - mrho)")).as("spow"),
        count(lit(1)).as("nregs"))
      .select(Sketches.hllEstimate(col("spow"),
        (lit(512) - col("nregs")).cast("long"), 9).as("est"))
      .collect().head.getDouble(0)
    assert(math.abs(agg - 6000) / 6000 < 4.0 * 1.04 / math.sqrt(512.0),
      s"HLL $agg vs 6000 outside envelope") // rel stderr ~ 1.04/sqrt(m)
  }

  test("CMS point estimates never underestimate, for every item") {
    // a skewed multiset: item-i with multiplicity (i % 37) + 1
    import spark.implicits._
    val counts = (0 until 3000).map(i => (s"item-$i", (i % 37 + 1).toLong))
      .toDF("item", "cnt")
    val cells = counts
      .select(col("item"), col("cnt"), explode(expr("sequence(0, 3)")).as("r"))
      .withColumn("hh",
        md5(concat(lit("cms"), col("r").cast("string"), lit("|"), col("item"))))
      .withColumn("c", (Sketches.hexFold32("hh") % 8192).cast("int"))
    val grid = cells.groupBy("r", "c").agg(sum("cnt").as("cell"))
    val under = cells.join(grid, Seq("r", "c"))
      .groupBy("item", "cnt").agg(min("cell").as("est"))
      .filter(col("est") < col("cnt"))
    assert(under.isEmpty, "count-min produced an underestimate")
  }
}
