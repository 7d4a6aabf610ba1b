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
}
