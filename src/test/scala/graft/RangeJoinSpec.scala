package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** RangeJoin must equal the naive BETWEEN join (the semantics oracle)
  * at every bin width, with inclusive boundaries — the binning is an
  * execution strategy, never a semantics change.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val pts = Seq(
    (1, ts("2024-01-01 00:00:00")), // == lo of interval 10 (inclusive)
    (2, ts("2024-01-03 12:00:00")), // == hi of interval 10 (inclusive)
    (3, ts("2024-01-02 06:30:00")), // interior of 10 and 11
    (4, ts("2023-12-31 23:59:59")), // just below 10
    (5, ts("2024-02-15 00:00:00"))  // no interval
  ).toDF("pid", "pts")

  private val ivs = Seq(
    (10, ts("2024-01-01 00:00:00"), ts("2024-01-03 12:00:00")),
    (11, ts("2024-01-02 00:00:00"), ts("2024-01-09 00:00:00")),
    (12, ts("2024-03-01 00:00:00"), ts("2024-03-02 00:00:00"))
  ).toDF("iid", "lo", "hi")

  private def naive: Set[(Int, Int)] =
    pts.crossJoin(ivs)
      .filter(col("pts") >= col("lo") && col("pts") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getInt(0), r.getInt(1))).toSet

  private def binned(binSeconds: Long): Set[(Int, Int)] =
    RangeJoin.pointInInterval(pts, "pts", ivs, "lo", "hi", binSeconds)
      .select("pid", "iid").collect().map(r => (r.getInt(0), r.getInt(1))).toSet

  test("equivalence to the naive join across bin widths") {
    val expected = naive
    assert(expected === Set(1 -> 10, 2 -> 10, 2 -> 11, 3 -> 10, 3 -> 11),
      "fixture sanity: inclusive bounds, no spurious matches")
    // width ≪ span, ≈ span, and ≫ span must all agree — the bin is
    // invisible in the result
    Seq(3600L, 86400L, 86400L * 30).foreach { w =>
      assert(binned(w) === expected, s"bin width $w diverged")
    }
  }

  test("q72 plans as a hash equi-join, never nested-loop or cartesian") {
    val df: DataFrame = SparkEntry.queries("q72_range_join")(spark, "/root/testdata/sf0.001")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"range join must go through the bin equi-join:\n$p")
  }
}
