package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.AsOf

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of join picks the latest right row at or before each left ts") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "e1"),
      (1L, ts("2024-01-01 12:00:00"), "e2"),
      (2L, ts("2024-01-01 09:00:00"), "e3")
    ).toDF("k", "t", "ev")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), "v_old"),
      (1L, ts("2024-01-01 11:00:00"), "v_new"),
      (2L, ts("2024-01-01 09:00:00"), "v_tie")
    ).toDF("rk", "rt", "v")
    val out = AsOf.join(left, right, "k", "rk", "t", "rt", Seq("v"))
      .select("ev", "v").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("e1") === "v_old") // 10:00 sees 09:00, not 11:00
    assert(out("e2") === "v_new") // 12:00 sees the latest prior
    assert(out("e3") === "v_tie") // equal timestamps match (>=)
  }

  test("a null payload field in the matching right row stays null") {
    // the latest right row has o_val = null; an older row has a value —
    // the match must return the latest ROW's null, never stitch columns
    // from different right rows
    val left = Seq((1L, ts("2024-01-01 12:00:00"), "e")).toDF("k", "t", "ev")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), Some("old_val"), "old_tag"),
      (1L, ts("2024-01-01 11:00:00"), None: Option[String], "new_tag")
    ).toDF("rk", "rt", "v", "tag")
    val out = AsOf.join(left, right, "k", "rk", "t", "rt", Seq("v", "tag")).collect().head
    assert(out.getAs[String]("tag") === "new_tag")
    assert(out.getAs[String]("v") === null,
      "null field of the matching row must not fall through to an older row")
  }

  test("left rows with no prior right row carry null payload") {
    val left = Seq((5L, ts("2024-01-01 08:00:00"), "early")).toDF("k", "t", "ev")
    val right = Seq((5L, ts("2024-01-01 09:00:00"), "later")).toDF("rk", "rt", "v")
    val out = AsOf.join(left, right, "k", "rk", "t", "rt", Seq("v")).collect()
    assert(out.length === 1 && out.head.getAs[String]("v") === null)
  }

  test("plan is one shuffle-by-key window, not a range or cross join") {
    val left = (1 to 100).map(i => (i.toLong % 5, ts(f"2024-01-01 10:${i % 60}%02d:00"), i))
      .toDF("k", "t", "ev")
    val right = (1 to 20).map(i => (i.toLong % 5, ts(f"2024-01-01 09:${i % 60}%02d:00"), s"v$i"))
      .toDF("rk", "rt", "v")
    val df = AsOf.join(left, right, "k", "rk", "t", "rt", Seq("v"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must compile to union+window, no join:\n$plan")
    assert(plan.contains("Window"), s"expected window operator:\n$plan")
  }
}
