package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import graft.operators.Upsert

/** MERGE semantics of config/bigquery/bigquery.py:245-256 (see Upsert). */
class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def target: DataFrame = Seq(
    ("a", ts("2024-01-01 00:00:00"), 1.0),
    ("b", ts("2024-01-02 00:00:00"), 2.0),
    ("c", ts("2024-01-03 00:00:00"), 3.0)
  ).toDF("id", "updated_at", "v")

  private def result(df: DataFrame): Map[String, (Timestamp, Double)] =
    df.collect().map(r => r.getString(0) -> (r.getTimestamp(1), r.getDouble(2))).toMap

  test("insert: unmatched source rows are added") {
    val src = Seq(("d", ts("2024-01-04 00:00:00"), 4.0)).toDF("id", "updated_at", "v")
    val out = result(Upsert(target, src, Seq("id"), "updated_at"))
    assert(out.size === 4)
    assert(out("d") === (ts("2024-01-04 00:00:00"), 4.0))
  }

  test("update: matched row with changed cursor takes the source version") {
    val src = Seq(("a", ts("2024-02-01 00:00:00"), 10.0)).toDF("id", "updated_at", "v")
    val out = result(Upsert(target, src, Seq("id"), "updated_at"))
    assert(out.size === 3)
    assert(out("a") === (ts("2024-02-01 00:00:00"), 10.0))
    assert(out("b") === (ts("2024-01-02 00:00:00"), 2.0))
  }

  test("no-op: matched row with equal cursor keeps the target version") {
    val src = Seq(("a", ts("2024-01-01 00:00:00"), 99.0)).toDF("id", "updated_at", "v")
    val out = result(Upsert(target, src, Seq("id"), "updated_at"))
    assert(out("a") === (ts("2024-01-01 00:00:00"), 1.0)) // WHEN MATCHED AND t.cursor != s.cursor only
  }

  test("dup source keys: latest-cursor-wins deterministically") {
    val src = Seq(
      ("a", ts("2024-03-01 00:00:00"), 30.0),
      ("a", ts("2024-02-01 00:00:00"), 20.0)
    ).toDF("id", "updated_at", "v")
    val out = result(Upsert(target, src, Seq("id"), "updated_at"))
    assert(out("a") === (ts("2024-03-01 00:00:00"), 30.0))
  }

  test("matched row with NULL target cursor does not update (SQL != is unknown)") {
    val t = Seq(("a", null.asInstanceOf[Timestamp], 1.0)).toDF("id", "updated_at", "v")
    val src = Seq(("a", ts("2024-02-01 00:00:00"), 10.0)).toDF("id", "updated_at", "v")
    val out = result(Upsert(t, src, Seq("id"), "updated_at"))
    assert(out("a")._2 === 1.0)
  }

  test("idempotence: re-applying the same source is a no-op") {
    val src = Seq(
      ("a", ts("2024-02-01 00:00:00"), 10.0),
      ("e", ts("2024-02-02 00:00:00"), 5.0)
    ).toDF("id", "updated_at", "v")
    val once = Upsert(target, src, Seq("id"), "updated_at")
    val twice = Upsert(once, src, Seq("id"), "updated_at")
    assert(result(once) === result(twice))
  }

  test("tombstone flow: archived flag update flows through as a change") {
    val t = Seq(("a", ts("2024-01-01 00:00:00"), false)).toDF("id", "updated_at", "archived")
    val src = Seq(("a", ts("2024-02-01 00:00:00"), true)).toDF("id", "updated_at", "archived")
    val out = Upsert(t, src, Seq("id"), "updated_at").collect()
    assert(out.length === 1 && out(0).getBoolean(2) === true)
  }
}
