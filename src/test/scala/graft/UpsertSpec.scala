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

  // ---- partition-scoped incremental MERGE ------------------------------

  /** md5 per data file under the partition dirs of `root`, keyed by path
    * relative to root. Root-level bookkeeping files (_SUCCESS) excluded —
    * the assertion is about partition DATA bytes. */
  private def partFileHashes(root: String): Map[String, String] = {
    val base = new java.io.File(root)
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(base)
      .filter(f => f.getName.startsWith("part-"))
      .map { f =>
        val digest = java.security.MessageDigest.getInstance("MD5")
          .digest(java.nio.file.Files.readAllBytes(f.toPath))
        base.toPath.relativize(f.toPath).toString -> digest.map("%02x".format(_)).mkString
      }.toMap
  }

  test("partitioned upsert rewrites only touched partitions, byte-identical elsewhere") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-partup").toString
    val snap = s"$tmp/snap"
    val partOf = org.apache.spark.sql.functions.year($"updated_at")

    // bootstrap: 3 rows across years 2022/2023/2024
    val seed = Seq(
      ("a", ts("2022-06-01 00:00:00"), 1.0),
      ("b", ts("2023-06-01 00:00:00"), 2.0),
      ("c", ts("2024-06-01 00:00:00"), 3.0)
    ).toDF("id", "updated_at", "v")
    Upsert.partitioned(snap, seed, Seq("id"), "updated_at", "y", partOf)
    val before = partFileHashes(snap)
    assert(Seq("y=2022", "y=2023", "y=2024").forall(p => before.keys.exists(_.startsWith(p))),
      s"bootstrap must write all three year partitions, got ${before.keys}")

    // incremental batch touches 2024 only: update c, insert d
    val batch = Seq(
      ("c", ts("2024-07-01 00:00:00"), 30.0),
      ("d", ts("2024-08-01 00:00:00"), 4.0)
    ).toDF("id", "updated_at", "v")
    val out = Upsert.partitioned(snap, batch, Seq("id"), "updated_at", "y", partOf)

    // merged content matches the full-table MERGE semantics
    val got = out.select("id", "updated_at", "v").collect()
      .map(r => r.getString(0) -> (r.getTimestamp(1), r.getDouble(2))).toMap
    assert(got === Map(
      "a" -> (ts("2022-06-01 00:00:00"), 1.0),
      "b" -> (ts("2023-06-01 00:00:00"), 2.0),
      "c" -> (ts("2024-07-01 00:00:00"), 30.0),
      "d" -> (ts("2024-08-01 00:00:00"), 4.0)))

    // untouched partitions' files are byte-identical; 2024 was rewritten
    val after = partFileHashes(snap)
    val untouchedBefore = before.filter { case (p, _) => !p.startsWith("y=2024") }
    val untouchedAfter = after.filter { case (p, _) => !p.startsWith("y=2024") }
    assert(untouchedBefore === untouchedAfter,
      "untouched year partitions must not be rewritten")
    assert(before.keys.filter(_.startsWith("y=2024")).toSet !=
      after.keys.filter(_.startsWith("y=2024")).toSet,
      "the touched partition must have new files")
  }

  test("partitioned upsert is idempotent per batch") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-partup2").toString
    val snap = s"$tmp/snap"
    val partOf = org.apache.spark.sql.functions.year($"updated_at")
    val seed = Seq(("a", ts("2024-01-01 00:00:00"), 1.0)).toDF("id", "updated_at", "v")
    Upsert.partitioned(snap, seed, Seq("id"), "updated_at", "y", partOf)
    val batch = Seq(("a", ts("2024-02-01 00:00:00"), 10.0)).toDF("id", "updated_at", "v")
    val once = Upsert.partitioned(snap, batch, Seq("id"), "updated_at", "y", partOf)
      .collect().toSet
    val twice = Upsert.partitioned(snap, batch, Seq("id"), "updated_at", "y", partOf)
      .collect().toSet
    assert(once === twice)
  }
}
