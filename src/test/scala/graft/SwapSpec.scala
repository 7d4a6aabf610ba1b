package graft

import java.nio.file.Files

import graft.sinks.Sinks

/** The object-store-safe snapshot marker protocol: data moves are
  * arbitrarily slow and non-atomic (each parquet file lands separately —
  * the faked "non-atomic FS" below stops a publish at every intermediate
  * point), and visibility comes only from the one-object pointer
  * replace. Readers must see a complete old version or a complete new
  * version at every intermediate state, never a half write.
  */
class SwapSpec extends SparkSpec {
  import spark.implicits._

  private def rows(path: String): Set[(Int, String)] =
    Sinks.readSnapshot(spark, path).collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet

  test("marker publish: every crash window leaves readers on a complete version") {
    val path = Files.createTempDirectory("graft-marker").toString + "/snap"
    val v1 = Set(1 -> "a", 2 -> "b")
    Sinks.snapshotSwapMarker(v1.toSeq.toDF("id", "v"), path)
    assert(rows(path) === v1)

    // crash window 1: a new version fully written, pointer never flipped —
    // the writer died after the (non-atomic) data copy
    Set(9 -> "x").toSeq.toDF("id", "v").write
      .parquet(s"${path}__versions/orphan-never-pointed")
    assert(rows(path) === v1, "an unpointed version must be invisible")

    // crash window 2: a half-copied version — one junk object of a
    // multi-file copy landed (what a non-atomic object-store "rename"
    // leaves mid-flight)
    val half = new java.io.File(s"${path}__versions/partial-copy")
    half.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(half.toString, "part-00000.parquet"),
      Array[Byte](1, 2, 3))
    assert(rows(path) === v1, "a half-copied version must be invisible")

    // a completed publish flips visibility in one step
    val v2 = Set(1 -> "a2", 3 -> "c")
    Sinks.snapshotSwapMarker(v2.toSeq.toDF("id", "v"), path)
    assert(rows(path) === v2)

    // the just-replaced version survives one publish (in-flight readers);
    // crashed-publish debris is reclaimed
    val versions = new java.io.File(s"${path}__versions").listFiles().map(_.getName).toSet
    assert(versions.size === 2, s"expected new + just-replaced only, got $versions")
    assert(!versions.contains("orphan-never-pointed") && !versions.contains("partial-copy"))

    // third publish: the v1 generation ages out
    val v3 = Set(4 -> "d")
    Sinks.snapshotSwapMarker(v3.toSeq.toDF("id", "v"), path)
    assert(rows(path) === v3)
    assert(new java.io.File(s"${path}__versions").listFiles().length === 2)
  }

  test("partitioned MERGE rejects a marker-layout snapshot instead of forking it") {
    val path = Files.createTempDirectory("graft-marker-guard").toString + "/snap"
    Sinks.snapshotSwapMarker(Seq(1 -> "a").toDF("id", "v"), path)
    val batch = Seq(("a", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.0))
      .toDF("id", "updated_at", "v")
    val e = intercept[IllegalStateException] {
      graft.operators.Upsert.partitioned(path, batch, Seq("id"), "updated_at",
        "y", org.apache.spark.sql.functions.year(batch("updated_at")))
    }
    assert(e.getMessage.contains("marker"), e.getMessage)
  }

  test("streaming sync maintains the snapshot under the marker protocol") {
    val in = Files.createTempDirectory("marker-stream-in").toString
    val ev = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "events")
    ev.repartition(4).write.mode("overwrite").parquet(in)
    val schema = spark.read.parquet(in).schema
    val snap = Files.createTempDirectory("marker-snap").toString + "/events_snapshot"
    val ckpt = Files.createTempDirectory("marker-ckpt").toString

    spark.conf.set("spark.graft.swap", "marker")
    try {
      val q = graft.streaming.StreamingSync.syncToSnapshot(
        graft.streaming.StreamingSync.readEvents(spark, in, schema), snap, ckpt,
        Seq("event_id"), "ts")
      q.awaitTermination(120000)
      assert(Sinks.readSnapshot(spark, snap).count() === ev.count())
      // marker layout: no plain dir at the path, data lives in versions
      assert(!new java.io.File(snap).exists())
      assert(new java.io.File(s"${snap}__current").isFile)
    } finally spark.conf.unset("spark.graft.swap")
  }
}
