package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Compact

class CompactSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("compaction rewrites only fragmented partitions, preserves data, idempotent") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val snap = s"$tmp/snap"

    // y=2024 fragments across 6 single-row appends (one file each);
    // y=2023 stays compact (one append)
    (1 to 6).foreach { i =>
      Seq((s"k$i", ts(s"2024-0$i-01 00:00:00"), i.toDouble))
        .toDF("id", "updated_at", "v")
        .withColumn("y", year($"updated_at"))
        .write.partitionBy("y").mode("append").parquet(snap)
    }
    Seq(("old", ts("2023-06-01 00:00:00"), 0.0))
      .toDF("id", "updated_at", "v")
      .withColumn("y", year($"updated_at"))
      .write.partitionBy("y").mode("append").parquet(snap)

    val before = TestFiles.partFileHashes(snap)
    assert(before.keys.count(_.startsWith("y=2024")) === 6)
    val dataBefore = spark.read.parquet(snap).collect()
      .map(r => (r.getString(0), r.getDouble(2))).toSet

    val rewritten = Compact.partitions(spark, snap, maxFilesPerPartition = 4)
    assert(rewritten === Seq("y=2024"), "only the fragmented partition compacts")

    val after = TestFiles.partFileHashes(snap)
    assert(after.keys.count(_.startsWith("y=2024")) === 1,
      "six small files must become one")
    assert(after.filter(_._1.startsWith("y=2023")) === before.filter(_._1.startsWith("y=2023")),
      "the compact partition must be byte-identical")
    val dataAfter = spark.read.parquet(snap).collect()
      .map(r => (r.getString(0), r.getDouble(2))).toSet
    assert(dataAfter === dataBefore, "compaction must not change a single row")

    assert(Compact.partitions(spark, snap, maxFilesPerPartition = 4) === Seq.empty,
      "re-running on a compact snapshot selects nothing")
  }
}
