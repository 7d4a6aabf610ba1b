package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.lineage.Lineage
import graft.operators.Dedup

class DedupLineageSpec extends SparkSpec {
  import spark.implicits._

  test("firstWins keeps the first row under the explicit order (D1)") {
    val df = Seq(("a", 2, "second"), ("a", 1, "first"), ("b", 1, "only"))
      .toDF("id", "ord", "tag")
    val out = Dedup.firstWins(df, Seq("id"), Seq(col("ord")))
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(out === Map("a" -> "first", "b" -> "only"))
  }

  test("duplicateKeys flags keys with cnt > 1 (A4)") {
    val df = Seq("a", "a", "b").toDF("id")
    val out = Dedup.duplicateKeys(df, Seq("id")).collect()
    assert(out.length === 1 && out(0).getString(0) === "a" && out(0).getLong(1) === 2L)
  }

  test("stamp adds per-run-constant lineage columns (I5/F9)") {
    val ts0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val out = Seq(1, 2).toDF("x").transform(Lineage.stamp("run-1", ts0)).collect()
    assert(out.forall(r => r.getString(2) === "run-1" && r.getTimestamp(1) === ts0))
  }

  test("withDefault injects missing column and null-fills existing (N7)") {
    val df = Seq(("a", null.asInstanceOf[String]), ("b", "{\"x\":1}")).toDF("id", "assoc")
    val filled = Lineage.withDefault(df, "assoc", lit("{}"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(filled === Map("a" -> "{}", "b" -> "{\"x\":1}"))
    val injected = Lineage.withDefault(Seq("a").toDF("id"), "archivedAt",
      lit(null).cast("timestamp"))
    assert(injected.columns.contains("archivedAt"))
    assert(injected.collect()(0).isNullAt(1))
  }
}
