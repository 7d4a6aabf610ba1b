package graft

import org.apache.spark.sql.functions._
import graft.sources.PagedRestSource

/** S1/S4 via DataSourceV2: page-per-partition parallelism and GT-cursor
  * pushdown pruning pages before any "fetch". */
class PagedRestSourceSpec extends SparkSpec {

  private def read() = spark.read
    .format("graft.sources.PagedRestSource")
    .option("pages", "10").option("pageSize", "100")
    .load()

  test("full scan yields pages x pageSize rows across page partitions") {
    val df = read()
    assert(df.count() === 1000)
    assert(PagedRestSource.lastPlannedPages.get() === 10)
    assert(df.rdd.getNumPartitions === 10) // one partition per REST page
  }

  test("cursor predicate pushes into the source and prunes whole pages (S4)") {
    // records advance 1 min from 2024-01-01T00:00Z; cursor at +700 min
    // leaves 299 newer records spanning pages 7..9
    val cursor = java.sql.Timestamp.from(
      java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(700 * 60))
    val df = read().filter(col("updated_at") > lit(cursor))
    assert(df.count() === 299)
    assert(PagedRestSource.lastPlannedPages.get() === 3,
      "pages wholly below the cursor must never be fetched")
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedCursorFilter"),
      s"plan should surface the pushed cursor filter:\n$plan")
  }

  test("cursor semantics match the reference's strict GT (no replay of the boundary row)") {
    val boundary = java.sql.Timestamp.from(
      java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(999 * 60))
    val df = read().filter(col("updated_at") > lit(boundary))
    assert(df.count() === 0) // last record is exactly at the boundary
  }
}
