package graft

import graft.sources.OffsetRestSource

/** DSv2 offset-pagination source: parallel windows + LIMIT pushdown. */
class OffsetRestSourceSpec extends SparkSpec {

  private def read(pages: Int = 10, pageSize: Int = 100) =
    spark.read.format("graft.sources.OffsetRestSource")
      .option("pages", pages).option("pageSize", pageSize).load()

  test("full scan plans every window and yields pages*pageSize rows") {
    val df = read()
    assert(df.count() === 1000L)
    assert(OffsetRestSource.lastPlannedPages.get() === 10)
  }

  test("LIMIT pushdown plans only ceil(limit/pageSize) windows") {
    val out = read().limit(150).collect()
    assert(out.length === 150)
    assert(OffsetRestSource.lastPlannedPages.get() === 2,
      "limit 150 over 100-row pages must plan exactly 2 windows")
    // ids are the offset sequence, so the limit trims exactly
    assert(out.map(_.getLong(0)).min === 0L)
  }

  test("windows partition the id space without overlap") {
    val ids = read(pages = 4, pageSize = 50).collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === (0L until 200L).toSeq)
  }
}
