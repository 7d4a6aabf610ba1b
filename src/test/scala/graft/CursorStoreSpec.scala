package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.cursor.CursorStore

class CursorStoreSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)
  private def newStore() =
    new CursorStore(spark, Files.createTempDirectory("cursor-spec").toString + "/cursor")

  test("latest on empty store is None (first run bootstraps)") {
    assert(newStore().latest("orders").isEmpty)
  }

  test("advance then latest round-trips") {
    val cs = newStore()
    cs.advance("orders", ts("2024-01-01 00:00:00"), "run1", ts("2024-01-01 01:00:00"))
    assert(cs.latest("orders").contains(ts("2024-01-01 00:00:00")))
  }

  test("latest is the max over appended runs (replay-safe)") {
    val cs = newStore()
    cs.advance("orders", ts("2024-01-02 00:00:00"), "run2", ts("2024-01-02 01:00:00"))
    cs.advance("orders", ts("2024-01-01 00:00:00"), "run1-replayed", ts("2024-01-03 01:00:00"))
    assert(cs.latest("orders").contains(ts("2024-01-02 00:00:00")))
  }

  test("objects are isolated") {
    val cs = newStore()
    cs.advance("orders", ts("2024-01-05 00:00:00"), "r", ts("2024-01-05 00:00:00"))
    assert(cs.latest("companies").isEmpty)
  }
}
