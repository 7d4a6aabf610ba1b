package graft

import graft.core.Tables

/** Table registry memoization: registration reads ten parquet footers
  * driver-side, so the remote-SQL queries must not pay it per call.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  test("registerAll memoizes per (session, dir); a dir change re-registers") {
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    // overwrite one view out-of-band: a memo HIT must not touch views
    Seq(1).toDF("marker").createOrReplaceTempView("region")
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    assert(spark.table("region").columns.toSeq === Seq("marker"),
      "second registerAll with the same dir must be a no-op")
    // pointing the session at a different dir re-registers everything
    Tables.registerAll(spark, "/root/testdata/sf0.01")
    assert(spark.table("region").columns.toSeq === Seq("r_regionkey", "r_name"),
      "a dir change must rebuild the views")
  }
}
