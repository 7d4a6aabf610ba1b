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

  test("load fails on schema drift, naming the drifted column") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-drift").toString
    // a 'region' whose r_regionkey drifted INT -> STRING
    Tables.load(spark, "/root/testdata/sf0.001", "region")
      .withColumn("r_regionkey", col("r_regionkey").cast("string"))
      .write.parquet(s"$dir/region.parquet")
    val e = intercept[IllegalStateException] {
      Tables.load(spark, dir, "region")
    }
    assert(e.getMessage.contains("r_regionkey") && e.getMessage.contains("INT")
      && e.getMessage.contains("STRING"), e.getMessage)
  }

  test("load fails when a declared column is missing") {
    val dir = java.nio.file.Files.createTempDirectory("graft-missing").toString
    Tables.load(spark, "/root/testdata/sf0.001", "region")
      .drop("r_name")
      .write.parquet(s"$dir/region.parquet")
    val e = intercept[IllegalStateException] {
      Tables.load(spark, dir, "region")
    }
    assert(e.getMessage.contains("r_name"), e.getMessage)
  }

  test("undeclared extra columns are additive evolution, not drift") {
    import org.apache.spark.sql.functions.lit
    val dir = java.nio.file.Files.createTempDirectory("graft-extra").toString
    Tables.load(spark, "/root/testdata/sf0.001", "region")
      .withColumn("r_comment", lit("x"))
      .write.parquet(s"$dir/region.parquet")
    assert(Tables.load(spark, dir, "region").count() === 5)
  }
}
