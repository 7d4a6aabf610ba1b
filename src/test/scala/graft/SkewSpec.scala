package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Skew

class SkewSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("saltedJoin returns exactly the plain equi-join's rows (inner)") {
    val li = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val ord = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = li.join(ord, Seq("l_orderkey"))
    val salted = Skew.saltedJoin(li, ord, Seq("l_orderkey"),
      buckets = 8, saltSource = col("l_linenumber"))
    assert(salted.count() === plain.count())
    // value-level equality via an order-insensitive checksum
    def checksum(df: org.apache.spark.sql.DataFrame): Long =
      df.select(sum(hash(df.columns.map(col).toIndexedSeq: _*).cast("long")).as("c"))
        .collect().head.getLong(0)
    assert(checksum(salted.select(plain.columns.map(col).toIndexedSeq: _*)) === checksum(plain))
  }

  test("saltedJoin left join keeps unmatched probe rows") {
    import spark.implicits._
    val probe = Seq((1, "a"), (2, "b"), (99, "c")).toDF("k", "pv")
    val build = Seq((1, "x"), (2, "y")).toDF("k", "bv")
    val out = Skew.saltedJoin(probe, build, Seq("k"), buckets = 4,
      saltSource = col("pv"), joinType = "left")
    assert(out.count() === 3)
    assert(out.filter(col("k") === 99).collect().head.isNullAt(2))
  }

  test("build side replicates buckets times; probe scatters within a key") {
    import spark.implicits._
    // one hot key: every probe row has k=1, salts must spread it
    val probe = (1 to 1000).map(i => (1, i)).toDF("k", "row_id")
    val build = Seq((1, "dim")).toDF("k", "bv")
    val salted = probe.withColumn("__salt", pmod(hash(col("row_id")), lit(8)))
    val distinctSalts = salted.select("__salt").distinct().count()
    assert(distinctSalts === 8, "hot key must scatter across all salt buckets")
    val out = Skew.saltedJoin(probe, build, Seq("k"), buckets = 8, saltSource = col("row_id"))
    assert(out.count() === 1000)
  }
}
