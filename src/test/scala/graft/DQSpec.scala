package graft

import graft.core.Tables
import graft.operators.DQ

class DQSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("all rules evaluate in one pass; pass/fail and counts are right") {
    val orders = Tables.load(spark, sf, "orders")
    val results = DQ.check(orders, Seq(
      DQ.NotNull("o_custkey"),
      DQ.Unique(Seq("o_orderkey")),
      DQ.MinRows(100),
      DQ.Unique(Seq("o_custkey")) // many orders per customer -> fails
    ))
    val byName = results.map(r => r.rule -> r).toMap
    assert(byName("not_null(o_custkey)").passed)
    assert(byName("unique(o_orderkey)").passed)
    assert(byName("min_rows(100)").passed)
    val dup = byName("unique(o_custkey)")
    assert(!dup.passed && dup.observed > 0)
  }

  test("enforce throws naming the failed rule, passes on a clean frame") {
    val orders = Tables.load(spark, sf, "orders")
    DQ.enforce(orders, Seq(DQ.NotNull("o_orderkey"), DQ.Unique(Seq("o_orderkey"))))
    val e = intercept[IllegalStateException] {
      DQ.enforce(orders, Seq(DQ.Unique(Seq("o_custkey"))))
    }
    assert(e.getMessage.contains("unique(o_custkey)"))
  }

  test("Unique treats null keys as values, not as violations") {
    import spark.implicits._
    // [1, null] has no duplicates — a null key is one distinct group
    val noDup = Seq(Some(1L), None).toDF("k")
    assert(DQ.check(noDup, Seq(DQ.Unique(Seq("k")))).head.passed)
    // [null, null] IS a duplicate group (GROUP BY treats nulls equal,
    // matching the reference's pre-MERGE dup check)
    val nullDup = Seq(None: Option[Long], None).toDF("k")
    val r = DQ.check(nullDup, Seq(DQ.Unique(Seq("k")))).head
    assert(!r.passed && r.observed === 1L)
  }

  test("Unique with no key columns fails fast at construction") {
    intercept[IllegalArgumentException] { DQ.Unique(Seq.empty) }
  }

  test("MinRows reports the shortfall on an empty frame") {
    import spark.implicits._
    val empty = Seq.empty[Int].toDF("x")
    val r = DQ.check(empty, Seq(DQ.MinRows(5))).head
    assert(!r.passed && r.observed === 5L)
  }
}
