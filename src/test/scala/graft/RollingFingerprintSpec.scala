package graft

import org.apache.spark.sql.functions._
import graft.plans.RollingFingerprint

class RollingFingerprintSpec extends SparkSpec {
  import spark.implicits._

  private def ref(s: String, w: Int): Long = {
    if (s.isEmpty) 0L
    else {
      val win = math.min(w, s.length)
      (0 to s.length - win).map { i =>
        s.substring(i, i + win).foldLeft(0L)((h, c) => h * 31 + c)
      }.min
    }
  }

  test("compute matches a naive reference on edge cases") {
    for (s <- Seq("", "a", "short", "exactly8", "the quick brown fox", "aaaaaaaaaa");
         w <- Seq(1, 4, 8)) {
      assert(RollingFingerprint.compute(s, w) === ref(s, w), s"s='$s' w=$w")
    }
  }

  test("codegen'd expression path matches interpreted compute") {
    RollingFingerprint.register(spark)
    val data = Seq("hello world rolling hash", "tiny", "")
    val out = data.toDF("s")
      .select(expr("rolling_fingerprint(s, 8)")).as[Long].collect()
    assert(out.toSeq === data.map(s => RollingFingerprint.compute(s, 8)))
  }

  test("stays inside whole-stage codegen (no UDF fallback)") {
    RollingFingerprint.register(spark)
    // a file scan keeps the projection at runtime (a local Seq would be
    // constant-folded into a LocalTableScan)
    val df = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(expr("rolling_fingerprint(text, 8)"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"expected codegen stage:\n$plan")
  }
}
