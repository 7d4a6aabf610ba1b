package graft

import org.apache.spark.sql.functions._
import graft.plans.VectorDot

class VectorDotSpec extends SparkSpec {
  import spark.implicits._

  test("codegen'd expression matches the composed zip_with/aggregate form") {
    VectorDot.register(spark)
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.1f, -0.2f, 0.3f), Array(-0.4f, 0.5f, 0.6f)),
      (Array.empty[Float], Array.empty[Float])
    ).toDF("a", "b")
    val out = df.select(
      expr("vector_dot(a, b)").as("native"),
      expr("aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
        "CAST(0 AS DOUBLE), (acc, v) -> acc + v)").as("composed"))
      .collect()
    out.foreach { r =>
      // bit-identical, not approximately equal — the oracle hashes values
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("NULL semantics mirror the composed form: length mismatch and null element") {
    VectorDot.register(spark)
    val mismatch = Seq((Array(1.0f, 2.0f), Array(1.0f)))
      .toDF("a", "b").select(expr("vector_dot(a, b)")).collect()
    assert(mismatch.head.isNullAt(0))
    val nullElem = spark.sql(
      "SELECT vector_dot(array(CAST(1.0 AS DOUBLE), CAST(NULL AS DOUBLE)), " +
        "array(CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE))) AS d").collect()
    assert(nullElem.head.isNullAt(0))
  }

  test("mixed float/double inputs (embedding vs literal plane) work") {
    VectorDot.register(spark)
    val out = Seq(Tuple1(Array(1.0f, 2.0f)))
      .toDF("a")
      .select(call_function("vector_dot", col("a"),
        array(lit(3.0), lit(4.0))).as("d"))
      .collect().head.getDouble(0)
    assert(out === 11.0)
  }

  test("stays inside whole-stage codegen over a file scan") {
    VectorDot.register(spark)
    val df = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select(expr("vector_dot(embedding, embedding)").as("d"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"expected codegen stage:\n$plan")
    assert(!plan.toLowerCase.contains("batchevalpython"), "no UDF fallback")
  }
}
