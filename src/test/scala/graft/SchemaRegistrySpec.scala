package graft

import org.apache.spark.sql.types._
import graft.core.{SchemaRegistry, Tables}
import graft.sinks.Sinks

/** Config-driven table registry (ref: bigquery.py:41-63 YAML schemas,
  * 72-90 per-object pk/cursor dispatch).
  */
class SchemaRegistrySpec extends SparkSpec {

  test("bundled registry parses: every engine table declared, pk non-empty") {
    val reg = SchemaRegistry.default
    assert(Tables.names.toSet === reg.keySet)
    Tables.names.foreach { n =>
      assert(reg(n).pk.nonEmpty, s"$n must declare a pk")
      assert(reg(n).schema.fields.nonEmpty, s"$n must declare a schema")
    }
  }

  test("declared schemas match the testdata parquet (names and types)") {
    // partition-stable contract: config is the source of truth, the
    // parquet fixture must conform. events.ts is declared TIMESTAMP_NTZ —
    // the post-load type Tables.load produces from the nanos column.
    val reg = SchemaRegistry.default
    Tables.names.foreach { n =>
      val actual = Tables.load(spark, "/root/testdata/sf0.001", n).schema
      val declared = reg(n).schema
      assert(declared.fields.map(_.name).toSeq === actual.fields.map(_.name).toSeq,
        s"$n column names diverge from the fixture")
      declared.fields.zip(actual.fields).foreach { case (d, a) =>
        assert(d.dataType === a.dataType, s"$n.${d.name}: declared ${d.dataType}, fixture has ${a.dataType}")
      }
    }
  }

  test("NOT NULL parses as non-nullable REQUIRED fields") {
    val spec = SchemaRegistry.default("orders")
    assert(!spec.schema("o_orderkey").nullable, "pk field must be REQUIRED")
    assert(spec.schema("o_custkey").nullable)
    assert(spec.pk === Seq("o_orderkey") && spec.cursor === Some("o_orderdate"))
  }

  test("composite pk parses") {
    assert(SchemaRegistry.default("lineitem").pk === Seq("l_orderkey", "l_linenumber"))
  }

  test("registry schema drives appendWithSchema REQUIRED enforcement") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-reg").toString
    val spec = SchemaRegistry.default("region")
    // conforming rows cast and land
    Sinks.appendWithSchema(
      Seq((1, "EUROPE"), (2, "ASIA")).toDF("r_regionkey", "r_name"),
      spec.schema, s"$tmp/region")
    assert(spark.read.parquet(s"$tmp/region").count() === 2)
    // a NULL in the REQUIRED pk fails the write
    val bad = Seq((Option.empty[Int], "NOWHERE")).toDF("r_regionkey", "r_name")
    intercept[Exception] {
      Sinks.appendWithSchema(bad, spec.schema, s"$tmp/region_bad")
    }
  }

  test("malformed config lines are rejected") {
    intercept[IllegalArgumentException] {
      SchemaRegistry.parse(Iterator("pk = dangling"))
    }
    intercept[IllegalArgumentException] {
      SchemaRegistry.parse(Iterator("[t]", "what is this"))
    }
    intercept[IllegalArgumentException] {
      SchemaRegistry.parse(Iterator("[t]", "pk = a")) // no schema
    }
    intercept[IllegalArgumentException] {
      SchemaRegistry.parse(Iterator(
        "[t]", "schema = a INT", "[t]", "schema = b INT")) // duplicate section
    }
  }
}
