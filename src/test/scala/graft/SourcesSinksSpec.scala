package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables
import graft.functions.Retry
import graft.sinks.Sinks
import graft.sources.Sources

/** Cross-JVM-visible state for the retry test: local-mode executors share
  * the JVM, so a static counter observes executor-side attempts. */
object ReverseEtlFixture {
  val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
}

class SourcesSinksSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  test("S14: year-partitioned write + read prunes partitions on a year filter") {
    val base = tmp("part") + "/orders_by_year"
    Sources.writePartitionedByYear(Tables.load(spark, sf, "orders"), "o_orderdate", base)
    val pruned = Sources.partitioned(spark, base).filter(col("year") === 1997)
    val expected = Tables.load(spark, sf, "orders")
      .filter(year(col("o_orderdate")) === 1997).count()
    assert(pruned.count() === expected)
    // the plan must show partition filters, not a post-scan filter
    val physical = pruned.queryExecution.executedPlan.toString
    assert(physical.contains("PartitionFilters: [isnotnull(year"),
      s"expected partition pruning in plan:\n$physical")
  }

  test("S15: JSON spill-file and CSV reads round-trip with explicit schema") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    val jdir = tmp("json"); val cdir = tmp("csv")
    df.write.mode("overwrite").json(jdir)
    df.write.mode("overwrite").option("header", "true").csv(cdir)
    assert(Sources.json(spark, jdir, schema).collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
    assert(Sources.csv(spark, cdir, schema).collect().map(_.getString(1)).sorted.toSeq === Seq("a", "b"))
  }

  test("ORC round-trips with predicate pushdown into the reader") {
    val dir = tmp("orc") + "/orders"
    Sinks.orc(Tables.load(spark, sf, "orders"), dir)
    val scanned = Sources.orc(spark, dir).filter(col("o_orderkey") === 1)
      .select("o_orderkey", "o_totalprice")
    assert(scanned.count() >= 1)
    val physical = scanned.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters: ") &&
      physical.contains("EqualTo(o_orderkey,1)"),
      s"ORC scan must push the key predicate:\n$physical")
    // full-fidelity round trip
    assert(Sources.orc(spark, dir).count() ===
      Tables.load(spark, sf, "orders").count())
  }

  test("K1/K4: append accumulates; parquet honors compression codec") {
    import spark.implicits._
    val p = tmp("append") + "/t"
    Sinks.append(Seq(1, 2).toDF("x"), p)
    Sinks.append(Seq(3).toDF("x"), p)
    assert(spark.read.parquet(p).count() === 3)
    val gz = tmp("gz") + "/t"
    Sinks.parquet(Seq(1).toDF("x"), gz, codec = "gzip")
    assert(new java.io.File(gz).listFiles().exists(_.getName.endsWith(".gz.parquet")))
  }

  test("K3 sink: snapshotSwap atomically replaces the live dir") {
    import spark.implicits._
    val p = tmp("swap") + "/snap"
    Sinks.snapshotSwap(Seq((1, "v1")).toDF("id", "v"), p)
    assert(spark.read.parquet(p).collect()(0).getString(1) === "v1")
    Sinks.snapshotSwap(Seq((1, "v2")).toDF("id", "v"), p)
    val out = spark.read.parquet(p).collect()
    assert(out.length === 1 && out(0).getString(1) === "v2")
    assert(!new java.io.File(p + "__tmp").exists())
    assert(!new java.io.File(p + "__old").exists())
  }

  test("K5: csvSample dumps at most n rows with header") {
    import spark.implicits._
    val p = tmp("csvs") + "/sample"
    Sinks.csvSample((1 to 100).toDF("x"), p, n = 5)
    assert(spark.read.option("header", "true").csv(p).count() === 5)
  }

  test("K6: foreachRowSink delivers every row exactly once via accumulator") {
    import spark.implicits._
    val acc = spark.sparkContext.longAccumulator("delivered")
    val writer = new Sinks.RowWriter {
      def write(row: Row): Unit = acc.add(row.getInt(0))
    }
    Sinks.foreachRowSink((1 to 10).toDF("x"), writer)
    assert(acc.value === 55L)
  }

  test("K1 schema-enforced append: accept, cast-at-edge, drop undeclared") {
    import spark.implicits._
    val declared = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("amount", DoubleType, nullable = true)))
    val p = tmp("schemaappend") + "/t"
    // id arrives as string, amount as int, plus an undeclared column
    val df = Seq(("1", 10, "junk"), ("2", 20, "junk"))
      .toDF("id", "amount", "undeclared")
    Sinks.appendWithSchema(df, declared, p)
    val back = spark.read.parquet(p)
    assert(back.schema.fieldNames.toSeq === Seq("id", "amount"))
    assert(back.schema("id").dataType === LongType)
    assert(back.schema("amount").dataType === DoubleType)
    assert(back.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
  }

  test("K1 schema-enforced append: null in REQUIRED field fails the write") {
    import spark.implicits._
    val declared = StructType(Seq(StructField("id", LongType, nullable = false)))
    val p = tmp("schemareject") + "/t"
    val df = Seq(Some(1L), None).toDF("id")
    val e = intercept[Exception] {
      Sinks.appendWithSchema(df, declared, p)
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("REQUIRED field 'id'")))
  }

  test("K6 typed reverse-ETL: create/update/delete batches route and count") {
    import spark.implicits._
    val created = spark.sparkContext.longAccumulator("created")
    val updated = spark.sparkContext.longAccumulator("updated")
    val deleted = spark.sparkContext.longAccumulator("deleted")
    val batches = spark.sparkContext.longAccumulator("batches")
    val writer = new graft.sinks.ReverseEtl.OpWriter {
      def create(b: Seq[Row]): Unit = { created.add(b.size); batches.add(1) }
      def update(b: Seq[Row]): Unit = { updated.add(b.size); batches.add(1) }
      def delete(b: Seq[Row]): Unit = { deleted.add(b.size); batches.add(1) }
    }
    val df = (1 to 90).map { i =>
      (i, if (i % 3 == 0) "create" else if (i % 3 == 1) "update" else "delete")
    }.toDF("id", "op").repartition(2)
    graft.sinks.ReverseEtl.sync(df, "op", writer, batchSize = 10,
      baseDelayMs = 1, jitterMs = 1)
    assert(created.value === 30L)
    assert(updated.value === 30L)
    assert(deleted.value === 30L)
    // bounded batches: 90 rows, batchSize 10, 2 partitions -> >= 9 batches
    assert(batches.value >= 9L)
  }

  test("K6 typed reverse-ETL: a failing batch is retried with backoff") {
    import spark.implicits._
    val delivered = spark.sparkContext.longAccumulator("delivered")
    ReverseEtlFixture.attempts.set(0)
    val writer = new graft.sinks.ReverseEtl.OpWriter {
      def create(b: Seq[Row]): Unit = {
        // first delivery attempt fails; the retry must redeliver the batch
        if (ReverseEtlFixture.attempts.incrementAndGet() == 1)
          throw new RuntimeException("transient remote failure")
        delivered.add(b.size)
      }
      def update(b: Seq[Row]): Unit = ()
      def delete(b: Seq[Row]): Unit = ()
    }
    val df = (1 to 5).map(i => (i, "create")).toDF("id", "op").coalesce(1)
    graft.sinks.ReverseEtl.sync(df, "op", writer, batchSize = 100,
      maxRetries = 3, baseDelayMs = 1, jitterMs = 1)
    assert(delivered.value === 5L)
    assert(ReverseEtlFixture.attempts.get() === 2)
  }

  test("dynamic partition overwrite replaces only the partitions in the batch") {
    import spark.implicits._
    val p = tmp("dynpart") + "/t"
    Sinks.overwritePartitions(
      Seq((1, 1997, "a"), (2, 1998, "b")).toDF("id", "year", "v"), p, Seq("year"))
    // incremental batch touches only 1998
    Sinks.overwritePartitions(
      Seq((3, 1998, "b2")).toDF("id", "year", "v"), p, Seq("year"))
    val out = spark.read.parquet(p).collect()
      .map(r => (r.getAs[Int]("id"), r.getAs[Int]("year"), r.getAs[String]("v"))).toSet
    assert(out === Set((1, 1997, "a"), (3, 1998, "b2")),
      "1997 must survive; 1998 must be fully replaced by the new batch")
  }

  test("bucketed tables join without a shuffle (co-located join)") {
    val li = Tables.load(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    val ord = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    Sinks.writeBucketed(li, "li_bucketed", Seq("l_orderkey"), buckets = 8)
    Sinks.writeBucketed(ord, "ord_bucketed", Seq("l_orderkey"), buckets = 8)
    val joined = spark.table("li_bucketed")
      .join(spark.table("ord_bucketed"), Seq("l_orderkey"))
    // disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not exchange either side:\n$plan")
      assert(joined.count() ===
        li.join(ord, Seq("l_orderkey")).count())
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("I6: retry backs off then succeeds / exhausts") {
    var calls = 0
    val out = Retry.withBackoff(maxRetries = 3, baseDelayMs = 1, jitterMs = 1) {
      calls += 1
      if (calls < 3) throw new RuntimeException("flaky") else "ok"
    }
    assert(out === "ok" && calls === 3)
    assertThrows[RuntimeException] {
      Retry.withBackoff(maxRetries = 1, baseDelayMs = 1, jitterMs = 1) {
        throw new RuntimeException("always")
      }
    }
  }
}
