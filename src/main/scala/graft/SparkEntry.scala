package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import graft.core.Tables
import graft.lineage.{Lineage, RunTelemetry}
import graft.pipelines.{CorpusPipeline, SnapshotSync}
import graft.queries.{Llm, Relational}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  private def registry = Relational.queries ++ Llm.queries

  /** Flagship: the reference's canonical snapshot-sync lifecycle
    * (SURVEY.md §3.1) — cursor read → incremental filtered scan → dedup →
    * lineage stamp → MERGE upsert → cursor advance — on sf0.001. The
    * second flagship composition, the LLM corpus-preparation pipeline
    * (gate → dedup → near-dup collapse → decontaminate → mix → pack),
    * runs alongside it with its staged row counts recorded into the same
    * RunTelemetry struct the sync reports through (one report stream per
    * run, the reference's workflow-monitoring shape); the returned frame
    * stays the sync result the driver smokes. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.load(spark, dir, "documents")
    val bench = docs.filter(col("doc_id") < 10).select("doc_id", "text")
    val telemetry = RunTelemetry.attach(spark, Lineage.newRunId())
    try {
      val (_, report) = CorpusPipeline.run(docs, bench)
      report.foreach(r => telemetry.record(s"corpus:${r.stage}", r.rowsOut))
      telemetry.summaryLines
        .filter(_.contains("action=corpus:"))
        .foreach(l => println(s"[run-report] $l"))
    } finally telemetry.detach()
    SnapshotSync.run(spark, dir)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
