package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.pipelines.SnapshotSync
import graft.queries.{Llm, Relational}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  private def registry = Relational.queries ++ Llm.queries

  /** Flagship: the reference's canonical snapshot-sync lifecycle
    * (SURVEY.md §3.1) — cursor read → incremental filtered scan → dedup →
    * lineage stamp → MERGE upsert → cursor advance — on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    SnapshotSync.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
