package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators (SURVEY.md §2.10).
  *
  * The reference's `drop_duplicates_by_id` keeps the first row in arrival
  * order (ref: pipeline/functions/functions.py:91-106). Arrival order is
  * meaningless in a distributed engine, so the engine requires an explicit
  * ordering — `row_number` over a window — making the winner deterministic
  * (SURVEY.md §7.4.4).
  *
  * Scale design: one hash-shuffle on the key columns; no global sort.
  */
object Dedup {

  /** D1/D2 — deterministic first-wins dedup by key under an explicit order. */
  def firstWins(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Latest-cursor-wins variant used by the upsert source pre-dedup. */
  def latestWins(df: DataFrame, keys: Seq[String], cursor: String): DataFrame =
    firstWins(df, keys, Seq(col(cursor).desc_nulls_last))

  /** A4 — duplicate-key detection (ref: config/bigquery/bigquery.py:227-229):
    * keys occurring more than once. Map-side partial aggregation makes this
    * one shuffle of pre-aggregated pairs. */
  def duplicateKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)
}
