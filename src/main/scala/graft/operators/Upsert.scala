package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MERGE upsert — the reference's core sink (K3), re-expressed as a
  * distributed plan composition instead of a warehouse-side SQL MERGE.
  *
  * Semantics of the BigQuery MERGE at config/bigquery/bigquery.py:245-256:
  *
  *   MERGE target t USING source s ON t.pk = s.pk
  *   WHEN MATCHED AND t.cursor != s.cursor THEN UPDATE all columns
  *   WHEN NOT MATCHED THEN INSERT
  *
  * i.e. a matched row with an UNCHANGED cursor keeps the target version;
  * changed or new rows take the source version. BigQuery errors on
  * duplicate source pks (pre-checked at bigquery.py:227-229); we instead
  * dedup source latest-cursor-wins deterministically (SURVEY.md §7.4.1).
  *
  * Scale design: two shuffle joins keyed on pk, no driver-side collect,
  * no all-string coercion (the reference's `astype(str)` at
  * bigquery.py:165 is a bug we do not port). With AQE on, a small source
  * (the usual incremental case: few changed rows vs a huge snapshot)
  * converts both joins to broadcast joins automatically, so the 100 TB
  * target table is never shuffled — only scanned and rewritten.
  */
object Upsert {

  /** Pure-plan upsert: returns the post-MERGE snapshot DataFrame. */
  def apply(target: DataFrame, source: DataFrame,
            pk: Seq[String], cursor: String): DataFrame = {
    val keyCols = pk.map(col)
    // Dedup source by pk, latest-cursor-wins (deterministic stand-in for
    // the reference's duplicate pre-check, bigquery.py:227-229).
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col(cursor).desc_nulls_last)
    val dedupedSrc = source
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
      .select(target.columns.map(col): _*) // align column order with target
    // WHEN MATCHED AND t.cursor != s.cursor / WHEN NOT MATCHED:
    // keep only source rows that are new, or whose cursor changed. The
    // __matched marker distinguishes "not matched" (insert) from "matched
    // with NULL target cursor" (t.cursor != s.cursor is unknown -> no
    // update), exactly like the SQL MERGE.
    val targetCursors = target.select(
      (keyCols :+ col(cursor).as("__t_cursor") :+ lit(true).as("__matched")): _*)
    val applied = dedupedSrc
      .join(targetCursors, pk, "left")
      .filter(col("__matched").isNull || col("__t_cursor") =!= col(cursor))
      .drop("__t_cursor", "__matched")
    // Target rows not superseded + applied source rows = new snapshot.
    target.join(applied.select(keyCols: _*), pk, "left_anti")
      .unionByName(applied)
  }
}
