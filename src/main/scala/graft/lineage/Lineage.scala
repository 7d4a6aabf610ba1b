package graft.lineage

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lineage stamping — every emitted row carries the batch timestamp and a
  * per-run-constant batch id (ref: pipeline/functions/functions.py:80-88,
  * 123-134). The run id MUST be a driver-side literal, not per-row
  * `uuid()`: the reference generates one uuid per run and reuses it on all
  * rows so a batch can be grouped/rolled back by id (SURVEY.md §7.4.5).
  */
object Lineage {

  /** Generate one (emitted_at, emitted_id) pair per run
    * (ref: pipeline/functions/functions.py:80-88). */
  def newRunId(): String = java.util.UUID.randomUUID().toString

  /** Stamp lineage columns; curried for `df.transform(stamp(id, ts))`. */
  def stamp(runId: String, batchTs: java.sql.Timestamp)(df: DataFrame): DataFrame =
    df.withColumn("emitted_at", lit(batchTs))
      .withColumn("emitted_id", lit(runId))

  /** N7 — default-field injection: add the column if absent, null-fill if
    * present (ref: pipeline/functions/functions.py:123-134 adds
    * archivedAt=None, associations={} when missing). */
  def withDefault(df: DataFrame, name: String, default: org.apache.spark.sql.Column): DataFrame =
    if (df.columns.contains(name))
      df.withColumn(name, coalesce(col(name), default))
    else df.withColumn(name, default)
}
