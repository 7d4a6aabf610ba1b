package graft.cursor

import java.sql.Timestamp
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.Retry

/** Watermark (cursor) store — the incremental-sync checkpoint every
  * reference workflow starts and ends with (I1).
  *
  * Replays the reference's protocol: an append-only table
  * `{emitted_id, emitted_at, cursor_date, object}` (ref: constants.py:19-25),
  * watermark = max(cursor_date) per object read via a warehouse query
  * (ref: pipeline/functions/functions.py:58-77), advanced by appending one
  * row per run after a successful load
  * (ref: pipeline/hubspot_2_bigquery_migration/companies_pipeline.py:42-53,129-132).
  *
  * Scale note: the table grows one row per run per object — trivially
  * small forever. The `latest` aggregate is the single permissible
  * driver-side scalar in the engine (everything else stays distributed).
  */
final class CursorStore(spark: SparkSession, path: String) {

  private def exists: Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Max cursor for an object, or None before the first run
    * (ref: pipeline/functions/functions.py:58-67). Retried with backoff:
    * this is a DRIVER-side read, outside Spark's task-retry umbrella, and
    * a transient storage error here would fail the whole run before any
    * work started (the reference retries its warehouse/GCS reads the same
    * way, ref: config/gcs/gcs.py:204-229).
    */
  def latest(obj: String): Option[Timestamp] =
    Retry.withBackoff(maxRetries = 3, baseDelayMs = 200) {
      if (!exists) None
      else {
        val row = spark.read.parquet(path)
          .filter(col("object") === obj)
          .agg(max(col("cursor_date")).as("c"))
          .head()
        Option(row.getTimestamp(0))
      }
    }

  /** Append one cursor row — advance the watermark
    * (ref: companies_pipeline.py:129-132). Retried like `latest`: the
    * append is idempotent-safe to retry because `latest` takes the MAX
    * over rows, so a duplicate advance row from a retried half-failure
    * cannot move the watermark wrongly.
    */
  def advance(obj: String, cursorDate: Timestamp, runId: String,
              emittedAt: Timestamp): Unit = {
    import spark.implicits._
    Retry.withBackoff(maxRetries = 3, baseDelayMs = 200) {
      Seq((runId, emittedAt, cursorDate, obj))
        .toDF("emitted_id", "emitted_at", "cursor_date", "object")
        .repartition(1)
        .write.mode("append").parquet(path)
    }
  }
}
