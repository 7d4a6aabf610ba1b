package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal latest-value) join — the classic operator Spark has no
  * built-in for (build brief's custom-operator ladder, rung (a):
  * compose existing ops). For every left row, attaches the payload of
  * the LATEST right row with `right.ts <= left.ts` on the same key —
  * "enrich each event with the dimension state as of event time".
  *
  * Physical shape is the scale-correct one: tag both sides, union, and
  * run one `last(payload, ignoreNulls)` window per payload column over
  * `(key) ORDER BY (ts, tag)` — a single hash shuffle of both sides by
  * key plus one per-partition sort. Never a per-row range probe, never
  * a cross product, and all payload windows share one sort. Right rows
  * sort before left rows at equal timestamps (tag 0 < 1), making the
  * match inclusive (`>=`).
  *
  * Preconditions: payload/key/ts names must not collide across sides
  * (select/alias first), and the right side must be unique per
  * (key, ts) — dedup first (e.g. [[Dedup.latestWins]]) or the carried
  * payload at a tied timestamp is arbitrary.
  */
object AsOf {

  def join(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTs: String, rightTs: String,
           payload: Seq[String]): DataFrame = {
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    val l2 = left
      .withColumn("__k", col(leftKey))
      .withColumn("__ts", col(leftTs))
      .withColumn("__tag", lit(1))
    val r2 = right
      .select((payload.map(col) :+ col(rightKey).as("__k") :+ col(rightTs).as("__ts")): _*)
      .withColumn("__tag", lit(0))
    // null-fill each side's missing columns, then carry the latest right
    // ROW forward as one struct: right rows contribute a non-null struct
    // even when individual payload fields are null, so a null field in
    // the matching row is preserved instead of falling through to an
    // older row's value (per-column fill would stitch together a row
    // that never existed)
    val u = l2.unionByName(r2, allowMissingColumns = true)
    val w = Window.partitionBy(col("__k")).orderBy(col("__ts"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = u.withColumn("__p",
      last(when(col("__tag") === 0, struct(payload.map(col): _*)), ignoreNulls = true).over(w))
    val leftCols = left.columns.toIndexedSeq.map(col)
    filled.filter(col("__tag") === 1)
      .select(leftCols ++ payload.map(p => col("__p").getField(p).as(p)): _*)
  }
}
