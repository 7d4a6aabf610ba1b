package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned interval join — points matched to intervals WITHOUT an equi
  * key (beyond-reference breadth; the reference's joins are all keyed).
  *
  * Spark plans a bare `point BETWEEN lo AND hi` join condition as a
  * BroadcastNestedLoopJoin (or a cartesian product when neither side
  * broadcasts): O(|points| × |intervals|) comparisons, the classic
  * range-join scale-killer. Binning recovers an equi key: every interval
  * explodes into the fixed-width time bins it overlaps, every point maps
  * to its one bin, the join becomes a hash equi-join on the bin id, and
  * the exact BETWEEN predicate runs only on bin-colliding candidates.
  * Cost is linear in points plus intervals × (span / bin width), and the
  * shuffle key is the bin id — candidate sets are bounded by bin
  * occupancy, so the plan survives any corpus size as long as the bin
  * width tracks the typical interval span (width ≈ span keeps the
  * per-interval explosion a small constant).
  */
object RangeJoin {

  // epoch seconds → bin ordinal; truncation toward zero == floor for the
  // post-1970 timestamps this engine handles
  private def binOf(c: Column, binSeconds: Long): Column =
    (unix_timestamp(c.cast("timestamp")) / lit(binSeconds)).cast("long")

  /** All (point row × interval row) pairs with
    * `lo <= point <= hi` (inclusive bounds). Column sets of the two
    * frames must be disjoint (standard join hygiene — the result carries
    * both sides' columns).
    *
    * @param binSeconds bin width; choose ≈ the typical interval span
    */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      binSeconds: Long): DataFrame = {
    val p = points.withColumn("__bin", binOf(col(pointCol), binSeconds))
    val i = intervals.withColumn("__bin",
      explode(sequence(binOf(col(loCol), binSeconds), binOf(col(hiCol), binSeconds))))
    p.join(i, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }
}
