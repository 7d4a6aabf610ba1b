package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks (A4/A5/A7 generalized — the
  * reference's pre-load gate: duplicate-pk detection before MERGE at
  * config/bigquery/bigquery.py:227-229 and the row-count/null summaries
  * in pipeline/functions/functions.py:108-121).
  *
  * All rules evaluate in ONE aggregation pass over the frame (a single
  * job, map-side combined); the only driver-side value is the one
  * report row — the same bounded-scalar category as the cursor read.
  */
object DQ {

  sealed trait Rule { def name: String }
  /** Column must contain no nulls. */
  final case class NotNull(col: String) extends Rule { def name = s"not_null($col)" }
  /** Key columns must be unique across the frame. */
  final case class Unique(cols: Seq[String]) extends Rule {
    require(cols.nonEmpty, "Unique needs at least one key column")
    def name = s"unique(${cols.mkString(",")})"
  }
  /** Frame must have at least `n` rows. */
  final case class MinRows(n: Long) extends Rule { def name = s"min_rows($n)" }

  final case class CheckResult(rule: String, passed: Boolean, observed: Long)

  /** Violation count per rule (0 = pass; for MinRows, the shortfall). */
  private def violations(r: Rule): Column = r match {
    case NotNull(c) => count(when(col(c).isNull, 1))
    case Unique(cs) =>
      // distinct over a STRUCT of the keys, not the bare columns:
      // countDistinct(cols…) silently drops any row with a null key,
      // which would count every null-keyed row as a duplicate. A struct
      // with null fields is itself non-null, and struct equality treats
      // null fields as equal — the same GROUP BY pk HAVING count(*) > 1
      // semantics as the reference's pre-MERGE dup check.
      count(lit(1)) - countDistinct(struct(cs.map(col): _*))
    case MinRows(n) => greatest(lit(n) - count(lit(1)), lit(0L))
  }

  def check(df: DataFrame, rules: Seq[Rule]): Seq[CheckResult] = {
    require(rules.nonEmpty, "no rules given")
    val row = df.agg(violations(rules.head).as("c0"),
      rules.drop(1).zipWithIndex.map { case (r, i) => violations(r).as(s"c${i + 1}") }: _*)
      .collect().head
    rules.zipWithIndex.map { case (r, i) =>
      val v = row.getLong(i)
      CheckResult(r.name, v == 0L, v)
    }
  }

  /** Gate: throw on the first failed rule (the reference aborts the load
    * when the dup check trips). */
  def enforce(df: DataFrame, rules: Seq[Rule]): Unit = {
    val failed = check(df, rules).filter(!_.passed)
    if (failed.nonEmpty)
      throw new IllegalStateException(
        "DQ checks failed: " + failed.map(f => s"${f.rule} (violations=${f.observed})").mkString("; "))
  }
}
