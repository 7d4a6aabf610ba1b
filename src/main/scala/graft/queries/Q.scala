package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Tables

/** One registered engine query: a Spark implementation plus (where
  * SQL-expressible) the equivalent ANSI SQL the driver runs in DuckDB as
  * the correctness oracle. Keeping both in one value keeps names/aliases
  * in sync — the driver's compare hashes by sorted column name.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)
}
