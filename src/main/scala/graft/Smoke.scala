package graft

import org.apache.spark.sql.SparkSession

/** Mirrors the driver's t1 smoke: run SparkEntry.entry, assert rows > 0. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark: SparkSession = graft.core.GraftSession.local(cpus)
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"[smoke] entry rows=$n schema=${df.schema.map(_.name).mkString(",")}")
    assert(n > 0, "entry returned no rows")
    spark.stop()
  }
}
