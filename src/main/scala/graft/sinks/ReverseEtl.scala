package graft.sinks

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row}

import graft.functions.Retry

/** Typed reverse-ETL writers (K6 completed). The reference exposes
  * distinct create / update(PATCH) / delete endpoints with batched
  * bodies (ref: config/hubspot/hubspotoop.py:41-47 create, :340-347
  * batch update, :436-442 delete, :473-479 archive) and wraps remote
  * calls in an exponential-backoff retry loop
  * (test/hubspot/retry.py:6-42; config/gcs/gcs.py:204-229).
  *
  * Distributed shape: rows carry an op column and are delivered
  * per-partition in bounded per-op batches — one client per partition,
  * every batch wrapped in [[Retry.withBackoff]]. There is no driver-side
  * loop: a large changeset streams through the executors at full
  * parallelism, and batch size bounds both request size and the memory
  * held per open batch.
  */
object ReverseEtl {

  val OpCreate = "create"
  val OpUpdate = "update"
  val OpDelete = "delete"

  /** One client per partition. `open()` is the connection seam;
    * deliveries must be idempotent per batch — a failed batch is
    * redelivered whole by the retry loop (same contract as the
    * reference's retried POSTs). */
  trait OpWriter extends Serializable {
    def open(): Unit = ()
    def create(batch: Seq[Row]): Unit
    def update(batch: Seq[Row]): Unit
    def delete(batch: Seq[Row]): Unit
    def close(): Unit = ()
  }

  /** Route `df` rows to the writer by `opCol` in batches of `batchSize`,
    * retrying each batch `maxRetries` times with exponential backoff. */
  def sync(df: DataFrame, opCol: String, writer: OpWriter,
           batchSize: Int = 100, maxRetries: Int = 3,
           baseDelayMs: Long = 1000, jitterMs: Long = 250): Unit = {
    val opIdx = df.schema.fieldIndex(opCol)
    df.foreachPartition { it: Iterator[Row] =>
      writer.open()
      val buf = mutable.Map(
        OpCreate -> Vector.empty[Row],
        OpUpdate -> Vector.empty[Row],
        OpDelete -> Vector.empty[Row])
      def flush(op: String): Unit = {
        val batch = buf(op)
        if (batch.nonEmpty) {
          Retry.withBackoff(maxRetries, baseDelayMs, jitterMs) {
            op match {
              case OpCreate => writer.create(batch)
              case OpUpdate => writer.update(batch)
              case OpDelete => writer.delete(batch)
            }
          }
          buf(op) = Vector.empty
        }
      }
      try {
        it.foreach { row =>
          val op = row.getString(opIdx)
          require(buf.contains(op), s"unknown reverse-ETL op '$op'")
          buf(op) = buf(op) :+ row
          if (buf(op).size >= batchSize) flush(op)
        }
        buf.keys.foreach(flush)
      } finally writer.close()
    }
  }
}
