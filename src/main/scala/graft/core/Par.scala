package graft.core

/** Driver-side concurrency for INDEPENDENT Spark actions: SparkContext
  * is thread-safe and schedules concurrent job DAGs across the same
  * executor pool, so two actions whose cost is dominated by per-job
  * fixed overhead (staging materializations, sibling-table bucketed
  * appends — measured ~0.7 s each at micro-batch delta sizes, almost
  * all of it writer/commit fixed cost) overlap instead of serializing.
  * Only for actions with NO ordering contract between them: crash-
  * consistency orderings (e.g. "the node store gates the fold, so it
  * lands last") must stay sequential around the concurrent pair.
  * Failures propagate — if either side throws, the caller's fold aborts
  * before any dependent step. */
object Par {

  def awaitBoth[A, B](a: => A, b: => B): (A, B) = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val fa = Future(a)
    val fb = Future(b)
    (Await.result(fa, Duration.Inf), Await.result(fb, Duration.Inf))
  }
}
