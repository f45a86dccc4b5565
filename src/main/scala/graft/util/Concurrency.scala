package graft.util

/** The one shared driver-side fan-out helper: run independent Spark jobs
  * concurrently (Spark schedules concurrent jobs fine; each job shuffles
  * to executors on its own). Latency of k small jobs drops from sum to
  * ~max. Used by describe's per-column group jobs, inference's per-table
  * stats, and dependence's per-pair contingencies.
  */
object Concurrency {
  def runConcurrently[A](items: Seq[A])(work: A => Unit): Unit = {
    if (items.isEmpty) return
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(items.size, 8))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try Await.result(Future.sequence(items.map(i => Future(work(i)))), Duration.Inf)
    finally pool.shutdown()
  }
}
