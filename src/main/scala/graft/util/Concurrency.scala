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
    // every unit runs under one shared job group so the error path can
    // cancel the SIBLING Spark jobs still running (r16 ADVICE:
    // Future.sequence rethrows the first failure while the pool's
    // graceful shutdown() would let orphaned jobs burn executors to
    // completion). setJobGroup is thread-local, so tagging happens
    // inside each unit, and pool threads are fresh per call — no group
    // leaks across calls.
    val sc = org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sparkContext)
    val group = "graft-conc-" + java.lang.Long.toHexString(System.nanoTime())
    try Await.result(Future.sequence(items.map(i => Future {
      sc.foreach(_.setJobGroup(group, "graft concurrent unit",
        interruptOnCancel = true))
      work(i)
    })), Duration.Inf)
    catch { case e: Throwable =>
      sc.foreach(_.cancelJobGroup(group))
      pool.shutdownNow()
      throw e
    }
    finally pool.shutdown()
  }
}
