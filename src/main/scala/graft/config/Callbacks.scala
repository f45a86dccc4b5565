package graft.config

/** Progress-callback plumbing (reference: woodwork/utils.py:544-592
  * `CallbackCaller`): a callback receives
  * (update, progress, total, unit, elapsedSeconds) after each unit of work.
  * Thread-safe — dependence reports from concurrent per-pair jobs.
  */
final class CallbackCaller(
    callback: Option[(Long, Long, Long, String, Double) => Unit],
    unit: String,
    val total: Long) {
  private val startNs = System.nanoTime()
  private var progressed = 0L

  def progress: Long = synchronized(progressed)

  /** Report `n` units of new progress (reference: utils.py:570-592). */
  def update(n: Long): Unit = callback.foreach { f =>
    val p = synchronized { progressed += n; progressed }
    f(n, p, total, unit, (System.nanoTime() - startNs) / 1e9)
  }
}
