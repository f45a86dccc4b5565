package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import java.util.concurrent.atomic.AtomicLong

/** Dev probe: exact vs HLL-screened key profiling on a WIDE lattice —
  * the 100 TB shape question is twofold: how many exact distinct
  * shuffles does the screen save when most candidates are nowhere near
  * unique, and how many SHUFFLE BYTES (the wire currency a local[32]
  * wall-clock can't see) does that translate to.
  * Usage: Test/runMain graft.ProbeScreen [sfDir]
  */
object ProbeScreen {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val shuffleBytes = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(
          s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    def time[A](label: String)(f: => A): A = {
      shuffleBytes.set(0)
      val t0 = System.nanoTime(); val r = f
      val secs = (System.nanoTime() - t0) / 1e9
      // stage-completed events are async; let the bus drain
      Thread.sleep(300)
      println(f"[probe] $label%-22s $secs%8.2f s  " +
        f"shuffle=${shuffleBytes.get / 1024.0 / 1024.0}%9.2f MiB")
      r
    }
    val li = Queries.table(spark, dir, "lineitem")
    // 30-candidate lattice: 8 singles + 22 pairs over the value columns —
    // only (l_orderkey, l_linenumber) is a key, everything else is far
    // from unique and should fall to the screen
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_shipdate", "l_returnflag")
    val lattice = (cols.map(Seq(_)) ++ cols.combinations(2)).take(30)
    println(s"[probe] candidates: ${lattice.size}, rows: ${li.count()}")
    for (i <- 1 to 2) {
      val exact = time(s"exact run$i")(
        stats.KeyDiscovery.compositeCandidateKeys(li, lattice)
          .collect().count(_.getBoolean(5)))
      val (profiles, nConfirm) = time(s"screened run$i")(
        stats.KeyDiscovery.profileTuplesScreened(li, lattice, 0.02))
      val keys = profiles.count { case ((n, d, z), _) => z == 0L && d == n }
      println(s"[probe] keys exact=$exact screened=$keys agree=${exact == keys}" +
        s" exact_jobs=${lattice.size} -> confirms=$nConfirm")
    }
    spark.stop()
  }
}
