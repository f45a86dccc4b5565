package graft

import org.apache.spark.sql.SparkSession

/** Dev probe (r12): the IND screen on a REFUTE-HEAVY lattice. The q147/100×
  * probe (BENCH_SF1 §r11.3) was FK-dominated — true-containment pairs pay
  * the exact confirm under either plan, so the screen's local win read thin
  * (1.25×). Here the lattice is 20 pairs of which most do NOT hold
  * (non-key numeric/date columns with near-disjoint domains), which is where
  * the refute-only screen actually skips work: a refuted pair costs two
  * sketch reads instead of a distinct-set shuffle + join.
  *
  * Usage: Test/runMain graft.ProbeIndRefute [sfDir]
  *        (30×: /tmp/graft_sf3, 100×: /tmp/graft_lo100 — li+ord only)
  */
object ProbeIndRefute {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/graft_sf3"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(f: => Any): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val li = Queries.table(spark, sfDir, "lineitem")
    val ord = Queries.table(spark, sfDir, "orders")
    import graft.stats.KeyDiscovery._
    // 5 × 4 = 20 pairs; only l_orderkey ⊆ o_orderkey holds — the other 19
    // refute (disjoint or overflowing domains), so the screen's skip rate
    // is 19/20 instead of q147's 2/5
    val lcs = Seq("l_orderkey", "l_partkey", "l_extendedprice",
      "l_quantity", "l_suppkey")
    val rcs = Seq("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    def run(s: Screen): Int = {
      val rows = inclusionDependencies(li, lcs, ord, rcs, screen = s)
        .collect()
      rows.count(_.getBoolean(6)) // holding pairs
    }
    // interleave the modes (E,H,E,H,...) so page-cache/JIT/session drift
    // hits both equally; report best + all runs
    run(Screen.Exact); run(Screen.Hll) // warm both
    val runs = (1 to 4).map { _ =>
      (t(run(Screen.Exact)), t(run(Screen.Hll)))
    }
    val (es, hs) = (runs.map(_._1), runs.map(_._2))
    println(f"[probeindrefute] dir=$sfDir exact best=${es.min}%6.2fs " +
      f"runs=${es.map(x => f"$x%.1f").mkString(",")} | " +
      f"hll best=${hs.min}%6.2fs runs=${hs.map(x => f"$x%.1f").mkString(",")}")
    spark.stop()
  }
}
