package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main (driver contract: print ONE JSON line with the total and
  * per-query seconds).
  *
  * Noise control — r5 vs r6 measured the SAME bits with per-query swings up
  * to 9.2×, so the harness, not the code, was the signal:
  *  - per-query warm-up run (untimed): pays the one-time Janino/codegen plan
  *    compile and session warm-up OUTSIDE the measurement;
  *  - then `RUNS` timed runs; reported value = best, and `spread` =
  *    worst/best of the timed runs so a reader can tell noise from
  *    regression (spread ~1 ⇒ the best is reproducible);
  *  - SPREAD ESCALATION (r7 fix): queries that drive many small
  *    driver-coordinated jobs (k-means, funnel) still swung 2.3–2.7×
  *    within one 3-run bench while single-plan queries agreed to 1.3×.
  *    Any query whose initial spread exceeds `SPREAD_LIMIT` gets extra
  *    timed runs (to `ESCALATED_RUNS` total) and reports the MEDIAN of
  *    all timed runs instead of the best — medians of 7 are stable where
  *    min-of-3 is a lottery. `BENCH_DETAIL.json` carries an `escalated`
  *    flag so the mode switch is visible;
  *  - queries run in sorted order so warm-up attribution is stable
  *    round-over-round.
  *
  * Artifact shape — the driver keeps only a ~2000-char tail of stdout, and
  * 102 full-name queries overflow it (r5/r6 recorded just 63 truncated
  * timings). The stdout line therefore uses the short `qNN` prefix as the
  * key and 3-decimal seconds (~1.3k chars for 102 queries), and the FULL
  * per-query detail (full names, best, spread, every run) goes to
  * `BENCH_DETAIL.json` next to the repo (override: SPARK_GRAFT_BENCH_DETAIL).
  *
  * CROSS-SESSION calibration (r9): within-session spread is controlled by
  * the escalation above, but r7 vs r8 showed the whole SESSION can run
  * ~1.35× slow (identical bits, tight spreads both times — box load /
  * JIT-lottery), polluting round-over-round comparisons. The bench now
  * runs a fixed constant-work probe (one codegen'd hash-reduce scan over
  * 512M longs on all cores + one single-thread CPU spin) FIRST and LAST,
  * and reports `calib`: {pre, post, ref, factor} on the stdout line, where
  * `factor` = mean(pre, post) / CALIB_REF and CALIB_REF is the probe's
  * pinned reading on an idle build box. Per-query normalized values
  * (`value / factor`) go to BENCH_DETAIL.json as `value_norm`. Cross-round
  * comparisons should use value_norm (or divide by factor); a round whose
  * pre/post disagree badly is itself suspect and says so in the artifact.
  *
  * READING THE FACTOR: `post` runs after the full suite has deep-JIT'd
  * the Spark scheduler paths and typically reads 10–20% below `pre`
  * (measured r9: pre 0.654, post 0.528 in a session whose CALIB_ONLY
  * readings were 0.67), while CalibRef is pinned in pre-like cold
  * sessions — so the mean carries a small downward bias and factor
  * deviations within ±10% of 1.0 should be read as unity. The signal
  * this exists for is the ≥1.2× whole-session skew r8 exhibited
  * (factor would read ~1.3), which clears the noise floor decisively.
  *
  * EXECUTION ACTION (r9): the timed action is
  * `df.queryExecution.toRdd.count()` — full computation of every output
  * column of the query AS DECLARED, rows materialized as InternalRows,
  * nothing driver-collected. The previous `df.count()` built a new
  * Aggregate(count) plan over the query, letting Catalyst PRUNE the
  * final projections and drop result sorts — projection-shaped queries
  * measured their scan, not their work (q135 c4_clean read 7.6× low,
  * q66 gopher_rules 6.1×; aggregation-shaped queries were unaffected).
  * The stdout line carries `"action":"toRdd"` so artifacts are
  * comparable only within the same action; r1–r8 artifacts were
  * count()-measured and UNDERSTATE projection-shaped queries.
  */
object Bench {
  /** Pinned idle-box reading of [[calibrationProbe]] (seconds). Measured
    * 2026-08-14 on the round-9 build box (local[32], Java 17): two
    * separate idle JVM sessions read 0.610 / 0.608 (0.3% apart). Re-pin
    * if the hardware changes — only the RATIO across sessions matters.
    * The pin is only meaningful at [[CalibCpus]] cores: the probe's
    * all-core scan scales with parallelism, so a 4-core session would
    * read ~4× high for reasons that are config, not slowness. Sessions
    * at any other core count ship factor = 1 (normalization off) and
    * say so in the artifact rather than silently conflating core count
    * with session skew.
    */
  val CalibRef = 0.609

  /** Core count [[CalibRef]] was pinned at. */
  val CalibCpus = 32

  /** Fixed constant-work probe: (a) one whole-stage-codegen scan that
    * hash-reduces 512M longs across all cores — exercises scheduling,
    * codegen and memory bandwidth; (b) one single-threaded multiply-add
    * spin of 2^28 iterations — exercises raw per-core clock/JIT state.
    * Work is constant by construction, so wall time moves only with the
    * session/box, which is exactly the nuisance factor to divide out.
    */
  def calibrationProbe(spark: SparkSession): Double = {
    import org.apache.spark.sql.functions._
    val t0 = System.nanoTime()
    spark.range(0L, 512L << 20, 1L,
        spark.sparkContext.defaultParallelism)
      .select(bit_xor(xxhash64(col("id")))).collect()  // xor: no ANSI overflow
    var x = 0x9e3779b97f4a7c15L
    var i = 0
    while (i < (1 << 28)) {
      x = x * 6364136223846793005L + 1442695040888963407L; i += 1
    }
    if (x == 42L) System.err.println("")  // keep the spin live (no DCE)
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL",
      "/root/repo/BENCH_DETAIL.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      // toRdd.count(): executes the query's OWN plan (every output column
      // computed, sorts retained) without collecting rows to the driver —
      // a count() on top would let Catalyst prune the final projections
      try { fn(spark, sfDir).queryExecution.toRdd.count() }
      catch { case _: Throwable => -1L }
      (System.nanoTime() - t0) / 1e9
    }
    val spreadLimit = sys.env.getOrElse("SPARK_GRAFT_SPREAD_LIMIT", "1.5").toDouble
    val escalatedRuns = sys.env.getOrElse("SPARK_GRAFT_ESCALATED_RUNS", "7").toInt
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    // calibration: one untimed warm-up pays the probe's own codegen, then
    // best-of-3 timed — run before the suite and again after it
    def calib(): Double = {
      calibrationProbe(spark)
      Seq.fill(3)(calibrationProbe(spark)).min
    }
    val calibPre = calib()
    // probe-only mode: print the calibration reading and exit — used to
    // (re)pin CalibRef and to sanity-check a session before a full bench
    if (sys.env.get("SPARK_GRAFT_CALIB_ONLY").contains("1")) {
      println(s"""{"metric":"calib","value":$calibPre,"unit":"sec","ref":$CalibRef}""")
      spark.stop(); return
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val warm = time(fn)                       // untimed: codegen + warm-up
      val initial = Seq.fill(runs)(time(fn))
      val noisy = initial.max / math.max(initial.min, 1e-9) > spreadLimit
      val timed =
        if (noisy) initial ++ Seq.fill(math.max(0, escalatedRuns - runs))(time(fn))
        else initial
      val value = if (noisy) median(timed) else timed.min
      (name, value, timed.max / math.max(timed.min, 1e-9), warm, timed, noisy)
    }
    val calibPost = calib()
    // the pin is only valid at CalibCpus cores — at any other parallelism
    // the probe reading moves for config reasons, so normalization is OFF
    // (factor 1) and the artifact says why
    val calibPinned =
      scala.util.Try(cpus.trim.toInt).toOption.contains(CalibCpus)
    val factor =
      if (calibPinned) math.max((calibPre + calibPost) / 2 / CalibRef, 1e-9)
      else 1.0
    def r3(d: Double) = math.rint(d * 1000) / 1000
    val qs = results.map { case (k, v, _, _, _, _) =>
      "\"" + k.takeWhile(_ != '_') + "\":" + r3(v)
    }.mkString("{", ",", "}")
    val total = r3(results.map(_._2).sum)
    val calibJson = s"""{"pre":${r3(calibPre)},"post":${r3(calibPost)},""" +
      s""""ref":$CalibRef,"factor":${r3(factor)},""" +
      s""""cpus":"$cpus","pinned_cpus":$CalibCpus,"pinned":$calibPinned}"""
    val detail = results.map { case (k, v, spread, warm, timed, noisy) =>
      s"""  "$k": {"value": ${r3(v)}, "value_norm": ${r3(v / factor)}, """ +
        s""""spread": ${r3(spread)}, """ +
        s""""escalated": $noisy, "warmup": ${r3(warm)}, """ +
        s""""runs": [${timed.map(r3).mkString(", ")}]}"""
    }.mkString("{\n  \"__calib\": " + calibJson + ",\n", ",\n", "\n}")
    try Files.writeString(Paths.get(detailPath), detail)
    catch { case e: Throwable =>
      System.err.println(s"[bench] detail write failed: ${e.getMessage}") }
    println(s"""{"metric":"total","value":$total,"unit":"sec",""" +
      s""""action":"toRdd","calib":$calibJson,""" +
      s""""total_norm":${r3(total / factor)},""" +
      s""""queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
