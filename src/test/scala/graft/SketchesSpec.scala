package graft

import graft.ops.Sketches
import org.apache.spark.sql.functions._

/** Bounded-memory heavy-hitters aggregate: exact regime parity, lossy
  * regime bounds, merge across partitions, SQL registration.
  */
class SketchesSpec extends SparkSpec {

  test("heavy hitters exact regime: equals grouped counts (native + fallback)") {
    import spark.implicits._
    val df = Seq.tabulate(300)(i => (s"g${i % 2}", s"v${i % 7}"))
      .toDF("g", "v").repartition(8) // force multi-partition partials + merge
    val expected = df.groupBy("g", "v").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

    val hh = Sketches.heavyHitters(df, "v", capacity = 16, groupCols = Seq("g"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(hh.map(t => (t._1, t._2, t._3)).toSet == expected)
    assert(hh.forall(t => t._3 == t._4), "exact regime: count_lo == count_hi")

    // fallback path (window-ranked exact groupBy): same rows in this regime
    val fb = Sketches.heavyHitters(df, "v", capacity = 16,
        groupCols = Seq("g"), forceFallback = true)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(fb == expected)
  }

  test("heavy hitters lossy regime: MG bounds hold, frequent values present") {
    import spark.implicits._
    // zipf-ish: value v_k appears 2^(10-k) times for k in 0..9, plus 200
    // singletons — far more distinct values than capacity
    val rows = (0 until 10).flatMap(k => Seq.fill(1 << (10 - k))(s"v$k")) ++
      (0 until 200).map(i => s"rare$i")
    val n = rows.length
    val truth = rows.groupBy(identity).map { case (k, v) => (k, v.length.toLong) }
    val cap = 12
    val hh = Sketches.heavyHitters(rows.toDF("v").repartition(8), "v", cap)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

    assert(hh.length <= cap)
    for ((v, lo, hi) <- hh) {
      val t = truth(v)
      assert(lo <= t && t <= hi, s"$v: bounds [$lo,$hi] miss true $t")
    }
    // every value with frequency > N/(cap+1) is guaranteed tracked
    val guaranteed = truth.filter(_._2 > n.toLong / (cap + 1)).keySet
    assert(guaranteed.subsetOf(hh.map(_._1).toSet),
      s"missing guaranteed hitters: ${guaranteed -- hh.map(_._1).toSet}")
    // heaviest-first presentation
    assert(hh.map(_._2).toSeq == hh.map(_._2).sorted(Ordering[Long].reverse).toSeq)
  }

  test("CMS frequency profile: merged batches equal a whole-table profile, exact on small vocab") {
    import spark.implicits._
    import graft.stats.IncrementalProfile
    val df = (1 to 300).map(i => (i.toLong, s"v${i % 7}")).toDF("id", "c")
    val whole = IncrementalProfile.frequencyProfile(df, Seq("c"))
    val parts = Seq(0, 1, 2).map(k =>
      IncrementalProfile.frequencyProfile(
        df.where(col("id") % 3 === k), Seq("c")))
    val merged = IncrementalProfile.mergeFrequency(parts)
    val vals = (0 until 7).map(i => "c" -> s"v$i")
    def est(p: org.apache.spark.sql.DataFrame) =
      IncrementalProfile.estimateFrequencies(p, vals)
        .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    val exact = df.groupBy("c").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est(merged) == exact)
    assert(est(whole) == exact)
    // unknown value and unknown column estimate 0 / absent-column 0
    val extra = IncrementalProfile.estimateFrequencies(merged,
      Seq("c" -> "never-seen", "nope" -> "v0")).collect()
    assert(extra.map(_.getLong(2)).forall(_ == 0L))
  }

  test("CMS lossy regime: estimates only overcount, and never below truth") {
    import spark.implicits._
    import graft.stats.IncrementalProfile
    val df = (1 to 500).map(i => (i.toLong, s"k${i % 40}")).toDF("id", "c")
    // eps = 0.5 -> width 4: forced collisions among 40 distinct values
    val prof = IncrementalProfile.frequencyProfile(df, Seq("c"), eps = 0.5)
    val vals = (0 until 40).map(i => "c" -> s"k$i")
    val ests = IncrementalProfile.estimateFrequencies(prof, vals)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    val exact = df.groupBy("c").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.forall { case (k, n) => ests(k) >= n })
    assert(exact.exists { case (k, n) => ests(k) > n }) // collisions happened
  }

  test("temperatureWeights: alpha=1 keeps shares, alpha=0 is uniform, 0.5 lifts the tail") {
    import spark.implicits._
    val df = (Seq.fill(80)("big") ++ Seq.fill(20)("small")).toDF("src")
    def w(alpha: Double) = graft.ops.Sampling
      .temperatureWeights(df, "src", alpha)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val w1 = w(1.0)
    assert(w1("big") == 0.8 && w1("small") == 0.2)
    val w0 = w(0.0)
    assert(w0("big") == 0.5 && w0("small") == 0.5)
    val wh = w(0.5)
    assert(wh("small") > 0.2 && wh("small") < 0.5, s"tail lift: $wh")
    assert(math.abs(wh("big") + wh("small") - 1.0) < 1e-9)
  }

  test("ww_heavy_hitters usable from SQL with nulls ignored") {
    import spark.implicits._
    Seq(Some("a"), Some("a"), Some("b"), None, Some("a"))
      .toDF("v").createOrReplaceTempView("hh_in")
    val out = spark.sql(
      "SELECT ww_heavy_hitters(v, 4) AS hh FROM hh_in").collect()(0)
      .getSeq[org.apache.spark.sql.Row](0)
    assert(out.map(r => (r.getString(0), r.getLong(1))) == Seq(("a", 3L), ("b", 1L)))
  }
}
