package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Range (point-in-interval) join: each point row matches every interval row
  * with lo ≤ point ≤ hi. Spark plans a raw BETWEEN join as a broadcast
  * nested loop (or worse, a cartesian product) — quadratic the moment both
  * sides are large. The scale path is bin bucketing: intervals explode to
  * the fixed-width bins they cover, points map to their single bin, and the
  * match becomes a bin equi-join (ONE shuffle on the bin id) followed by the
  * exact containment filter. Each (point, interval) candidate appears
  * exactly once — a point owns one bin and an interval covers it once — so
  * no dedup pass is needed.
  *
  * `binWidth` trades shuffle fan-out for candidate precision: bins much
  * wider than typical intervals → few explode rows but loose candidates;
  * much narrower → tight candidates but interval rows explode to many bins.
  * A good default is the typical interval width.
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      binWidth: Double,
                      suffix: String = "_iv"): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    Seq(points, intervals).foreach(df =>
      require(!df.columns.contains("__bin"),
        "column '__bin' collides with the bin-join internal alias"))
    def bin(c: Column): Column =
      floor(c.cast(DoubleType) / lit(binWidth)).cast(LongType)
    val p = points.where(col(pointCol).isNotNull)
      .withColumn("__bin", bin(col(pointCol)))
    val ivCols = intervals.columns
    val iv = intervals
      .where(col(loCol).isNotNull && col(hiCol).isNotNull &&
        col(loCol) <= col(hiCol))
      .withColumn("__bin",
        explode(sequence(bin(col(loCol)), bin(col(hiCol)))))
      .select(col("__bin") +: ivCols.map(c => col(c).as(c + suffix)): _*)
    p.join(iv, Seq("__bin"))
      .where(col(pointCol) >= col(loCol + suffix) &&
        col(pointCol) <= col(hiCol + suffix))
      .drop("__bin")
  }

  /** INTERVAL-OVERLAP join: every left interval matches every right
    * interval it intersects (inclusive endpoints — touching intervals
    * match; zero-width intervals behave as points). The naive predicate
    * `l.lo <= r.hi AND r.lo <= l.hi` plans as a nested loop; the scale
    * path is the same bin bucketing as [[pointInInterval]] with BOTH
    * sides exploded to their covered bins and the match reduced to a bin
    * equi-join (ONE shuffle on the bin id) plus the exact overlap
    * filter. A pair intersecting across several shared bins would match
    * once per bin — the FIRST-SHARED-BIN rule dedups without a distinct
    * pass: the intersection of an overlapping pair starts at
    * `max(l.lo, r.lo)`, both sides cover that bin, and the candidate is
    * kept only where the join bin equals `bin(max(l.lo, r.lo))` — each
    * overlapping pair survives in exactly one bin, non-overlapping
    * candidates die on the exact filter.
    *
    * `binWidth` trades fan-out for precision exactly as in
    * [[pointInInterval]] (a good default is the typical interval
    * width); a single enormous interval explodes to span/binWidth bin
    * rows — bounded, but priced by the caller's width choice. Temporal
    * intervals join on their epoch numbers (`unix_micros`/
    * `unix_seconds` cast by the caller). Null or inverted (lo > hi)
    * intervals are ignored on both sides. Bin assignment divides the
    * RAW bound values as doubles — self-consistent under rounding (the
    * first-shared-bin rule survives double rounding because both sides
    * round identically), but bounds above 2⁵³ lose integer precision
    * and may misbucket BOTH sides together: epoch-micros past ~2255 CE,
    * or raw nanosecond epochs, need a caller-side rescale first (the
    * same 2⁵³ rationale that makes [[EventAnalytics]] bucket with
    * `pmod` Long arithmetic instead of division).
    *
    * Output: the left columns under their own names + every right
    * column suffixed; one row per overlapping pair.
    */
  def intervalOverlap(left: DataFrame, leftLo: String, leftHi: String,
                      right: DataFrame, rightLo: String, rightHi: String,
                      binWidth: Double,
                      suffix: String = "_r"): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    Seq(leftLo, leftHi).foreach(c => require(left.columns.contains(c),
      s"column '$c' not in left frame"))
    Seq(rightLo, rightHi).foreach(c => require(right.columns.contains(c),
      s"column '$c' not in right frame"))
    require(left.columns.intersect(
      right.columns.map(_ + suffix)).isEmpty,
      s"suffix '$suffix' does not disambiguate the right columns")
    Seq(left, right).foreach(df =>
      require(!df.columns.contains("__bin"),
        "column '__bin' collides with the bin-join internal alias"))
    def bin(c: Column): Column =
      floor(c.cast(DoubleType) / lit(binWidth)).cast(LongType)
    def exploded(df: DataFrame, lo: String, hi: String,
                 rename: String => String) =
      df.where(col(lo).isNotNull && col(hi).isNotNull &&
          col(lo) <= col(hi))
        .withColumn("__bin", explode(sequence(bin(col(lo)), bin(col(hi)))))
        .select(col("__bin") +:
          df.columns.map(c => col(c).as(rename(c))): _*)
    val l = exploded(left, leftLo, leftHi, identity)
    val r = exploded(right, rightLo, rightHi, _ + suffix)
    l.join(r, Seq("__bin"))
      .where(col(leftLo) <= col(rightHi + suffix) &&
        col(rightLo + suffix) <= col(leftHi) &&
        col("__bin") === bin(greatest(col(leftLo), col(rightLo + suffix))))
      .drop("__bin")
  }
}
