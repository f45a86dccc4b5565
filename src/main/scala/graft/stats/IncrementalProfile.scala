package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Mergeable column profiles — the incremental flavor of describe for data
  * that arrives in batches (per day, per partition, per ingest shard).
  *
  * At 100 TB you do not re-profile the corpus when a day lands: each batch
  * reduces to a tiny sufficient-statistics table (one row per column), and
  * profiles MERGE by summing/min-maxing those statistics — including
  * distinct counts, which ride as HyperLogLog sketches (Spark's
  * hll_sketch_agg / hll_union_agg, the Apache DataSketches HLL), unioned
  * without rescanning anything. finalize() turns any merged profile into
  * describe-style output; every derived stat (mean, sample std) is computed
  * from the merged sums with explicit arithmetic, so profile(A ∪ B) ==
  * merge(profile(A), profile(B)) exactly.
  */
object IncrementalProfile {

  /** Wide-agg melt: ONE aggregation computing a struct per column, then
    * exploded to one row per column — the shared scaffolding of every
    * profile flavor (a single scan, partial-aggregated map-side).
    */
  private def meltAgg(df: DataFrame, perCol: Seq[Column]): DataFrame =
    df.agg(perCol.head.as("s0"),
        perCol.tail.zipWithIndex.map { case (e, i) => e.as(s"s${i + 1}") }: _*)
      .select(explode(array(perCol.indices.map(i => col(s"s$i")): _*)).as("s"))
      .select(col("s.*"))

  /** One row per column: (column_name, count, null_count, sum, sum_sq,
    * min, max, hll[, kll]) over the given numeric columns. One wide
    * aggregation — a single scan, partial-aggregated map-side.
    *
    * `quantiles = true` additionally carries a KLL doubles sketch (Spark's
    * `kll_sketch_agg_double`, the Apache DataSketches KLL — a mergeable
    * quantile summary with bounded size), making merged profiles able to
    * answer percentile questions without rescanning. Off by default: the
    * extra sketch costs ~k doubles per (column × batch).
    */
  def profile(df: DataFrame, cols: Seq[String],
              quantiles: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "at least one column required")
    val perCol = cols.map { c0 =>
      val c = col(c0).cast(DoubleType)
      val base = Seq(
        lit(c0).as("column_name"),
        count(lit(1)).as("count"),
        count(when(col(c0).isNull, 1)).as("null_count"),
        sum(c).as("sum"),
        sum(c * c).as("sum_sq"),
        min(c).as("min"),
        max(c).as("max"),
        // the sketch accepts int/long/string/binary only — doubles sketch
        // their canonical string rendering (distinct-preserving)
        hll_sketch_agg(col(c0).cast(StringType)).as("hll"))
      val withKll =
        if (quantiles) base :+ call_function("kll_sketch_agg_double", c).as("kll")
        else base
      struct(withKll: _*)
    }
    meltAgg(df, perCol)
  }

  /** Merge any number of profiles (from disjoint row sets of the same
    * table): counts and moments add, bounds min/max, sketches union (HLL
    * always; KLL when the profiles carry one). The shuffle is one groupBy
    * over (columns × batches) rows — nothing rescans the data.
    */
  def merge(profiles: Seq[DataFrame]): DataFrame = {
    require(profiles.nonEmpty, "at least one profile required")
    val unioned = profiles.reduce(_ unionByName _)
    val hasKll = unioned.columns.contains("kll")
    val aggs = Seq(
      sum(col("count")).as("count"),
      sum(col("null_count")).as("null_count"),
      sum(col("sum")).as("sum"),
      sum(col("sum_sq")).as("sum_sq"),
      min(col("min")).as("min"),
      max(col("max")).as("max"),
      hll_union_agg(col("hll")).as("hll")) ++
      (if (hasKll) Seq(call_function("kll_merge_agg_double", col("kll")).as("kll"))
       else Nil)
    unioned.groupBy(col("column_name")).agg(aggs.head, aggs.tail: _*)
  }

  /** Percentiles from a (merged) quantile-carrying profile: one row per
    * column with the requested ranks read off the KLL sketch
    * (`kll_sketch_get_quantile_double`, inclusive-rank convention: the
    * smallest retained value whose rank ≥ p). Requires
    * `profile(quantiles = true)`.
    */
  def quantiles(profile: DataFrame, ps: Seq[Double] = Seq(0.25, 0.5, 0.75),
                roundTo: Int = 4): DataFrame = {
    require(profile.columns.contains("kll"),
      "profile was built without quantiles = true")
    // Labels carry full precision (p25, p99_5, p99_95): rounding p*100 to
    // an integer collides nearby ranks (0.995 and 1.0 would both emit
    // "p100") and duplicate column names break downstream selects. The
    // scaling happens in BigDecimal — (p * 100) in Double space mangles
    // common ranks (0.07*100 = 7.000000000000001 → "p7_000000000000001").
    val qCols = ps.map { p =>
      val scaled = (BigDecimal(p) * 100).underlying.stripTrailingZeros
        .toPlainString.replace(".", "_").replace("-", "m")
      round(call_function("kll_sketch_get_quantile_double",
        col("kll"), lit(p)), roundTo).as(s"p$scaled")
    }
    require(qCols.map(_.toString).distinct.size == qCols.size,
      s"duplicate quantile labels from ps = $ps")
    profile.select(col("column_name") +: qCols: _*).orderBy("column_name")
  }

  /** Describe-style output from a (merged) profile: count, nulls, mean,
    * sample std, min, max, approximate nunique. Derived stats use explicit
    * formulas over the carried sums (numerically: fine for profile-scale
    * reporting; describe() remains the exact path). `count` is the
    * NON-NULL count, matching describe's convention (the profile's raw
    * total stays recoverable as count + null_count).
    */
  def finalize(profile: DataFrame, roundTo: Int = 4): DataFrame = {
    val n = col("count") - col("null_count")
    // all-null columns have n = 0: guard every /n (ANSI mode, the Spark 4
    // default, makes an unguarded divide-by-zero a query-killing error)
    val mean = when(n > 0, col("sum") / n)
    val variance = when(n > 1,
      (col("sum_sq") - col("sum") * col("sum") / n) / (n - lit(1)))
    profile.select(
      col("column_name"),
      n.as("count"),
      col("null_count"),
      round(mean, roundTo).as("mean"),
      round(when(n > 1, sqrt(greatest(variance, lit(0.0)))), roundTo).as("std"),
      round(col("min"), roundTo).as("min"),
      round(col("max"), roundTo).as("max"),
      hll_sketch_estimate(col("hll")).as("nunique_approx"))
  }

  /** One row per column: (column_name, cms) — a mergeable Count–Min
    * frequency sketch (Spark's built-in `count_min_sketch` aggregate)
    * over the column's string rendering, in the same wide-agg melt shape
    * as [[profile]]. The point-frequency third leg of the mergeable
    * profile family: HLL answers "how many distinct", KLL "which
    * quantile", CMS "how often does THIS value occur" — for any value
    * chosen AFTER the scan, without rescanning any batch.
    *
    * All batches must use identical (eps, confidence, seed) — these fix
    * the sketch's (depth, width, seed) geometry, and sketches with
    * different geometry are NOT mergeable (their cells index different
    * hash lattices). [[mergeFrequency]] surfaces a mismatch as an
    * `IncompatibleMergeException` from the union aggregate at execution
    * time ("Cannot merge ... with different depth/width/seed"), never as
    * a silently wrong merged count. Estimates overcount only (within eps·N at the given
    * confidence); with width (= ceil(2/eps)) far above the column's
    * distinct count, collisions are absent and estimates are exact —
    * the regime the driver oracle pins at fixture scale.
    */
  def frequencyProfile(df: DataFrame, cols: Seq[String],
                       eps: Double = 1e-4, confidence: Double = 0.99,
                       seed: Int = 42): DataFrame = {
    require(cols.nonEmpty, "at least one column required")
    val perCol = cols.map { c0 =>
      struct(lit(c0).as("column_name"),
        call_function("count_min_sketch", col(c0).cast(StringType),
          lit(eps), lit(confidence), lit(seed)).as("cms"))
    }
    meltAgg(df, perCol)
  }

  /** Merge frequency profiles from disjoint batches: CMS cells add
    * (`ww_cms_merge`, the union aggregate Spark does not ship). One
    * groupBy over (columns × batches) rows.
    */
  def mergeFrequency(profiles: Seq[DataFrame]): DataFrame = {
    require(profiles.nonEmpty, "at least one profile required")
    profiles.reduce(_ unionByName _)
      .groupBy(col("column_name"))
      .agg(call_function("ww_cms_merge", col("cms")).as("cms"))
  }

  /** Point-frequency estimates from a (merged) frequency profile for the
    * given (column, value) pairs. The sketches are column-count-bounded
    * (one depth×width table each), so reading them driver-side is the
    * intended access path; a column absent from the profile estimates 0.
    */
  def estimateFrequencies(profile: DataFrame,
                          values: Seq[(String, String)]): DataFrame = {
    import org.apache.spark.util.sketch.CountMinSketch
    // a null sketch (merge over zero non-null inputs) estimates like an
    // absent column — 0, not an NPE
    val rows = profile
      .select(col("column_name"), col("cms"))
      .where(col("cms").isNotNull).collect()
      .map(r => r.getString(0) -> CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1))))
    // duplicate column rows mean the caller unioned batch profiles
    // without mergeFrequency — a silent last-row-wins would report one
    // batch's partial counts as the union
    require(rows.map(_._1).distinct.length == rows.length,
      "profile has duplicate column rows — pass it through mergeFrequency first")
    val sketches = rows.toMap
    val spark = profile.sparkSession
    import spark.implicits._
    values.map { case (c, v) =>
      (c, v, sketches.get(c).map(_.estimateCount(v)).getOrElse(0L))
    }.toDF("column_name", "value", "estimate")
  }
}
