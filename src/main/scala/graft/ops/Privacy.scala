package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Privacy-risk profiling for release governance: k-anonymity and
  * l-diversity over declared quasi-identifier columns — the
  * re-identification counterpart to the PII scanners (Sweeney 2002;
  * Machanavajjhala et al. 2007). A corpus that passes PII redaction can
  * still leak identity through rare attribute COMBINATIONS; these reports
  * measure that tail before data ships.
  *
  * Scale shape: one hash-groupBy on the quasi-identifier tuple builds the
  * equivalence-class table (the only row-scale shuffle), then one bounded
  * aggregation reduces it to a single report row — class-table rows never
  * reach the driver. Nulls form their own class on both sides of the
  * oracle (Spark and SQL GROUP BY agree on null grouping).
  */
object Privacy {

  /** k-anonymity profile: equivalence classes are rows sharing the
    * quasi-identifier tuple; a dataset is k-anonymous iff every class has
    * at least k members. Output (one row): (k, n_rows, n_classes,
    * min_class_size, classes_below_k, rows_below_k, share_below_k,
    * is_k_anonymous).
    */
  def kAnonymity(df: DataFrame, qiCols: Seq[String], k: Int): DataFrame = {
    requireQi(df, qiCols)
    require(k >= 2, s"need k >= 2, got $k")
    val classes = df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("__sz"))
    belowThresholdReport(classes, col("__sz"), k,
      thresholdName = "k", measureName = "min_class_size", suffix = "_k",
      verdictName = "is_k_anonymous")
  }

  /** l-diversity profile: within each quasi-identifier class, the number
    * of DISTINCT sensitive values; a dataset is l-diverse iff every class
    * carries at least l. Null sensitive values don't count as a distinct
    * value (count_distinct skips them — a class of only-null sensitives
    * has diversity 0). Output (one row): (l, n_classes, min_diversity,
    * classes_below_l, rows_below_l, share_below_l, is_l_diverse).
    */
  def lDiversity(df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
                 l: Int): DataFrame = {
    requireQi(df, qiCols)
    require(l >= 2, s"need l >= 2, got $l")
    require(df.columns.contains(sensitiveCol),
      s"column '$sensitiveCol' not in frame")
    val classes = df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("__sz"),
        count_distinct(col(sensitiveCol)).as("__div"))
    belowThresholdReport(classes, col("__div"), l,
      thresholdName = "l", measureName = "min_diversity", suffix = "_l",
      verdictName = "is_l_diverse")
      .drop("n_rows")
  }

  /** t-closeness profile (Li, Li & Venkatasubramanian 2007) — the third
    * member of the privacy family: a dataset is t-close iff every
    * quasi-identifier class's SENSITIVE-value distribution sits within
    * distance t of the global distribution. Distance is the variational
    * distance ½·Σ_v |P(v|class) − P(v)| (the categorical-attribute form;
    * ordered/numeric attributes get the Earth-Mover's-Distance form in
    * [[tClosenessOrdered]]). Rows whose
    * sensitive value is null carry no distribution mass and are excluded
    * from both sides; a class of only-null sensitives vanishes with them.
    *
    * NUMERICAL CONTRACT: per-class distances are computed from exact
    * integer numerators — ½·Σ|c_v·n − g_v·sz| / (sz·n) plus the
    * out-of-class mass (n − Σ g_v)·sz — with ONE double division at the
    * end, so Spark and the SQL oracle produce bit-identical doubles (no
    * float-summation order dependence). The numerator arithmetic runs in
    * DecimalType(38,0): the terms reach n·sz ≈ n², which overflows a
    * Long past ~3·10⁹ non-null rows — exactly the scale this operator is
    * for — while 38 digits stay exact beyond 10¹⁸ rows (DuckDB's side
    * auto-promotes BIGINT sums to HUGEINT, so the oracle agrees).
    *
    * Scale shape: one hash-groupBy on (class, value) builds the
    * class-value table (the only row-scale shuffle); the global
    * distribution is vocabulary-bounded and BROADCAST into it; the class
    * size rides a whole-partition window over the already-reduced table;
    * one bounded aggregation reduces classes to the single report row.
    *
    * Output (one row): (t, n_rows, n_classes, max_distance,
    * classes_above_t, rows_above_t, share_above_t, is_t_close).
    */
  def tCloseness(df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
                 t: Double): DataFrame = {
    requireQi(df, qiCols)
    require(t > 0 && t < 1, s"need 0 < t < 1, got $t")
    require(df.columns.contains(sensitiveCol),
      s"column '$sensitiveCol' not in frame")
    val sens = col(sensitiveCol)
    val nn = df.where(sens.isNotNull)
    // the total rides as a broadcast one-row cross join, NOT an eager
    // count() at construction: the operator stays as lazy as its
    // kAnonymity/lDiversity siblings (a report built before the input
    // settles can't mix a stale total with fresh data, and merely
    // constructing it costs nothing — r11 ADVICE). Like
    // [[tClosenessOrdered]], the global distribution and total DERIVE
    // from the one row-scale class-value aggregation (exact integer sums
    // of its counts), so the base scan+shuffle is shared via exchange
    // reuse instead of re-paid per statistic (r12).
    val cv0 = nn.groupBy((qiCols.map(col) :+ sens.as("__v")): _*)
      .agg(count(lit(1)).as("__c"))
    val globalDist = cv0.groupBy(col("__v"))
      .agg(sum(col("__c")).as("__g"))
    val tot = globalDist.agg(coalesce(sum(col("__g")), lit(0L)).as("__n"))
    val cv = cv0
      .join(broadcast(globalDist), "__v")
      .crossJoin(broadcast(tot))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(qiCols.map(col): _*)
    // Decimal(38,0) keeps c·n / g·sz / their sums exact where Long wraps
    val dec = DecimalType(38, 0)
    val (cD, gD, szD) = (col("__c").cast(dec), col("__g").cast(dec),
      col("__sz").cast(dec))
    val classes = cv
      .withColumn("__sz", sum(col("__c")).over(w))
      .groupBy(qiCols.map(col): _*)
      .agg(first(col("__sz")).as("__sz"), first(col("__n")).as("__n"),
        (sum(abs(cD * col("__n").cast(dec) - gD * szD)) +
          (first(col("__n")).cast(dec) - sum(gD)) * first(szD))
          .as("__num"))
      .select(col("__sz"),
        (col("__num").cast(DoubleType) /
          (lit(2.0) * col("__sz") * col("__n"))).as("__dist"))
    tReport(classes, tot, t)
  }

  /** t-closeness for ORDERED (numeric) sensitive attributes — the
    * Earth-Mover's-Distance form of Li, Li & Venkatasubramanian 2007 §3
    * ([[tCloseness]] implements the categorical variational distance):
    * for the globally-observed ordered value vocabulary v₁ < … < v_m,
    * EMD(class, global) = Σᵢ |Σ_{j≤i} (P(vⱼ|class) − P(vⱼ))| / (m − 1)
    * — the normalized total cost of shifting class probability mass
    * along the value axis, which is what "close" should mean when the
    * sensitive attribute is a salary, an age, a dose. A class
    * concentrated on ADJACENT values reads close under EMD where the
    * variational distance would read it far — the ordered form exists
    * precisely for that case. m = 1 (a single global value) defines
    * distance 0.
    *
    * NUMERICAL CONTRACT ([[tCloseness]]'s, carried over): cumulative
    * differences are exact integer numerators rᵢ = Σ_{j≤i}(cⱼ·n − gⱼ·sz)
    * in DecimalType(38,0) (terms reach n², past Long at ~3·10⁹ rows),
    * per-class distance = (Σᵢ|rᵢ|) / ((m−1)·sz·n) with ONE double
    * division of two exact integers at the end — Spark and the SQL
    * oracle produce bit-identical doubles. Null sensitive values carry
    * no mass (excluded both sides), as in [[tCloseness]].
    *
    * Scale shape: one hash-groupBy on (class, value) builds the
    * class-value table (the only row-scale shuffle); the global
    * distribution is vocabulary-bounded and BROADCAST across a
    * class × vocabulary grid (n_classes·m rows — the EMD needs the
    * zero-count cells, so the grid is the honest cost of the ordered
    * form; it is reduced-data-sized, never row-sized); the cumulative
    * sums ride a per-class window over the grid; one bounded aggregation
    * reduces classes to the single report row. Lazy end-to-end — the
    * total and vocabulary size ride broadcast one-row cross joins.
    *
    * Output (one row): (t, n_rows, n_classes, max_distance,
    * classes_above_t, rows_above_t, share_above_t, is_t_close) — the
    * [[tCloseness]] schema.
    */
  def tClosenessOrdered(df: DataFrame, qiCols: Seq[String],
                        sensitiveCol: String, t: Double): DataFrame = {
    requireQi(df, qiCols)
    require(t > 0 && t < 1, s"need 0 < t < 1, got $t")
    require(df.columns.contains(sensitiveCol),
      s"column '$sensitiveCol' not in frame")
    val sens = col(sensitiveCol)
    val nn = df.where(sens.isNotNull)
    // ONE row-scale aggregation; the global distribution, class sizes,
    // vocabulary size and total all DERIVE from it (exact integer sums of
    // its counts), so the base scan+shuffle is shared via exchange reuse
    // instead of re-paid per statistic
    val cv = nn.groupBy((qiCols.map(col) :+ sens.as("__v")): _*)
      .agg(count(lit(1)).as("__c"))
    val globalDist = cv.groupBy(col("__v"))
      .agg(sum(col("__c")).as("__g"))
    val sizes = cv.groupBy(qiCols.map(col): _*)
      .agg(sum(col("__c")).as("__sz"))
    val tot = globalDist.agg(
      coalesce(sum(col("__g")), lit(0L)).as("__n"),
      count(lit(1)).as("__m"))
    // class × vocabulary grid: EMD needs the zero-mass cells (a value the
    // class never takes still moves the cumulative difference)
    val grid = sizes.crossJoin(broadcast(globalDist))
      .join(cv, qiCols :+ "__v", "left")
      .na.fill(0L, Seq("__c"))
      .crossJoin(broadcast(tot))
    val dec = DecimalType(38, 0)
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(qiCols.map(col): _*)
      .orderBy(col("__v")) // the NATIVE value order — this is the "ordered"
      .rowsBetween(Long.MinValue, 0)
    val cum = grid.withColumn("__r",
      sum(col("__c").cast(dec) * col("__n").cast(dec) -
        col("__g").cast(dec) * col("__sz").cast(dec)).over(wCum))
    val classes = cum
      .groupBy(qiCols.map(col): _*)
      .agg(first(col("__sz")).as("__sz"), first(col("__n")).as("__n"),
        first(col("__m")).as("__m"), sum(abs(col("__r"))).as("__num"))
      .select(col("__sz"),
        when(col("__m") > 1,
          col("__num").cast(DoubleType) /
            ((col("__m").cast(dec) - 1) * col("__sz").cast(dec) *
              col("__n").cast(dec)).cast(DoubleType))
          .otherwise(lit(0.0)).as("__dist"))
    tReport(classes, tot.select(col("__n")), t)
  }

  /** Shared one-row report tail for both t-closeness forms, from a class
    * table carrying (__sz, __dist) and the lazy one-row total (__n) —
    * n_rows joins back from the SAME lazy total (one row × one row), so
    * an empty class table still reports the true n (of zero).
    */
  private def tReport(classes: DataFrame, tot: DataFrame,
                      t: Double): DataFrame =
    classes.agg(
        count(lit(1)).as("n_classes"),
        max(col("__dist")).as("max_distance"),
        count(when(col("__dist") > t, lit(1))).as("classes_above_t"),
        coalesce(sum(when(col("__dist") > t, col("__sz"))), lit(0L))
          .as("rows_above_t"))
      .crossJoin(broadcast(tot))
      .select(lit(t).as("t"), col("__n").as("n_rows"), col("n_classes"),
        coalesce(col("max_distance"), lit(0.0)).as("max_distance"),
        col("classes_above_t"), col("rows_above_t"),
        when(col("__n") === 0, lit(0.0))
          .otherwise(round(col("rows_above_t").cast(DoubleType) /
            col("__n"), 6))
          .as("share_above_t"),
        coalesce(col("max_distance") <= t, lit(true)).as("is_t_close"))

  private def requireQi(df: DataFrame, qiCols: Seq[String]): Unit = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    qiCols.foreach(c => require(df.columns.contains(c),
      s"quasi-identifier '$c' not in frame"))
  }

  /** Shared reduce for both reports: the classes-below-threshold tail and
    * the verdict, from a class table carrying `__sz` (class row count) and
    * the per-class measure. EMPTY-INPUT CONTRACT: zero classes reduce to
    * zeroed counts, share 0.0, and a vacuously-TRUE verdict — never a
    * null verdict that NPEs a release gate's `getBoolean`.
    */
  private def belowThresholdReport(classes: DataFrame, measure: Column,
                                   threshold: Int, thresholdName: String,
                                   measureName: String, suffix: String,
                                   verdictName: String): DataFrame =
    classes.agg(
        coalesce(sum(col("__sz")), lit(0L)).as("n_rows"),
        count(lit(1)).as("n_classes"),
        min(measure).as(measureName),
        count(when(measure < threshold, lit(1))).as(s"classes_below$suffix"),
        coalesce(sum(when(measure < threshold, col("__sz"))), lit(0L))
          .as(s"rows_below$suffix"))
      .select(lit(threshold).cast(LongType).as(thresholdName),
        col("n_rows"), col("n_classes"),
        coalesce(col(measureName), lit(0L)).as(measureName),
        col(s"classes_below$suffix"), col(s"rows_below$suffix"),
        // explicit zero-rows gate: ANSI mode raises on the 0/0 division
        // long before the coalesce could see a null
        when(col("n_rows") === 0, lit(0.0))
          .otherwise(round(col(s"rows_below$suffix").cast(DoubleType) /
            col("n_rows").cast(DoubleType), 6))
          .as(s"share_below$suffix"),
        coalesce(col(measureName) >= threshold, lit(true)).as(verdictName))
}
