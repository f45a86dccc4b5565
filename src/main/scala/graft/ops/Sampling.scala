package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic sampling and dataset splitting for training-data pipelines.
  *
  * Everything here is a pure projection or filter on a content hash of the
  * row's id — no RNG state, no shuffle, no driver coordination — so split
  * membership is reproducible across runs, engines, partitionings and
  * cluster sizes (the property a 100 TB pipeline needs: re-running a stage
  * must not re-deal the train/test split). The hash is the first 8 hex
  * digits of md5, which every engine computes identically.
  */
object Sampling {

  /** Deterministic hash of an id into [0, 1): first 8 md5 hex digits of
    * `"<id>:<salt>"` scaled by 2^-32. Changing the salt re-deals every
    * assignment; the same (id, salt) always lands on the same point.
    */
  def hash01(id: Column, salt: String = ""): Column =
    conv(substring(md5(concat(id.cast(StringType), lit(":" + salt))), 1, 8),
      16, 10).cast(LongType).cast(DoubleType) / 4294967296.0

  /** Named split assignment (e.g. train/val/test = 0.9/0.05/0.05): adds a
    * `split` column chosen by where the id hash falls among the cumulative
    * fraction boundaries. Fractions must sum to 1 (the last split absorbs
    * rounding). One codegen'd projection; zero shuffle.
    */
  def hashSplit(df: DataFrame, idCol: String,
                splits: Seq[(String, Double)],
                salt: String = ""): DataFrame = {
    require(splits.nonEmpty, "at least one split required")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${splits.map(_._2).sum}")
    val h = hash01(col(idCol), salt)
    val bounds = splits.scanLeft(0.0)(_ + _._2).tail
    val cases = splits.init.zip(bounds.init).foldLeft[Option[Column]](None) {
      case (acc, ((name, _), hi)) =>
        Some(acc.fold(when(h < hi, name))(_.when(h < hi, name)))
    }
    val assigned = cases.fold(lit(splits.head._1))(_.otherwise(splits.last._1))
    df.withColumn("split", assigned)
  }

  /** Keep a deterministic `fraction` of rows by id hash. Unlike
    * `DataFrame.sample` the kept set is a pure function of (id, salt):
    * stable under retries, re-partitioning and incremental reprocessing.
    */
  def deterministicSample(df: DataFrame, idCol: String, fraction: Double,
                          salt: String = ""): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction must be in [0,1]")
    df.where(hash01(col(idCol), salt) < fraction)
  }

  /** Per-stratum deterministic sampling: each row keeps with the fraction
    * configured for its stratum value (`default` for unlisted strata).
    * Still a single filter projection — the per-stratum rate rides in a
    * CASE chain, so there is no join and no shuffle.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       fractions: Map[String, Double],
                       default: Double = 0.0,
                       salt: String = ""): DataFrame = {
    fractions.values.foreach(f =>
      require(f >= 0.0 && f <= 1.0, "fractions must be in [0,1]"))
    val rate = fractions.foldLeft[Column](lit(default)) {
      case (acc, (value, f)) =>
        when(col(strataCol).cast(StringType) === value, f).otherwise(acc)
    }
    df.where(hash01(col(idCol), salt) < rate)
  }

  // ------------------------------------------------------------ oracle SQL
  /** DuckDB mirrors of the expressions above (same md5 arithmetic). */
  object Sql {
    def hash01(idExpr: String, salt: String = ""): String =
      s"(CAST(CAST(concat('0x', substr(md5(CAST($idExpr AS VARCHAR) || ':$salt'), 1, 8)) AS BIGINT) AS DOUBLE) / 4294967296.0)"

    def splitCase(idExpr: String, splits: Seq[(String, Double)],
                  salt: String = ""): String = {
      val h = hash01(idExpr, salt)
      val bounds = splits.scanLeft(0.0)(_ + _._2).tail
      val whens = splits.init.zip(bounds.init).map { case ((name, _), hi) =>
        s"WHEN $h < $hi THEN '$name'"
      }.mkString(" ")
      s"(CASE $whens ELSE '${splits.last._1}' END)"
    }
  }
}
