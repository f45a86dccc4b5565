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
}
