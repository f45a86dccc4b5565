package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join: each left row picks the most recent right row
  * with the same key and right time ≤ left time — the state-at-event-time
  * operator behind feature lookups, slowly-changing-dimension reads, and
  * trade/quote alignment. Spark has no built-in; the naive range join is a
  * per-key cross product.
  *
  * Implementation is the union-sort trick: tag both sides, union, and take a
  * running `last(right_payload, ignoreNulls)` over a (key)-partitioned
  * window ordered by (time, side) — right rows sort before left rows at
  * equal times, so ties match inclusively (DuckDB ASOF `>=` semantics;
  * `strict = true` flips the tie order for `>`). Scale shape: ONE shuffle on
  * the key and a per-key sort — no join explosion, no per-row probe, and
  * the window is frame-bounded running state, never a whole-partition
  * buffer.
  */
object AsofJoin {

  /** Backward as-of join (the asof default). `on` columns must exist under
    * the same names on both sides; `rightValues` are the right-side columns
    * delivered to each left row (suffixed, null when no right row precedes).
    * Right rows with a null key or null time never match, mirroring SQL
    * equality-join null semantics.
    */
  def asofJoin(left: DataFrame, right: DataFrame, on: Seq[String],
               leftTime: String, rightTime: String,
               rightValues: Seq[String], strict: Boolean = false,
               suffix: String = "_right"): DataFrame = {
    require(on.nonEmpty, "asofJoin requires at least one key column")
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    val r = right
      .where(on.map(col(_).isNotNull).reduce(_ && _) &&
        col(rightTime).isNotNull)
      .select(on.map(col) ++ Seq(col(rightTime).as("__t"),
        lit(0).as("__side"),
        struct(rightValues.map(col): _*).as("__rv")): _*)
    val u = l.unionByName(r, allowMissingColumns = true)
    val ord =
      if (strict) Seq(col("__t").asc, col("__side").desc)
      else Seq(col("__t").asc, col("__side").asc)
    val w = Window.partitionBy(on.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = u
      .withColumn("__m", last(col("__rv"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .drop("__t", "__side", "__rv")
    rightValues.foldLeft(matched) { (d, c) =>
      d.withColumn(c + suffix, col("__m").getField(c))
    }.drop("__m")
  }
}
