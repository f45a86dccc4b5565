package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.frame.WoodworkFrame
import graft.types.LogicalType

/** Demo dataset loader (reference: woodwork/demo/retail.py `load_retail`).
  *
  * The reference streams a hosted online-retail CSV; this environment has no
  * egress, so the same 11-column table is GENERATED deterministically as a
  * distributed projection over spark.range — identical schema, identical
  * logical-type assignments, identical index/time_index contract, synthetic
  * content. No driver-side data: nrows scales to any size.
  */
object Demo {

  private val Countries = Seq("United Kingdom", "France", "Germany", "Spain",
    "Netherlands", "Belgium", "Norway", "Australia")
  private val Adjectives = Seq("red", "blue", "vintage", "glass", "wooden",
    "small", "large", "festive")
  private val Nouns = Seq("lantern", "mug", "clock", "frame", "candle",
    "basket", "ornament", "sign")

  /** Build the demo retail table (reference: retail.py:14-70). */
  def loadRetail(spark: SparkSession, nrows: Long = 2000L,
                 id: String = "demo_retail_data",
                 initWoodwork: Boolean = true): Either[DataFrame, WoodworkFrame] = {
    val k = col("id")
    def pick(values: Seq[String], key: org.apache.spark.sql.Column) =
      element_at(array(values.map(lit): _*), (key % values.size).cast(IntegerType) + 1)
    val quantity = (k % 12 + 1).cast(LongType)
    val unitPrice = round(((k * 37) % 5000).cast(DoubleType) / 100.0 + 0.25, 2)
    val cancelled = k % 17 === 0
    val df = spark.range(nrows).select(
      k.cast(LongType).as("order_product_id"),
      concat(lit("order_"), (k / 5).cast(LongType).cast(StringType)).as("order_id"),
      concat(lit("prod_"), (k % 97).cast(StringType)).as("product_id"),
      concat_ws(" ", pick(Adjectives, k), pick(Nouns, k * 7 + 3)).as("description"),
      quantity.as("quantity"),
      timestamp_seconds(
        unix_timestamp(to_timestamp(lit("2018-01-01 08:00:00"))) +
          (k / 50).cast(LongType) * 86400L + (k % 9) * 3600L).as("order_date"),
      unitPrice.as("unit_price"),
      concat(lit("customer_"), (k % 200).cast(StringType)).as("customer_name"),
      pick(Countries, k * 13 + 1).as("country"),
      // cancelled orders carry negative totals, like the real retail log
      round(when(cancelled, -quantity * unitPrice)
        .otherwise(quantity * unitPrice), 2).as("total"),
      cancelled.as("cancelled"))
    if (!initWoodwork) Left(df)
    else Right(WoodworkFrame.init(df,
      name = Some(id),
      index = Some("order_product_id"),
      timeIndex = Some("order_date"),
      logicalTypes = Map(
        "order_product_id" -> LogicalType.Categorical,
        "order_id" -> LogicalType.Categorical,
        "product_id" -> LogicalType.Categorical,
        "description" -> LogicalType.NaturalLanguage,
        "quantity" -> LogicalType.Integer,
        "order_date" -> LogicalType.Datetime(),
        "unit_price" -> LogicalType.Double,
        "customer_name" -> LogicalType.Categorical,
        "country" -> LogicalType.Categorical,
        "total" -> LogicalType.Double,
        "cancelled" -> LogicalType.BooleanT())))
  }
}
