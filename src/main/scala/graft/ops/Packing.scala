package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sequence packing: group documents/chunks into training examples under a
  * token budget — the step between chunking and batch assembly in an LLM
  * data pipeline.
  *
  * Two strategies with different determinism/efficiency trade-offs:
  *
  *  - [[packByCumsum]]: pack id = floor(running-token-total / budget) over a
  *    global order. Fully deterministic and engine-portable (it is a window
  *    cumsum), but a document can straddle two packs (the concat-then-split
  *    convention most pretraining pipelines use anyway).
  *  - [[packGreedyPerPartition]]: classic greedy first-fit — a document
  *    never splits; packs close when the next document would overflow.
  *    Sequential by nature, so it runs per range-partition (each partition
  *    packs independently; pack ids are (partition, local) pairs). At 100 TB
  *    this is the right shape: packing is embarrassingly parallel across
  *    partitions and nobody needs globally-consecutive pack numbers.
  */
object Packing {

  /** Deterministic cumsum packing: pack index = floor(exclusive-prefix-sum
    * (tokens) / budget) over `orderCol`, computed independently per
    * `shardCol` group (pack_id = "shard:index"). A row whose tokens cross
    * the boundary belongs to the pack its FIRST token falls in — the
    * concat-then-split convention.
    *
    * Sharding is what makes this scale: each shard's cumsum is one window
    * partition, so the work parallelizes across shards with a single
    * shuffle. Pass shardCol = None ONLY for bounded inputs — the unsharded
    * cumsum is a deliberate single-task window.
    */
  def packByCumsum(df: DataFrame, orderCol: String, tokenCol: String,
                   budget: Long, shardCol: Option[String] = None): DataFrame = {
    require(budget > 0, "budget must be positive")
    val base = shardCol match {
      case Some(s) => Window.partitionBy(col(s)).orderBy(col(orderCol))
      case None => Window.orderBy(col(orderCol))
    }
    val w = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumBefore = sum(col(tokenCol)).over(w) - col(tokenCol)
    val idx = floor(cumBefore / lit(budget)).cast(LongType)
    val packId = shardCol match {
      case Some(s) => concat(col(s).cast(StringType), lit(":"), idx.cast(StringType))
      case None => idx.cast(StringType)
    }
    df.withColumn("pack_id", packId)
  }

  /** Greedy first-fit packing within each range partition of `orderCol`.
    * Documents longer than the budget get a pack of their own. Output adds
    * `pack_id` (a string "partition:local" — unique, not consecutive).
    * `numPartitions` bounds the sequential work per task.
    */
  def packGreedyPerPartition(df: DataFrame, orderCol: String, tokenCol: String,
                             budget: Long, numPartitions: Int = 200): DataFrame = {
    require(budget > 0, "budget must be positive")
    val sorted = df.repartitionByRange(numPartitions, col(orderCol))
      .sortWithinPartitions(col(orderCol))
    val schema = sorted.schema.add(StructField("pack_id", StringType, nullable = false))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val tokIdx = sorted.schema.fieldIndex(tokenCol)
    sorted.mapPartitions { rows =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var local = 0L
      var used = 0L
      rows.map { r =>
        val t = r.get(tokIdx) match {
          case n: Long => n
          case n: Int => n.toLong
          case other => throw new IllegalArgumentException(s"token count not integral: $other")
        }
        if (used > 0 && used + t > budget) { local += 1; used = 0 }
        used += t
        Row.fromSeq(r.toSeq :+ s"$pid:$local")
      }
    }(enc)
  }

  /** Per-pack summary (count, token total, fill ratio) for either packing. */
  def packStats(packed: DataFrame, tokenCol: String, budget: Long): DataFrame =
    packed.groupBy(col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokenCol)).cast(LongType).as("n_tokens"))
      .withColumn("fill", round(col("n_tokens") / lit(budget.toDouble), 4))
}
