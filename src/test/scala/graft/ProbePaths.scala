package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev probe (r14): decompose the segmented paths rework — time the
  * in-segment lead branch, the boundary-state branch, and the full op
  * against the old whole-actor lead() form.
  */
object ProbePaths {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_x30"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(f: => Any): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val evs = Queries.table(spark, dir, "events")
    import org.apache.spark.sql.expressions.Window
    val length = 3
    val m = length - 1
    val gapMicros = 172800L * 1000000L
    val segMicros = 86400L * 1000000L
    val tt = unix_micros(col("ts").cast(TimestampType))
    val base = evs
      .where(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_type").isNotNull)
      .select(col("user_id").as("__a"), tt.as("__t"),
        col("event_type").as("__y"),
        (tt - pmod(tt, lit(segMicros))).as("__seg"),
        col("event_id").as("__o0"))
    val ord = Seq(col("__t").asc_nulls_last, col("__y").asc_nulls_last,
      col("__o0").asc_nulls_last)
    val w = Window.partitionBy(col("__a"), col("__seg")).orderBy(ord: _*)
    def inBranch(): DataFrame = {
      val stepped = (1 until length).foldLeft(base) { (d, i) =>
        d.withColumn(s"__y$i", lead(col("__y"), i).over(w))
          .withColumn(s"__t$i", lead(col("__t"), i).over(w))
      }
      val complete = (1 until length)
        .map(i => col(s"__y$i").isNotNull).reduce(_ && _)
      val gapOkLead = (1 until length).map { i =>
        val prev = if (i == 1) col("__t") else col(s"__t${i - 1}")
        col(s"__t$i") - prev <= lit(gapMicros)
      }.reduce(_ && _)
      stepped.where(complete && gapOkLead)
        .select(col("__a"), array(col("__y") +:
          (1 until length).map(i => col(s"__y$i")): _*).as("__w"))
    }
    def segStateF(): DataFrame = {
      val evStruct = struct(col("__t").as("t"), col("__y").as("y"))
      base
        .withColumn("__rn", row_number().over(w))
        .withColumn("__cnt", count(lit(1)).over(
          w.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)))
        .groupBy(col("__a"), col("__seg"))
        .agg(
          sort_array(collect_list(when(col("__rn") <= m, evStruct)))
            .as("h"),
          sort_array(collect_list(when(col("__rn") > col("__cnt") - m,
            evStruct))).as("tl"),
          count(lit(1)).as("n"))
    }
    def boundBranch(): DataFrame = {
      def gapOk(wn: Column): Column =
        forall(zip_with(slice(wn, 1, m), slice(wn, 2, m),
          (a, b) => b("t") - a("t") <= lit(gapMicros)), x => x)
      def types(wn: Column): Column = transform(wn, e => e("y"))
      def lastN(arr: Column): Column =
        when(size(arr) <= m, arr).otherwise(slice(arr, -m, m))
      val segsSorted = sort_array(collect_list(struct(
        col("__seg").as("s"), col("h").as("h"), col("tl").as("tl"),
        col("n").as("n"))))
      segStateF()
        .groupBy(col("__a"))
        .agg(segsSorted.as("__segs"))
        .select(col("__a"), explode({
          val emptyEvs = slice(element_at(col("__segs"), 1)("h"), 1, 0)
          val emptyWins = slice(array(types(emptyEvs)), 1, 0)
          val zero = struct(emptyEvs.as("c"), emptyWins.as("o"))
          aggregate(col("__segs"), zero, (st, sv) => {
            val carry = st("c")
            val cSz = size(carry)
            val cStarts = filter(sequence(lit(1), greatest(cSz, lit(1))),
              i => i <= cSz)
            val newWins = filter(transform(cStarts, i => {
              val take = cSz - i + lit(1)
              val needed = lit(length) - take
              val wn = concat(slice(carry, i, take),
                slice(sv("h"), lit(1), needed))
              when(needed <= sv("n") && gapOk(wn), types(wn))
            }), wn => wn.isNotNull)
            struct(lastN(concat(carry, sv("tl"))).as("c"),
              concat(st("o"), newWins).as("o"))
          }).getField("o")
        }).as("__w"))
    }
    def full(): DataFrame = graft.ops.EventAnalytics.topEventPaths(
      evs, "user_id", "ts", "event_type", length = 3, k = 10,
      maxGapSeconds = 172800L, orderCols = Seq("event_id"))
    for ((name, fn) <- Seq(
        "inBranch" -> (() => inBranch()),
        "segState" -> (() => segStateF()),
        "boundary" -> (() => boundBranch()),
        "full" -> (() => full()))) {
      fn().queryExecution.toRdd.count() // warm
      val best = (1 to 3).map(_ =>
        t(fn().queryExecution.toRdd.count())).min
      println(f"[paths] $name%-10s $best%6.2fs")
    }
    spark.stop()
  }
}
