package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev probe (r12): isolate the per-side `hll_sketch_agg` cost that made
  * the refute-heavy IND screen read 105 s vs exact 41 s at 100× — which
  * input shape is the cost: the DataSketches aggregate itself, the string
  * casts of wide value columns, or the r12 when-gate + concat_ws tuple
  * encoding?
  */
object ProbeSketchCost {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/graft_lo100"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(f: => Any): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val li = Queries.table(spark, sfDir, "lineitem")
    val lcs = Seq("l_orderkey", "l_partkey", "l_extendedprice",
      "l_quantity", "l_suppkey")
    def bare(): Unit = { // r11 shape: plain string cast per column
      val exprs = lcs.map(c => hll_sketch_agg(col(c).cast(StringType), 12).as(c))
      li.agg(exprs.head, exprs.tail: _*).head()
    }
    def gated(): Unit = { // r12 shape: when-gate + concat_ws
      val exprs = lcs.zipWithIndex.map { case (c, i) =>
        hll_sketch_agg(when(col(c).isNotNull,
          concat_ws(" ", col(c).cast(StringType))), 12).as(s"__s$i") }
      li.agg(exprs.head, exprs.tail: _*).head()
    }
    def intsOnly(): Unit = { // are the double casts the cost?
      val cs = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
      val exprs = cs.map(c => hll_sketch_agg(col(c).cast(StringType), 12).as(c))
      li.agg(exprs.head, exprs.tail: _*).head()
    }
    def oneCol(): Unit = { // single-sketch floor
      li.agg(hll_sketch_agg(col("l_orderkey").cast(StringType), 12)).head()
    }
    def approxCd(): Unit = { // the key/FD screen's HLL++ for comparison
      val exprs = lcs.map(c => approx_count_distinct(col(c), 0.02).as(c))
      li.agg(exprs.head, exprs.tail: _*).head()
    }
    def whenOnly(): Unit = { // gate without concat_ws
      val exprs = lcs.map(c => hll_sketch_agg(
        when(col(c).isNotNull, col(c).cast(StringType)), 12).as(c))
      li.agg(exprs.head, exprs.tail: _*).head()
    }
    def concatOnly(): Unit = { // concat_ws without the gate
      val exprs = lcs.map(c => hll_sketch_agg(
        concat_ws(" ", col(c).cast(StringType)), 12).as(c))
      li.agg(exprs.head, exprs.tail: _*).head()
    }
    def hashed(): Unit = { // candidate fix: hash the string casts to a long
      val exprs = lcs.map(c => hll_sketch_agg(
        when(col(c).isNotNull, xxhash64(col(c).cast(StringType))), 12).as(c))
      li.agg(exprs.head, exprs.tail: _*).head()
    }
    for ((n, f) <- Seq[(String, () => Unit)](("bare", bare _),
        ("gated", gated _), ("whenOnly", whenOnly _),
        ("concatOnly", concatOnly _), ("hashed", hashed _),
        ("intsOnly", intsOnly _), ("oneCol", oneCol _),
        ("approxCd", approxCd _))) {
      f()
      val best = (1 to 2).map(_ => t(f())).min
      println(f"[sketchcost] $n%-9s $best%7.2fs")
    }
    spark.stop()
  }
}
