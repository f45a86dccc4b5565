package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev probe: where does q136_gopher_repetition time go at sf0.1. */
object ProbeQ136 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = Queries.table(spark, dir, "documents")
    time("scan only")(docs.count())
    time("tokens only") {
      docs.select(ops.TextAnalysis.tokens(col("text")).as("t"))
        .select(size(col("t"))).agg(sum("size(t)")).head()
    }
    val base = docs.select(col("doc_id").as("id"),
      length(col("text")).as("chars"),
      ops.TextAnalysis.tokens(col("text")).as("__toks"))
    val toks = col("__toks")
    val gramUnits = (2 to 10).map { n =>
      val positions = when(size(toks) >= n,
        sequence(lit(1), size(toks) - (n - 1)))
        .otherwise(array().cast(ArrayType(IntegerType)))
      transform(positions, i => struct(
        lit(n).as("n"), array_join(slice(toks, i, lit(n)), " ").as("u")))
    }
    val exploded = base.select(col("id"), col("chars"),
      explode_outer(concat(gramUnits: _*)).as("e"))
    for (_ <- 1 to 2) time("explode only")(exploded.count())
    val counts = exploded
      .select(col("id"), col("chars"), col("e.n").as("n"), col("e.u").as("u"))
      .groupBy(col("id"), col("chars"), col("n"), col("u"))
      .agg(count(lit(1)).as("cnt"))
    for (_ <- 1 to 2) time("explode+count")(counts.count())
    // codegen-friendly variant: two plain explodes + rowwise slice/join
    val doubled = base
      .select(col("id"), col("chars"), toks,
        explode(array((2 to 10).map(lit): _*)).as("n"))
      .select(col("id"), col("chars"), toks, col("n"),
        explode(when(size(toks) >= col("n"),
          sequence(lit(1), size(toks) - col("n") + 1))
          .otherwise(array().cast(ArrayType(IntegerType)))).as("i"))
      .select(col("id"), col("chars"), col("n"),
        array_join(slice(toks, col("i"), col("n")), " ").as("u"))
    for (_ <- 1 to 2) time("explode2 only")(doubled.count())
    val counts2 = doubled.groupBy(col("id"), col("chars"), col("n"), col("u"))
      .agg(count(lit(1)).as("cnt"))
    for (_ <- 1 to 2) time("explode2+count")(counts2.count())
    // toRdd: a count() on top would prune the 12 per-doc measures out of
    // the final aggregate and understate the query ~9x (see Bench r9)
    for (_ <- 1 to 2) time("full query") {
      Queries.all("q136_gopher_repetition")(spark, dir)
        .queryExecution.toRdd.count()
    }
    // the zero-shuffle per-row twin on the same corpus: same signals as
    // one struct projection (spec-pinned equal to the batch table)
    for (_ <- 1 to 3) time("per-row twin") {
      docs.select(col("doc_id"),
          ops.TextAnalysis.repetitionMetrics(col("text")).as("m"))
        .where(col("m.pass")).count()
    }
    spark.stop()
  }
}
