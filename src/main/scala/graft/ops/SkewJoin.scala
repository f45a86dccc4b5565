package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Skew-guarded same-group self-join for candidate-pair generation.
  *
  * The naive bucket self-join (`b.as("x").join(b.as("y"), keys && x.id <
  * y.id)`) is quadratic in the LARGEST bucket — and near-duplicate-heavy
  * corpora (exactly where dedup runs) produce degenerate buckets whose single
  * join task explodes at scale.
  *
  * Guard: bucket sizes come from a count window over the bucket key (the
  * per-bucket window task is O(n), never quadratic); buckets above
  * `chunkSize` grid-split — rows hash into `nc = ceil(n/chunkSize)` chunks,
  * every unordered chunk cell (i ≤ j) becomes its own join task, so no task
  * compares more than ~chunkSize² candidates and the full pair set is
  * preserved exactly. Cold buckets (nc = 1) degenerate to the plain
  * single-cell join — same pair volume, no replication.
  *
  * Plan shape: both join sides derive from the SAME windowed child, so the
  * bucket-key exchange (which carries any expensive upstream compute, e.g.
  * per-row minhash signatures) is planned once and reused — the input is
  * never evaluated per side.
  */
object SkewJoin {

  /** All unordered same-group pairs `(x, y)` with `x_id < y_id`, emitted
    * exactly once, per-task work bounded by ~chunkSize². Output columns:
    * `x_<c>` / `y_<c>` for `idCol` and each payload column.
    *
    * @param keys      group (bucket) key columns
    * @param idCol     unique row id (ordering + chunk hash)
    * @param payload   extra columns to carry through on both sides
    * @param chunkSize rows per chunk; groups at or below this size join plain
    * @param maxChunks replication cap for a single pathological group
    */
  def selfPairs(df: DataFrame, keys: Seq[String], idCol: String,
                payload: Seq[String] = Nil, chunkSize: Int = 4096,
                maxChunks: Int = 64): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
    val withC = df
      .withColumn("__nc",
        least(ceil(count(lit(1)).over(w) / lit(chunkSize)), lit(maxChunks))
          .cast(IntegerType))
      .withColumn("__c",
        pmod(xxhash64(col(idCol)), col("__nc")).cast(IntegerType))
    val carry = idCol +: payload
    // x covers cells (c, j) for j ≥ c; y covers cells (i, c) for i ≤ c — an
    // unordered pair of chunks (i ≤ j) meets in exactly one cell
    val xs = withC
      .withColumn("__gj", explode(sequence(col("__c"), col("__nc") - 1)))
      .select(keys.map(col) ++ Seq(col("__c").as("__gi"), col("__gj")) ++
        carry.map(n => col(n).as(s"x_$n")): _*)
    val ys = withC
      .withColumn("__gi", explode(sequence(lit(0), col("__c"))))
      .select(keys.map(col) ++ Seq(col("__gi"), col("__c").as("__gj")) ++
        carry.map(n => col(n).as(s"y_$n")): _*)
    val joined = xs.join(ys, keys ++ Seq("__gi", "__gj"))
    // diagonal cells contain a whole chunk on both sides: the id-order filter
    // dedups orientations; off-diagonal cells pair two disjoint chunks, so
    // every orientation is a distinct pair — keep it and normalize the order
    val kept = joined.where(col("__gi") < col("__gj") ||
      col(s"x_$idCol") < col(s"y_$idCol"))
    val lt = col(s"x_$idCol") < col(s"y_$idCol")
    kept.select(
      carry.map(n =>
        when(lt, col(s"x_$n")).otherwise(col(s"y_$n")).as(s"x_$n")) ++
      carry.map(n =>
        when(lt, col(s"y_$n")).otherwise(col(s"x_$n")).as(s"y_$n")): _*)
  }

  /** Join-key skew profile: the top-k heaviest key values with their row
    * counts and corpus share — the diagnostic that decides whether a join
    * needs salting / the grid-split ([[selfPairs]]) before it runs. The
    * per-key count table is materialized once (localCheckpoint) so the
    * exact total and the top-k both read the aggregated blocks — the raw
    * input is scanned exactly once.
    *
    * Output: (value, cnt, share) — share = cnt/total rounded to 6 places,
    * ordered heaviest first (value tie-break).
    */
  def skewReport(df: org.apache.spark.sql.DataFrame, keyCol: String,
                 k: Int = 20): org.apache.spark.sql.DataFrame = {
    require(k > 0, s"need k > 0, got $k")
    val counts = df.groupBy(col(keyCol).cast("string").as("value"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val totalRow = counts.agg(sum(col("cnt"))).head()
    // empty input: sum() is null — return an empty report, not an NPE
    if (totalRow.isNullAt(0))
      return counts.withColumn("share", lit(0.0))
    val total = totalRow.getLong(0)
    counts
      .orderBy(col("cnt").desc, col("value").asc)
      .limit(k)
      .withColumn("share",
        round(col("cnt").cast("double") / lit(total.toDouble), 6))
  }
}
