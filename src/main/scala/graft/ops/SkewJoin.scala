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
  *
  * AQE CAVEAT (measured): adaptive partition coalescing sizes reducers by
  * shuffle INPUT bytes, and a candidate join's input is small while its
  * output can be enormous — at toy input sizes AQE may coalesce the grid
  * cells onto few cores and serialize the pair generation. At cluster
  * scale the inputs exceed the 64 MB advisory size and the cells spread;
  * if a small-input/huge-output join must parallelize fully, lower
  * `spark.sql.adaptive.advisoryPartitionSizeInBytes` (or disable
  * `spark.sql.adaptive.coalescePartitions.enabled`) for that job.
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

  /** Grid-split inner equi-join of two DIFFERENT relations for candidate
    * generation — the two-sided sibling of [[selfPairs]]. Per-key chunk
    * counts on both sides bound every join task to ~chunkSize²
    * comparisons while preserving the exact match set: each left row lands
    * in one left-chunk and replicates across the right side's chunk count
    * for its key (and symmetrically), so a grid cell (i, j) holds exactly
    * one chunk of each side and every cross pair meets exactly once. Cold
    * keys (1×1 grid) degenerate to the plain join with zero replication.
    *
    * Costs one per-key count aggregation per side (tiny next to the join),
    * and the count join doubles as key pruning — left rows whose key never
    * occurs on the right are dropped before the pair exchange.
    *
    * Non-key columns of the two inputs must be disjoint (pre-alias them).
    * `leftId` / `rightId` seed the chunk hash: matching is unaffected by
    * their choice, but the ~chunkSize² per-task bound holds only if the
    * id is near-UNIQUE within each hot key — a low-cardinality id
    * collapses a hot key's rows into few chunks, recreating the skew the
    * split exists to break. When no near-unique column exists, pass a
    * synthesized one (e.g. `monotonically_increasing_id()` materialized
    * via withColumn) — the result is id-invariant, only balance changes.
    */
  def gridJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftId: String, rightId: String,
               chunkSize: Int = 4096, maxChunks: Int = 64): DataFrame = {
    val kc = keys.map(col)
    def chunkCounts(df: DataFrame, out: String): DataFrame =
      df.groupBy(kc: _*).agg(
        least(ceil(count(lit(1)) / lit(chunkSize)), lit(maxChunks))
          .cast(IntegerType).as(out))
    val lnc = chunkCounts(left, "__lnc")
    val rnc = chunkCounts(right, "__rnc")
    val l2 = left.join(lnc, keys).join(rnc, keys)
      .withColumn("__gi",
        pmod(xxhash64(col(leftId)), col("__lnc")).cast(IntegerType))
      .withColumn("__gj", explode(sequence(lit(0), col("__rnc") - 1)))
      .drop("__lnc", "__rnc")
    val r2 = right.join(rnc, keys).join(lnc, keys)
      .withColumn("__gj",
        pmod(xxhash64(col(rightId)), col("__rnc")).cast(IntegerType))
      .withColumn("__gi", explode(sequence(lit(0), col("__lnc") - 1)))
      .drop("__lnc", "__rnc")
    l2.join(r2, keys ++ Seq("__gi", "__gj")).drop("__gi", "__gj")
  }

  /** Hot-key salted equi-join of a skewed fact table against a dimension
    * table — the explicit pre-planned form of skew handling for the cases
    * AQE's runtime skew split does not cover (AQE splits sort-merge/shuffle
    * joins only, post-hoc; salting also serves shuffled hash joins,
    * repeatable pre-planned execution, and dims too large to broadcast).
    *
    * Mechanics: one aggregation over the facts finds keys whose row count
    * exceeds `heavyThreshold` (driver state bounded by `maxHeavy` — if more
    * keys than that are hot, raise the threshold or repartition upstream).
    * Hot fact rows scatter across `salt` sub-keys; the dim rows for hot
    * keys replicate `salt` ways so every sub-key finds its match; cold keys
    * keep salt 0 on both sides — no replication, byte-identical to the
    * plain join. Result equals `facts.join(dims, key)` exactly, but no
    * shuffle partition receives more than ~1/salt of any hot key.
    *
    * The fact-side salt is `xxhash64(key, saltSource)` so any expression
    * (an id column, `monotonically_increasing_id()`) spreads rows; the join
    * RESULT is salt-invariant, so the source only affects balance.
    */
  def saltedEquiJoin(facts: DataFrame, dims: DataFrame, key: String,
                     saltSource: org.apache.spark.sql.Column, salt: Int = 16,
                     heavyThreshold: Long = 1000000L,
                     maxHeavy: Int = 10000): DataFrame = {
    require(salt > 1, s"need salt > 1, got $salt")
    val heavyRows = facts.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") > heavyThreshold)
      .orderBy(col("cnt").desc)
      .limit(maxHeavy + 1)
      .select(col(key)).collect().map(_.get(0))
    require(heavyRows.length <= maxHeavy,
      s"more than $maxHeavy keys above $heavyThreshold rows — raise the threshold")
    if (heavyRows.isEmpty) return facts.join(dims, key)
    val isHeavy = col(key).isin(heavyRows.toSeq: _*)
    val saltedFacts = facts.withColumn("__salt",
      when(isHeavy, pmod(xxhash64(col(key), saltSource), lit(salt)))
        .otherwise(lit(0L)))
    val saltedDims = dims.withColumn("__salt",
      explode(when(isHeavy, sequence(lit(0L), lit(salt.toLong - 1)))
        .otherwise(array(lit(0L)))))
    saltedFacts.join(saltedDims, Seq(key, "__salt")).drop("__salt")
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

  /** EXACT equi-join output size and per-key contribution profile WITHOUT
    * materializing the join — the planning input [[saltedEquiJoin]] and
    * AQE skew handling want before a 100 TB join runs: both sides collapse
    * to per-key counts first (two map-side-combined aggregations, shuffle
    * ≤ distinct keys per side), the counts meet in an inner equi-join of
    * the AGGREGATED frames (distinct-key-sized, never raw rows), and each
    * matching key's output contribution is the count PRODUCT — so a
    * quadratic-blowup key is visible as arithmetic, not as an OOM task.
    * Inner-join NULL semantics: any-null keys match nothing and are
    * excluded on both sides.
    *
    * Keys group and match on their NATIVE types — the count-table join's
    * equality coerces cross-typed pairs exactly as the real
    * `left.join(right, keys)` would (an INT 1 matches a DECIMAL 1.00
    * here because it matches there), so the profile prices the join that
    * will actually run; the output `key` column is the left side's
    * string cast, display only.
    *
    * Per-key products and their sum accumulate in Decimal(38,0) — a
    * Long×Long product overflows (ANSI: aborts) on exactly the ~3·10⁹×
    * ~3·10⁹ hot key the profile exists to expose, the q148
    * exact-integer convention — and `out_rows`/`total_out_rows` ship as
    * the IEEE double nearest those exact integers; `share` is the raw
    * double quotient of the two exact values (bit-identical across
    * engines).
    *
    * Output: top-`k` keys by contribution (key, left_rows, right_rows,
    * out_rows, share, n_matching_keys, total_out_rows), heaviest first,
    * key string as the tie-break; the two total columns repeat on every
    * row so the report is self-contained. Empty intersection → empty
    * frame (schema intact).
    */
  def joinCardinality(left: org.apache.spark.sql.DataFrame,
                      right: org.apache.spark.sql.DataFrame,
                      leftKeys: Seq[String], rightKeys: Seq[String],
                      k: Int = 20): org.apache.spark.sql.DataFrame = {
    require(k > 0, s"need k > 0, got $k")
    require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size,
      s"need matching non-empty key lists, got $leftKeys vs $rightKeys")
    leftKeys.foreach(c => require(left.columns.contains(c),
      s"column '$c' not in left frame"))
    rightKeys.foreach(c => require(right.columns.contains(c),
      s"column '$c' not in right frame"))
    def sideCounts(df: org.apache.spark.sql.DataFrame, keys: Seq[String],
                   pfx: String, cnt: String) =
      df.where(keys.map(col(_).isNotNull).reduce(_ && _))
        .select(keys.zipWithIndex.map { case (c, i) =>
          col(c).as(s"$pfx$i") }: _*)
        .groupBy(keys.indices.map(i => col(s"$pfx$i")): _*)
        .agg(count(lit(1)).as(cnt))
    val la = sideCounts(left, leftKeys, "__l", "left_rows")
    val rb = sideCounts(right, rightKeys, "__r", "right_rows")
    // native-type equality — the same coercion the real equi-join applies
    val cond = leftKeys.indices
      .map(i => la(s"__l$i") === rb(s"__r$i")).reduce(_ && _)
    val joined = la.join(rb, cond, "inner")
      .select(
        concat_ws(",", leftKeys.indices.map(i =>
          col(s"__l$i").cast("string")): _*).as("key"),
        col("left_rows"), col("right_rows"),
        (col("left_rows").cast("decimal(19,0)") *
          col("right_rows").cast("decimal(19,0)"))
          .cast("decimal(38,0)").as("__out"))
      .localCheckpoint()
    val tot = joined.agg(
      count(lit(1)).as("__m"), sum(col("__out")).as("__t")).head()
    // a null sum means EITHER empty intersection (count 0) OR Decimal(38,0)
    // overflow in non-ANSI mode (total > 1e38). Conflating them would emit
    // n_matching_keys=0 / share=Infinity on exactly the extreme-scale joins
    // this profile exists to price — distinguish by the count and fail loudly
    // on the overflow arm rather than report silent zeros.
    if (tot.getLong(0) > 0L && tot.isNullAt(1))
      throw new ArithmeticException(
        s"joinCardinality: total output rows overflow Decimal(38,0) across " +
          s"${tot.getLong(0)} matching keys — this join is catastrophically " +
          "quadratic; inspect the per-key report with a smaller sample")
    val (m, total) =
      if (tot.isNullAt(1)) (0L, java.math.BigDecimal.ZERO)
      else (tot.getLong(0), tot.getDecimal(1))
    joined
      .orderBy(col("__out").desc, col("key").asc)
      .limit(k)
      .select(col("key"), col("left_rows"), col("right_rows"),
        col("__out").cast("double").as("out_rows"),
        (col("__out").cast("double") / lit(total.doubleValue)).as("share"),
        lit(m).as("n_matching_keys"),
        lit(total.doubleValue).as("total_out_rows"))
  }
}
