package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Edit-distance record linkage (fuzzy join): all pairs whose string keys
  * are within Levenshtein distance `maxDist`, EXACT — the entity-resolution
  * step that joins free-typed names/titles/addresses across (or within)
  * tables where equality joins find nothing.
  *
  * The reference (alteryx/woodwork) has no join operators; this is part of
  * the beyond-reference training-data surface (SURVEY.md §2.12) — e.g.
  * source-metadata reconciliation before dedup.
  *
  * A naive implementation is a cartesian product with a levenshtein filter
  * — quadratic and un-runnable at corpus scale. The scale path is
  * segment-based blocking (the PassJoin family, Li et al., VLDB 2012),
  * re-expressed as ONE Spark equi-join:
  *
  *   1. index side: each string `t` (length L) splits into `maxDist + 1`
  *      contiguous segments (lengths differing by ≤ 1). Pigeonhole: at
  *      most `maxDist` edit operations touch at most `maxDist` segments,
  *      so any `s` within distance d keeps ≥ 1 segment of `t` INTACT —
  *      and an optimal alignment shifts that segment's position by at
  *      most d (the insertions/deletions before it).
  *   2. probe side: each string `s` (length m) emits, for every candidate
  *      target length Lp ∈ [m−d, m+d] and every segment slot i of the
  *      Lp-scheme, its substrings of that segment's length at positions
  *      within ±d of the segment start — O((2d+1)²·(d+1)) entries per
  *      row, a CONSTANT fan-out computed as pure codegen'd column HOFs
  *      (no shuffle to build either side).
  *   3. candidates: equi-join on the compound key (target length, segment
  *      slot, segment text) — position- and length-discriminating, so a
  *      shared token only collides within one slot of one length scheme.
  *      The join runs through [[SkewJoin.gridJoin]]: a corpus-wide
  *      constant prefix (every `Supplier#…` sharing segment 0) makes one
  *      key hot, and the grid split bounds every task at ~chunkSize²
  *      comparisons while preserving the exact candidate set.
  *   4. verify-before-distinct (the repo convention): the banded
  *      `levenshtein(x, y, maxDist)` — O(d·min(m,L)) per candidate, and
  *      early-exiting at the threshold — filters candidates IN the join
  *      output before the distinct, so the dedup exchange carries only
  *      true matches (id, id, dist), never the candidate volume.
  *
  * Zero-length segments (strings shorter than d+1) need no special case:
  * an empty segment matches the empty probe substring every string emits
  * for that slot, so the pigeonhole recall argument covers them too.
  *
  * For `maxDist = 1` — the dominant entity-resolution setting — the
  * public methods dispatch to a FastSS deletion-neighborhood plan
  * (Bocek et al. 2007) instead: segment blocking is quadratic in any set
  * of strings sharing a constant prefix (ids like `Supplier#000000042`
  * all collide in one segment bucket), while a 1-deletion variant bucket
  * holds only strings agreeing at every other position, so candidate
  * volume tracks true-neighbor volume on exactly those corpora. Exact
  * duplicates are collapsed before variant generation, so duplicate-heavy
  * corpora cannot inflate the buckets either.
  *
  * Both plans have EXACT recall (superset candidates + exact
  * verification), which is what lets the DuckDB oracle be the
  * brute-force quadratic join.
  *
  * Rows with a null string are ignored (no edit distance to nothing);
  * ids are expected non-null and unique (the index contract) — the self
  * join orders pairs by id, so a null id would silently drop its pairs.
  */
object RecordLinkage {

  /** Segment i of the k-way scheme for a length-L string spans
    * `[floor(iL/k), floor((i+1)L/k))` — 0-based start and length, as
    * IntegerType columns (the multiply runs in LongType so a huge L
    * cannot wrap).
    */
  private def segBounds(i: Column, len: Column, k: Int): (Column, Column) = {
    def start(ix: Column): Column =
      floor(ix.cast(LongType) * len.cast(LongType) / lit(k))
        .cast(IntegerType)
    val s = start(i)
    (s, start(i + 1) - s)
  }

  /** Index-side relation: one row per (string, segment slot) with the
    * compound blocking key. Columns: __len, __i, __seg, y_id, y_s.
    */
  private def segments(df: DataFrame, idCol: String, strCol: String,
                       maxDist: Int): DataFrame = {
    val k = maxDist + 1
    val (st, ln) = segBounds(col("e"), col("__len"), k)
    df.where(col(strCol).isNotNull)
      .select(col(idCol).as("y_id"), col(strCol).as("y_s"),
        length(col(strCol)).as("__len"),
        explode(sequence(lit(0), lit(k - 1))).as("e"))
      .select(col("__len"), col("e").as("__i"),
        col("y_s").substr(st + 1, ln).as("__seg"),
        col("y_id"), col("y_s"))
  }

  /** Probe-side relation: one row per (string, candidate target length,
    * segment slot, shifted position). Columns: __len, __i, __seg, x_id,
    * x_s. The triple-nested HOF builds the whole fan-out per row before
    * one explode — no intermediate explodes, no shuffle.
    */
  private def probes(df: DataFrame, idCol: String, strCol: String,
                     maxDist: Int): DataFrame = {
    val k = maxDist + 1
    val m = length(col(strCol))
    val entries = flatten(transform(
      sequence(greatest(m - maxDist, lit(0)), m + maxDist),
      lp => flatten(transform(sequence(lit(0), lit(k - 1)), i => {
        val (st, ln) = segBounds(i, lp, k)
        val lo = greatest(st - maxDist, lit(0))
        val hi = least(st + maxDist, m - ln)
        val positions = when(hi >= lo, sequence(lo, hi))
          .otherwise(array().cast(ArrayType(IntegerType)))
        transform(positions, j => struct(
          lp.cast(IntegerType).as("l"), i.cast(IntegerType).as("i"),
          col(strCol).substr(j + 1, ln).as("g")))
      }))))
    df.where(col(strCol).isNotNull)
      .select(col(idCol).as("x_id"), col(strCol).as("x_s"),
        explode(entries).as("e"))
      .select(col("e.l").as("__len"), col("e.i").as("__i"),
        col("e.g").as("__seg"), col("x_id"), col("x_s"))
  }

  /** Cross-table fuzzy join: (id_1 from left, id_2 from right, dist) for
    * every pair with `levenshtein ≤ maxDist`, each pair exactly once.
    */
  def fuzzyJoinPairs(left: DataFrame, leftId: String, leftStr: String,
                     right: DataFrame, rightId: String, rightStr: String,
                     maxDist: Int, chunkSize: Int = 4096): DataFrame = {
    require(maxDist >= 0, s"need maxDist >= 0, got $maxDist")
    if (maxDist == 1)
      deletionCross(left, leftId, leftStr, right, rightId, rightStr, chunkSize)
    else
      passJoinCross(left, leftId, leftStr, right, rightId, rightStr,
        maxDist, chunkSize)
  }

  /** Self fuzzy join: unordered pairs (id_1 < id_2) within distance
    * `maxDist` in one table — near-duplicate detection on an entity key.
    */
  def fuzzySelfPairs(df: DataFrame, idCol: String, strCol: String,
                     maxDist: Int, chunkSize: Int = 4096): DataFrame = {
    require(maxDist >= 0, s"need maxDist >= 0, got $maxDist")
    if (maxDist == 1) deletionSelf(df, idCol, strCol, chunkSize)
    else passJoinSelf(df, idCol, strCol, maxDist, chunkSize)
  }

  private[graft] def passJoinCross(left: DataFrame, leftId: String,
                                   leftStr: String, right: DataFrame,
                                   rightId: String, rightStr: String,
                                   maxDist: Int, chunkSize: Int): DataFrame = {
    val cand = SkewJoin.gridJoin(
      probes(left, leftId, leftStr, maxDist),
      segments(right, rightId, rightStr, maxDist),
      Seq("__len", "__i", "__seg"), "x_id", "y_id", chunkSize)
    // banded levenshtein returns -1 past the threshold; verify BEFORE the
    // distinct so the exchange carries matches only
    val d = levenshtein(col("x_s"), col("y_s"), maxDist)
    cand.select(col("x_id").as("id_1"), col("y_id").as("id_2"), d.as("dist"))
      .where(col("dist") >= 0)
      .distinct()
  }

  private[graft] def passJoinSelf(df: DataFrame, idCol: String,
                                  strCol: String, maxDist: Int,
                                  chunkSize: Int): DataFrame = {
    val cand = SkewJoin.gridJoin(
      probes(df, idCol, strCol, maxDist),
      segments(df, idCol, strCol, maxDist),
      Seq("__len", "__i", "__seg"), "x_id", "y_id", chunkSize)
      .where(col("x_id") < col("y_id"))
    val d = levenshtein(col("x_s"), col("y_s"), maxDist)
    cand.select(col("x_id").as("id_1"), col("y_id").as("id_2"), d.as("dist"))
      .where(col("dist") >= 0)
      .distinct()
  }

  /** Multi-field self linkage: unordered pairs (id_1 < id_2) where EVERY
    * field is within its own edit-distance bound — the standard
    * entity-resolution conjunction (name d≤1 AND address d≤2) over one
    * typed table. `fields` is (column, maxDist)*; output carries one
    * `dist_<column>` per field.
    *
    * Plan shape: the FIRST field blocks — its [[fuzzySelfPairs]] plan
    * (FastSS / PassJoin) generates the candidate pairs — and every
    * remaining field verifies on the pair table via two id equi-joins to
    * fetch the field values plus a banded levenshtein filter. FIELD
    * ORDER MATTERS: the first field IS the blocking plan, so order
    * fields most-selective-first — the block field's match volume is the
    * only pair table that ever exists, later fields only shrink it.
    * Cost note: pair-table size ≈ Σ per-bucket C(bucket, 2) of the FIRST
    * field's neighborhood buckets, so putting the loosest predicate
    * first (a low-cardinality field like a market segment, or a large
    * maxDist) inflates the candidate table by orders of magnitude before
    * any verify stage can cut it — every verify join and levenshtein
    * then pays that volume. All joins
    * stay equi-joins (no cartesian anywhere), and the payload joins run
    * AFTER the distinct, so they carry true field-1 matches only.
    *
    * Null handling follows the single-field contract conjunctively: a
    * null in ANY field disqualifies the pair (levenshtein against null is
    * null, which fails the banded filter).
    */
  def multiFieldSelfPairs(df: DataFrame, idCol: String,
                          fields: Seq[(String, Int)],
                          chunkSize: Int = 4096): DataFrame = {
    require(fields.nonEmpty, "need at least one field")
    require(fields.map(_._1).distinct.size == fields.size,
      "duplicate field column")
    val (bCol, bDist) = fields.head
    val base = fuzzySelfPairs(df, idCol, bCol, bDist, chunkSize)
      .withColumnRenamed("dist", s"dist_$bCol")
    fields.tail.foldLeft(base) { case (pairs, (c, d)) =>
      verifyField(pairs,
        df.select(col(idCol).as("id_1"), col(c).as("__f1")),
        df.select(col(idCol).as("id_2"), col(c).as("__f2")), c, d)
    }
  }

  /** Multi-field cross-table linkage — see [[multiFieldSelfPairs]].
    * `fields` is (leftColumn, rightColumn, maxDist)*; the first field
    * blocks via [[fuzzyJoinPairs]], the rest verify on the pair table;
    * output distances are named `dist_<leftColumn>`.
    */
  def multiFieldJoinPairs(left: DataFrame, leftId: String,
                          right: DataFrame, rightId: String,
                          fields: Seq[(String, String, Int)],
                          chunkSize: Int = 4096): DataFrame = {
    require(fields.nonEmpty, "need at least one field")
    require(fields.map(_._1).distinct.size == fields.size,
      "duplicate left field column")
    val (bl, br, bDist) = fields.head
    val base = fuzzyJoinPairs(left, leftId, bl, right, rightId, br,
        bDist, chunkSize)
      .withColumnRenamed("dist", s"dist_$bl")
    fields.tail.foldLeft(base) { case (pairs, (lc, rc, d)) =>
      verifyField(pairs,
        left.select(col(leftId).as("id_1"), col(lc).as("__f1")),
        right.select(col(rightId).as("id_2"), col(rc).as("__f2")), lc, d)
    }
  }

  /** One verify stage: join the pair table to each side's field payload
    * on its id and keep pairs whose banded distance clears the bound.
    */
  private def verifyField(pairs: DataFrame, l: DataFrame, r: DataFrame,
                          name: String, maxDist: Int): DataFrame =
    pairs.join(l, "id_1").join(r, "id_2")
      .withColumn(s"dist_$name", levenshtein(col("__f1"), col("__f2"), maxDist))
      .where(col(s"dist_$name") >= 0)
      .drop("__f1", "__f2")

  /** The string itself plus every single-character deletion — FastSS's
    * 1-deletion neighborhood (Bocek et al. 2007). edit(s, t) ≤ 1 ⇔ the
    * neighborhoods intersect: equality shares s itself, a substitution
    * shares the both-sides deletion of the differing position, and an
    * insertion/deletion shares the shorter string.
    */
  private def delVariants(s: Column): Column = {
    val positions = when(length(s) > 0, sequence(lit(0), length(s) - 1))
      .otherwise(array().cast(ArrayType(IntegerType)))
    concat(array(s), transform(positions, p =>
      concat(s.substr(lit(1), p), s.substr(p + 2, length(s)))))
  }

  /** d = 1 self join via deletion neighborhoods. Where segment blocking
    * degenerates on corpora whose strings share a long constant prefix
    * (every `Supplier#…` colliding in one segment bucket — candidate
    * volume quadratic in the prefix-sharing set), a deletion-variant
    * bucket holds only strings agreeing at every OTHER position, so
    * candidate volume tracks the true-neighbor volume. Exact duplicates
    * are collapsed first: dist-0 pairs come from a grid-guarded self join
    * on the raw value, and the variant machinery runs over DISTINCT
    * values only — an exact-dup-heavy corpus cannot inflate the variant
    * buckets. Value-level matches expand back to id pairs through two
    * output-bound joins.
    */
  private[graft] def deletionSelf(df: DataFrame, idCol: String,
                                  strCol: String, chunkSize: Int): DataFrame = {
    val vals = df.where(col(strCol).isNotNull)
      .select(col(idCol).as("id"), col(strCol).as("s"))
    val zero = SkewJoin.selfPairs(vals, Seq("s"), "id",
        chunkSize = chunkSize)
      .select(col("x_id").as("id_1"), col("y_id").as("id_2"),
        lit(0).as("dist"))
    // bucket key = xxhash64 of the variant, not the variant string (r17,
    // guide §2.3 shuffle keys not payloads): the self-join's exchanges and
    // sorts carry 8 bytes instead of the ~string-length key. A cross-value
    // hash collision only ADDS a candidate pair, and every candidate is
    // verified by the exact banded levenshtein before the distinct — the
    // output is bit-identical (probe: 262500 = 262500 pairs, ~15% faster)
    val variants = vals.select(col("s")).distinct()
      .select(col("s"),
        explode(delVariants(col("s"))).as("__var"))
      .select(col("s"), xxhash64(col("__var")).as("__var"))
    val vpairs = SkewJoin.selfPairs(variants, Seq("__var"), "s",
        chunkSize = chunkSize)
      .withColumn("dist", levenshtein(col("x_s"), col("y_s"), 1))
      .where(col("dist") >= 0)
      .select(col("x_s").as("v1"), col("y_s").as("v2"), col("dist"))
      .distinct()
    val one = vpairs
      .join(vals.select(col("s").as("v1"), col("id").as("ia")), "v1")
      .join(vals.select(col("s").as("v2"), col("id").as("ib")), "v2")
      .select(least(col("ia"), col("ib")).as("id_1"),
        greatest(col("ia"), col("ib")).as("id_2"), col("dist"))
    zero.unionByName(one)
  }

  /** d = 1 cross-table join via deletion neighborhoods — see
    * [[deletionSelf]]; dist-0 pairs are a grid-guarded value equi-join,
    * dist-1 pairs come from variant buckets over each side's distinct
    * values.
    */
  private[graft] def deletionCross(left: DataFrame, leftId: String,
                                   leftStr: String, right: DataFrame,
                                   rightId: String, rightStr: String,
                                   chunkSize: Int): DataFrame = {
    val lv = left.where(col(leftStr).isNotNull)
      .select(col(leftId).as("ia"), col(leftStr).as("__k"))
    val rv = right.where(col(rightStr).isNotNull)
      .select(col(rightId).as("ib"), col(rightStr).as("__k"))
    val zero = SkewJoin.gridJoin(lv, rv, Seq("__k"), "ia", "ib", chunkSize)
      .select(col("ia").as("id_1"), col("ib").as("id_2"), lit(0).as("dist"))
    // hashed bucket key — see deletionSelf (collisions only add verified
    // candidates; output identical)
    def variantTable(v: DataFrame, out: String): DataFrame =
      v.select(col("__k").as(out)).distinct()
        .select(col(out), explode(delVariants(col(out))).as("__var"))
        .select(col(out), xxhash64(col("__var")).as("__var"))
    val vpairs = SkewJoin.gridJoin(
        variantTable(lv, "v1"), variantTable(rv, "v2"),
        Seq("__var"), "v1", "v2", chunkSize)
      .where(col("v1") =!= col("v2"))
      .withColumn("dist", levenshtein(col("v1"), col("v2"), 1))
      .where(col("dist") >= 0)
      .select(col("v1"), col("v2"), col("dist"))
      .distinct()
    val one = vpairs
      .join(lv.select(col("__k").as("v1"), col("ia")), "v1")
      .join(rv.select(col("__k").as("v2"), col("ib")), "v2")
      .select(col("ia").as("id_1"), col("ib").as("id_2"), col("dist"))
    zero.unionByName(one)
  }
}
