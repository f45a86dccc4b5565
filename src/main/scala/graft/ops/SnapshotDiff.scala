package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dataset-version diffing: given two snapshots of the same keyed table,
  * classify every key as added / removed / changed / unchanged and name
  * the columns that changed — the audit step between two releases of a
  * training corpus (what did the new crawl add, which documents were
  * rewritten, what silently disappeared).
  *
  * The reference (alteryx/woodwork) has no multi-table operators; this is
  * beyond-reference governance surface (SURVEY.md §2.12), the batch
  * sibling of the schema-drift check (`WwTableSchema.drift`).
  *
  * Scale shape: ONE full-outer shuffle join on the key (both sides hash-
  * partition once; AQE handles size imbalance), every per-column compare
  * is a codegen'd null-safe equality on the joined row, and the output
  * carries key + verdict only — never both snapshots' payloads. Nothing
  * is collected; a 100 TB snapshot pair diffs at the cost of one
  * co-partitioned join.
  *
  * Keys are expected non-null (the index contract): a null-key row never
  * equi-matches, so it surfaces as one `removed` plus one `added` — the
  * honest reading of an unkeyed row. Keys are likewise expected UNIQUE
  * per snapshot — a key with m old and n new rows joins to m×n verdict
  * rows (standard join semantics); run the key through
  * [[graft.stats.KeyDiscovery.candidateKeys]] first when uniqueness is
  * in doubt.
  */
object SnapshotDiff {

  /** Diff `newDf` against `oldDf` on `keyCols`, comparing `compareCols`
    * (default: every shared non-key column). Output: key columns, then
    * `status` ∈ {added, removed, changed, unchanged}, `changed_cols`
    * (comma-joined, in `compareCols` order; empty unless changed) and
    * `n_changed`.
    *
    * `keysOnly = true` opts into pure MEMBERSHIP diffing (which keys
    * were added/removed; every matched key reports `unchanged`) —
    * without the flag, an empty compare set is refused loudly because
    * it usually means the snapshots' column names don't line up.
    */
  def diff(oldDf: DataFrame, newDf: DataFrame, keyCols: Seq[String],
           compareCols: Seq[String] = Nil,
           keysOnly: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(!(keysOnly && compareCols.nonEmpty),
      "keysOnly contradicts an explicit compareCols — pass one or the other")
    // scratch-name guard (refuse rather than clobber, the c4Gate
    // convention): the presence marker __o/__n and the payload aliases
    // __o_<c>/__n_<c> would silently corrupt the classification if an
    // input column already used the prefix
    val clash = (oldDf.columns ++ newDf.columns)
      .filter(c => c.startsWith("__o") || c.startsWith("__n")).distinct
    require(clash.isEmpty,
      s"SnapshotDiff.diff reserves column prefixes __o/__n; rename input " +
        s"column(s) ${clash.mkString(", ")} first")
    val cmp =
      if (keysOnly) Nil
      else if (compareCols.nonEmpty) compareCols
      else oldDf.columns.toSeq.intersect(newDf.columns.toSeq)
        .filterNot(keyCols.contains)
    // an ACCIDENTALLY empty compare set is almost always a caller
    // mistake — e.g. column names that differ between snapshots —
    // because every matched key then reports `unchanged` unconditionally;
    // keysOnly is the explicit opt-in for that semantics
    require(cmp.nonEmpty || keysOnly,
      "no columns to compare: the snapshots share no non-key columns, so " +
        "every matched key would report 'unchanged' — check the snapshots' " +
        "column names, pass compareCols explicitly, or opt in with " +
        "keysOnly = true for membership diffing")
    val o = oldDf.select(keyCols.map(col) ++
      Seq(lit(true).as("__o")) ++ cmp.map(c => col(c).as(s"__o_$c")): _*)
    val n = newDf.select(keyCols.map(col) ++
      Seq(lit(true).as("__n")) ++ cmp.map(c => col(c).as(s"__n_$c")): _*)
    // using-column full outer coalesces the keys in the output
    val j = o.join(n, keyCols, "full_outer")
    val diffs = cmp.map(c => !(col(s"__o_$c") <=> col(s"__n_$c")))
    // zero-arg array() is ARRAY<NULL> and breaks array_join's analysis —
    // the keysOnly (empty cmp) case short-circuits to a typed empty
    val changedNames =
      if (cmp.isEmpty) array().cast(ArrayType(StringType))
      else array(cmp.zip(diffs).map { case (c, d) =>
        when(d, lit(c)).otherwise(lit(null).cast(StringType))
      }: _*)
    val nChanged = diffs.map(d => when(d, 1).otherwise(0).cast(IntegerType))
      .reduceOption(_ + _).getOrElse(lit(0))
    val both = col("__o").isNotNull && col("__n").isNotNull
    j.select(keyCols.map(col) ++ Seq(
      when(col("__o").isNull, "added")
        .when(col("__n").isNull, "removed")
        .when(nChanged > 0, "changed")
        .otherwise("unchanged").as("status"),
      when(both, array_join(filter(changedNames, x => x.isNotNull), ","))
        .otherwise(lit("")).as("changed_cols"),
      when(both, nChanged).otherwise(lit(0)).as("n_changed")): _*)
  }

  /** One-row summary of a diff: counts per status plus total changed-cell
    * count — the release-note headline. One aggregation over the diff;
    * count()/coalesce so an EMPTY diff (two empty snapshots) reports
    * zeros, not a row of nulls.
    */
  def summary(diffed: DataFrame): DataFrame =
    diffed.agg(
      count(when(col("status") === "added", 1)).as("added"),
      count(when(col("status") === "removed", 1)).as("removed"),
      count(when(col("status") === "changed", 1)).as("changed"),
      count(when(col("status") === "unchanged", 1)).as("unchanged"),
      coalesce(sum(col("n_changed").cast(LongType)), lit(0L))
        .as("changed_cells"))
}
