package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Heavy-key ROUTING POLICY for the skew-split event operators
  * ([[EventAnalytics.topEventPaths]] / [[EventAnalytics.nextEventDistribution]]
  * / [[EventAnalytics.eventTransitionMatrix]] / [[Sessionize.withSessions]]):
  * which keys take the segmented (key, time-segment) machinery instead of
  * the codegen'd whole-key window.
  *
  * Routing is a PERFORMANCE decision, never a correctness one — both paths
  * compute identical results (spec-pinned parity), so any set of keys may
  * be routed heavy: a stale or imprecise set only shifts work between the
  * two shapes. That is what makes a PRECOMPUTED policy sound: one
  * [[HeavySplit.detect]] scan can feed any number of operator calls over
  * the same frame, even after appends.
  *
  *   - [[HeavySplit.Detect]] (the default) — each call runs one EAGER
  *     map-side-combined per-key count at call time (bounded output:
  *     ≤ rows/threshold keys, capped by [[EventAnalytics.MaxHeavyActors]]),
  *     the [[SkewJoin.joinCardinality]] contract. The same job also reads
  *     each heavy key's event-time SPAN, which bounds the segmented path's
  *     merge state (see the clamp below) and derives the AUTO segment
  *     width without a second scan.
  *   - [[HeavySplit.AssumeLight]] — skip the pre-scan entirely; the caller
  *     asserts no key exceeds the threshold (the common no-bot case). The
  *     operator stays fully LAZY. A key that does exceed it still computes
  *     correctly — it just pays the whole-key single-task sort the split
  *     exists to avoid.
  *   - [[HeavySplit.Known]] — a precomputed routing (usually
  *     [[HeavySplit.detect]]'s result), letting several operator calls
  *     over the same frame share one pre-scan (the r14 ADVICE: previously
  *     every successor-family call re-scanned the input).
  */
sealed trait HeavySplit

object HeavySplit {

  /** Eager bounded per-key pre-count at call time (the default). */
  case object Detect extends HeavySplit

  /** Skip the pre-scan; route every key to the light path. Correct at any
    * skew (the light window is exact) — only the single-task-sort
    * protection is waived, so use when the caller KNOWS keys are bounded.
    */
  case object AssumeLight extends HeavySplit

  /** Precomputed routing: `keys` go to the segmented path (`allHeavy`
    * routes EVERY key there, the >[[EventAnalytics.MaxHeavyActors]]
    * regime). `maxSpanMicros`, when present, is an upper bound on any
    * heavy key's event-time span and lets the operator clamp an
    * explicitly-narrow segment width to a bounded per-key segment count;
    * WITHOUT it an explicit `segmentSeconds` is trusted as given, and the
    * segmented path's per-key merge state is span/width structs — pick a
    * width commensurate with the data's time range (the
    * [[EventAnalytics.AutoSegments]] rationale).
    *
    * `fromDetect` marks a routing produced by [[detect]]'s own scan (set
    * only there): a caller-BUILT span is still honored for the width
    * clamp (an understated span merely widens segments — a perf shift),
    * but never for the broadcast decision — an understated span could
    * otherwise "prove" a huge per-segment state side small enough to
    * force-broadcast, turning a contract breach into a driver-memory
    * failure (r15 ADVICE). Caller-built routings leave the rejoin shape
    * to the planner/AQE, whose runtime sizes cannot be lied to.
    */
  final case class Known(keys: Seq[Any], allHeavy: Boolean = false,
                         maxSpanMicros: Option[Long] = None,
                         fromDetect: Boolean = false)
      extends HeavySplit

  /** The shared pre-scan: per-key counts with each heavy key's event-time
    * span, one map-side-combined aggregation (shuffle ≤ distinct keys,
    * collected output ≤ `maxHeavy`+1 rows). NULL keys participate — a
    * null-keyed bot flood is as real a hot key as any (callers that
    * ignore null keys simply never route rows to it); null timestamps
    * contribute no span. Returns a [[Known]] reusable across any number
    * of operator calls on the same frame.
    */
  def detect(df: DataFrame, keyCol: String, tsCol: String, threshold: Long,
             maxHeavy: Int = EventAnalytics.MaxHeavyActors): Known = {
    require(df.columns.contains(keyCol), s"column '$keyCol' not in frame")
    require(df.columns.contains(tsCol), s"column '$tsCol' not in frame")
    detectOn(df, col(keyCol),
      unix_micros(col(tsCol).cast(TimestampType)), threshold, maxHeavy)
  }

  /** [[detect]] over pre-built key/micros expressions — the internal form
    * the operators call on their already-projected base frames (where the
    * timestamp is already epoch micros; re-casting a Long would silently
    * reinterpret it as SECONDS).
    */
  private[ops] def detectOn(df: DataFrame, key: Column, micros: Column,
                            threshold: Long,
                            maxHeavy: Int = EventAnalytics.MaxHeavyActors)
      : Known = {
    require(threshold > 0, s"need threshold > 0, got $threshold")
    val rows = df
      .groupBy(key.as("__k"))
      .agg(count(lit(1)).as("__n"),
        min(micros).as("__mn"), max(micros).as("__mx"))
      .where(col("__n") > threshold)
      .limit(maxHeavy + 1)
      .collect()
    val allHeavy = rows.length > maxHeavy
    // allHeavy: the LIMIT-capped sample can neither enumerate the heavy
    // keys nor bound their spans — a span read off the sample would let
    // the clamp silently under-protect keys outside it, so the routing
    // carries NO span (operators fall back to a full span read for AUTO
    // widths and trust explicit widths as documented)
    if (allHeavy) Known(Nil, allHeavy = true, None, fromDetect = true)
    else {
      val span = rows.foldLeft(Option.empty[Long]) { (acc, r) =>
        if (r.isNullAt(2) || r.isNullAt(3)) acc
        else {
          val s = r.getLong(3) - r.getLong(2) + 1 // micros bounded
          Some(acc.fold(s)(math.max(_, s)))
        }
      }
      Known(rows.map(_.get(0)).toSeq, allHeavy = false, span,
        fromDetect = true)
    }
  }

  /** Resolve a policy to concrete routing (runs the [[Detect]] scan when
    * asked). `Known`'s keys pass through verbatim — see the object doc
    * for why a stale set stays correct.
    */
  private[ops] def resolve(policy: HeavySplit, df: DataFrame, key: Column,
                           micros: Column, threshold: Long): Known =
    policy match {
      case Detect => detectOn(df, key, micros, threshold)
      case AssumeLight => Known(Nil)
      case k: Known => k
    }

  /** Whether any key routes heavy under this routing. */
  private[ops] def hasHeavy(r: Known): Boolean =
    r.allHeavy || r.keys.nonEmpty

  /** The null-safe heavy-route predicate. `isInCollection` alone would
    * evaluate to NULL for a null key (dropping the row from BOTH paths —
    * a silent row loss for operators that keep null keys, e.g.
    * [[Sessionize.withSessions]]); a null key routes heavy iff the
    * detected set contains null.
    */
  private[ops] def isHeavy(key: Column, r: Known): Column =
    if (r.allHeavy) lit(true)
    else if (r.keys.isEmpty) lit(false)
    else {
      val nonNull = r.keys.filterNot(_ == null)
      val in =
        if (nonNull.isEmpty) lit(false)
        else coalesce(key.isInCollection(nonNull), lit(false))
      if (r.keys.exists(_ == null)) key.isNull || in else in
    }

  /** Provable upper bound on the segment-state frame's row count (one
    * row per (heavy key, occupied segment)), when the routing makes it
    * computable: heavy keys are enumerated and the max span is known.
    * Lets the row-scale operators BROADCAST the per-segment state side
    * of their rejoin (killing the sort-merge path's shuffle + sort of
    * the heavy rows) whenever the bound is provably small; `None` when
    * no bound can be proven — allHeavy, span unknown, or a CALLER-BUILT
    * routing (only a span [[detect]] itself measured counts as proof;
    * see [[Known.fromDetect]]).
    */
  private[ops] def segmentStateBound(r: Known, segMicros: Long)
      : Option[Long] =
    (r.allHeavy, r.maxSpanMicros) match {
      case (false, Some(span))
          if r.fromDetect && r.keys.nonEmpty && segMicros > 0 =>
        Some(r.keys.size.toLong * (span / segMicros + 2L))
      case _ => None
    }

  /** Broadcast cutoff for [[segmentStateBound]]: states this small go
    * out as a broadcast hash side. The cutoff counts ROWS, so callers
    * must only apply it when each state row is scalar-ish (Sessionize's
    * (seg, base, cont) Longs; forwardFill gates on fixed-width fill
    * types — a variable-width carry value repeated per segment could
    * make 2M rows arbitrarily large, where AQE's runtime sizes decide
    * correctly). Larger or unbounded-width states fall back to the
    * shuffled join and AQE.
    */
  private[ops] val StateBroadcastRows: Long = 2000000L

  /** Effective segment width for a split operator's heavy path — the
    * shared derivation [[graft.ops.Sessionize]] and
    * [[graft.ops.TimeSeries.forwardFill]] must agree on: an explicit
    * width in exact micros, clamped when the routing carries a span
    * bound; `segmentSeconds = 0` (AUTO) derives the width from the
    * routing's span, or — when the routing has none (a caller-built
    * [[Known]], or an allHeavy detect whose capped sample cannot bound
    * the tail) — from one bounded min/max read over the heavy rows.
    */
  private[ops] def effectiveSegmentMicros(df: DataFrame, heavyPred: Column,
                                          micros: Column,
                                          segmentSeconds: Long,
                                          r: Known): Long =
    clampSegmentMicros(
      if (segmentSeconds > 0) Math.multiplyExact(segmentSeconds, 1000000L)
      else 1L, // AUTO: the clamp raises this to ceil(span/AutoSegments)
      r.maxSpanMicros.orElse {
        if (segmentSeconds > 0) None
        else {
          val b = df.where(heavyPred).agg(min(micros), max(micros)).head()
          if (b.isNullAt(0)) Some(1L)
          else Some(b.getLong(1) - b.getLong(0) + 1)
        }
      })

  /** Broadcast the bounded per-segment state side of a heavy-path
    * rejoin when the routing proves it small ([[segmentStateBound]] ≤
    * [[StateBroadcastRows]]); otherwise leave the join shape to the
    * planner/AQE. Shared by the split operators so the cutoff decision
    * lives in one place.
    */
  private[ops] def maybeBroadcastState(state: DataFrame, r: Known,
                                       segMicros: Long): DataFrame =
    segmentStateBound(r, segMicros) match {
      case Some(b) if b <= StateBroadcastRows => broadcast(state)
      case _ => state
    }

  /** Fresh internal column names for a split operator's intermediate
    * frames — the operators carry EVERY input column (so the full
    * re-projection convention cannot apply) and instead generate names
    * provably absent from the avoid set. One definition shared by the
    * split operators (previously three hand-rolled copies).
    */
  private[ops] def freshNames(avoid: Iterable[String])(bases: String*)
      : Seq[String] = {
    // CASE-INSENSITIVE avoidance: Spark resolves columns
    // case-insensitively by default, so a user column named "__Seg"
    // would collide with a generated "__seg" even though the strings
    // differ
    val taken = scala.collection.mutable.Set(
      avoid.map(_.toLowerCase).toSeq: _*)
    bases.map { b =>
      val n = Iterator.iterate(b)(_ + "_")
        .dropWhile(c => taken(c.toLowerCase)).next()
      taken += n.toLowerCase; n
    }
  }

  /** Segment-width clamp bounding the segmented path's per-key merge
    * state: with a known max heavy-key span, the effective width is
    * raised so no key occupies more than [[EventAnalytics.AutoSegments]]
    * segments — a caller-chosen tiny width (1 s segments on a key
    * spanning years) would otherwise re-create the unbounded single-row
    * state the split exists to avoid (r14 ADVICE). Width never shrinks
    * (results are width-invariant, spec-pinned; only state shape
    * changes). Span unknown (caller-built [[Known]], or an allHeavy
    * detect — a capped sample cannot bound the tail's span) → the
    * requested width is trusted as given.
    */
  private[graft] def clampSegmentMicros(segMicros: Long,
                                      maxSpanMicros: Option[Long]): Long =
    maxSpanMicros match {
      case Some(span) if span > 0 =>
        val minWidth =
          (span + EventAnalytics.AutoSegments - 1) / EventAnalytics.AutoSegments
        math.max(segMicros, minWidth)
      case _ => segMicros
    }
}
