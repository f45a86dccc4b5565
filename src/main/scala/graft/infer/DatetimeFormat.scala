package graft.infer

import java.time.format.{DateTimeFormatter, ResolverStyle}
import java.util.Locale

/** Learned per-column datetime-format inference
  * (reference: woodwork/utils.py:595-650 `_infer_datetime_format`).
  *
  * The reference samples ≤100 non-null rows, guesses a format per row with
  * pandas' `guess_datetime_format` and takes the mode; when that fails it
  * falls back to a fixed list of ambiguous year/month/day permutations
  * (two-digit years, year-in-the-middle) across `/`, `-`, `.` separators and
  * returns the first format that parses every sampled row.
  *
  * Spark-first split: the SHAPE screen (does every non-null value look like
  * `d+[-/.]d+[-/.]d+`?) runs inside the one distributed stats aggregation, so
  * only genuinely date-shaped columns ever reach this driver-side vote over a
  * bounded 100-row sample. The winning format is stored as the column's
  * `Datetime.datetimeFormat` param and drives coercion via
  * `try_to_timestamp(col, format)` — fully distributed, format work never
  * touches more than the sample.
  */
object DatetimeFormat {

  /** Pre-screen regex evaluated distributedly (see TypeInference.statExprs):
    * three numeric fields with consistent -/. or / separators, optional time
    * tail. Cheap RE2-compatible shape, not a validity check.
    */
  val dateShapeRegex: String =
    "^[0-9]{1,4}([-/.])[0-9]{1,2}\\1[0-9]{1,4}([ T][0-9:.+Z-]+)?$"

  private def withTime(f: String): Seq[String] =
    Seq(f, f + " HH:mm:ss", f + " HH:mm:ssxx")

  /** Primary candidates — the common 4-digit-year arrangements pandas'
    * guesser recognizes, voted per-row (mode wins like `fmts.mode().loc[0]`).
    */
  val primaryFormats: Seq[String] =
    Seq("/", "-", ".").flatMap { s =>
      Seq(s"yyyy${s}MM${s}dd", s"MM${s}dd${s}yyyy", s"dd${s}MM${s}yyyy")
        .flatMap(withTime)
    }

  /** Fallback permutations, same list and order as the reference
    * (utils.py:608-640): 8 orderings × 3 separators, date-only first, then
    * `+ %H:%M:%S`, then `+ %H:%M:%S%z`; first format parsing EVERY sample
    * wins.
    */
  val fallbackFormats: Seq[String] = {
    val orderings = Seq(
      ("yy", "MM", "dd"), ("MM", "dd", "yy"), ("dd", "MM", "yy"),
      ("yy", "dd", "MM"), ("dd", "yy", "MM"), ("MM", "yy", "dd"),
      ("dd", "yyyy", "MM"), ("MM", "yyyy", "dd"))
    val dateOnly = Seq("/", "-", ".").flatMap(s =>
      orderings.map { case (a, b, c) => s"$a$s$b$s$c" })
    dateOnly ++ dateOnly.map(_ + " HH:mm:ss") ++ dateOnly.map(_ + " HH:mm:ssxx")
  }

  private val formatterCache =
    scala.collection.concurrent.TrieMap.empty[String, DateTimeFormatter]

  private def formatter(fmt: String): DateTimeFormatter =
    formatterCache.getOrElseUpdate(fmt,
      DateTimeFormatter.ofPattern(fmt, Locale.US)
        .withResolverStyle(ResolverStyle.SMART))

  /** Whole-string parse check; range-valid under SMART resolution (month 31
    * fails, so `31.12.2020` cannot guess as `MM.dd.yyyy`).
    */
  private[infer] def parses(s: String, fmt: String): Boolean =
    try { formatter(fmt).parse(s); true }
    catch { case _: Exception => false }

  /** Guess the column format from a bounded sample of date-shaped strings.
    * Primary: per-row first-matching common format, mode across rows
    * (tie-break: count desc, then candidate order). Fallback: first
    * permutation format that parses every sample.
    */
  def guessFormat(samples: Seq[String]): Option[String] = {
    if (samples.isEmpty) return None
    val votes = samples.flatMap(s => primaryFormats.find(parses(s, _)))
    if (votes.nonEmpty) {
      val counts = votes.groupBy(identity).view.mapValues(_.size)
      Some(counts.toSeq.minBy { case (f, c) => (-c, primaryFormats.indexOf(f)) }._1)
    } else fallbackFormats.find(f => samples.forall(parses(_, f)))
  }
}
