package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Declarative data-quality constraints over (typed) frames — the
  * dbt-test / expectation-suite layer a 100 TB ingest needs before data is
  * allowed downstream. Design for scale:
  *
  *   - all ROW-predicate constraints (not-null, range, accepted values,
  *     regex, custom expression) fold into ONE aggregation pass over the
  *     table — a single scan regardless of how many are declared;
  *   - uniqueness runs as one groupBy per declared key set (count>1 key
  *     count — never a distinct of the full row set);
  *   - referential containment is a broadcast-or-shuffle left-anti count
  *     against the referenced key column (AQE picks; dims broadcast).
  *
  * Results are a small (one row per constraint) DataFrame:
  * (constraint, kind, violations, passed) — violations is the exact row
  * (or key) count that failed, so the report is also the monitoring
  * metric.
  */
object Constraints {

  sealed trait Constraint { def name: String }

  /** Column must have no nulls. */
  final case class NotNull(column: String) extends Constraint {
    def name = s"not_null:$column"
  }

  /** Values (non-null) must fall in [lo, hi]. */
  final case class InRange(column: String, lo: Double, hi: Double)
      extends Constraint {
    def name = s"in_range:$column"
  }

  /** Non-null values must be members of the accepted set. */
  final case class AcceptedValues(column: String, values: Seq[String])
      extends Constraint {
    def name = s"accepted_values:$column"
  }

  /** Non-null values must match the regex (fullmatch, rlike anchored by
    * the caller if needed).
    */
  final case class MatchesRegex(column: String, regex: String)
      extends Constraint {
    def name = s"matches_regex:$column"
  }

  /** Arbitrary row predicate that must hold on every row; violations =
    * rows where the expression is false or null.
    */
  final case class Satisfies(label: String, predicate: Column)
      extends Constraint {
    def name = s"satisfies:$label"
  }

  /** Key set must be unique across the table; violations = number of
    * DISTINCT key tuples that occur more than once.
    */
  final case class Unique(columns: Seq[String]) extends Constraint {
    def name = s"unique:${columns.mkString(",")}"
  }

  /** Every non-null value must exist in `ref`'s `refColumn` (referential
    * containment); violations = rows whose key is absent.
    */
  final case class ForeignKey(column: String, ref: DataFrame,
                              refColumn: String) extends Constraint {
    def name = s"foreign_key:$column"
  }

  /** Aggregated violation count, derived from the single source of truth
    * [[rowViolation]] — check() and quarantine() can never diverge on
    * what a row-level constraint means. None for set-level kinds.
    */
  private def violationExpr(c: Constraint): Option[Column] =
    rowViolation(c).map(v => sum(when(v, 1L).otherwise(0L)))

  private def kindOf(c: Constraint): String = c match {
    case _: NotNull => "not_null"
    case _: InRange => "in_range"
    case _: AcceptedValues => "accepted_values"
    case _: MatchesRegex => "matches_regex"
    case _: Satisfies => "satisfies"
    case _: Unique => "unique"
    case _: ForeignKey => "foreign_key"
  }

  /** Per-row violation predicate for row-level constraints (None for the
    * set-level Unique/ForeignKey kinds).
    */
  private def rowViolation(c: Constraint): Option[Column] = c match {
    case NotNull(col0) => Some(col(col0).isNull)
    case InRange(col0, lo, hi) =>
      Some(col(col0).isNotNull && (col(col0) < lo || col(col0) > hi))
    case AcceptedValues(col0, vals) =>
      Some(col(col0).isNotNull && !col(col0).cast(StringType).isin(vals: _*))
    case MatchesRegex(col0, re) =>
      Some(col(col0).isNotNull && !col(col0).cast(StringType).rlike(re))
    case Satisfies(_, pred) => Some(!coalesce(pred, lit(false)))
    case _ => None
  }

  /** Ingest-time routing with the same constraint declarations: annotate
    * each row with the names of the ROW-LEVEL constraints it violates
    * (`dq_failed`, declaration order; empty array = clean). One pure
    * projection — no shuffle, streams as-is. Set-level constraints
    * (Unique/ForeignKey) are rejected: routing a row needs a per-row
    * answer.
    */
  def quarantine(df: DataFrame, constraints: Seq[Constraint],
                 outCol: String = "dq_failed"): DataFrame = {
    require(constraints.nonEmpty, "no constraints given")
    val perRow = constraints.map { c =>
      rowViolation(c).getOrElse(throw new IllegalArgumentException(
        s"${c.name} is set-level; quarantine takes row-level constraints only"))
        .cast(BooleanType) -> c.name
    }
    df.withColumn(outCol, array_compact(array(perRow.map { case (v, n) =>
      when(v, lit(n)).otherwise(lit(null).cast(StringType))
    }: _*)))
  }

  /** Evaluate all constraints; returns one row per constraint:
    * (constraint, kind, violations, passed) ordered by constraint name.
    */
  def check(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "no constraints given")
    // results key by name — two Satisfies("x", ...) would silently collide
    val dup = constraints.groupBy(_.name).collect { case (n, cs) if cs.size > 1 => n }
    require(dup.isEmpty, s"duplicate constraint names: ${dup.mkString(", ")}")
    val spark = df.sparkSession
    import spark.implicits._

    val rowLevel = constraints.flatMap(c => violationExpr(c).map(c -> _))
    val rowCounts: Map[String, Long] =
      if (rowLevel.isEmpty) Map.empty
      else {
        val aggs = rowLevel.zipWithIndex.map { case ((_, e), i) => e.as(s"v$i") }
        val row = df.agg(aggs.head, aggs.tail: _*).head()
        rowLevel.zipWithIndex.map { case ((c, _), i) =>
          c.name -> (if (row.isNullAt(i)) 0L else row.getLong(i))
        }.toMap
      }

    val otherCounts: Map[String, Long] = constraints.collect {
      case c @ Unique(cols) =>
        c.name -> df.groupBy(cols.map(col): _*).count()
          .where(col("count") > 1).count()
      case c @ ForeignKey(col0, ref, refCol) =>
        c.name -> df.where(col(col0).isNotNull)
          .join(ref.select(col(refCol).as(col0)).distinct(),
            Seq(col0), "left_anti")
          .count()
    }.toMap

    val all = rowCounts ++ otherCounts
    constraints.map { c =>
      val v = all(c.name)
      (c.name, kindOf(c), v, v == 0L)
    }.toDF("constraint", "kind", "violations", "passed")
      .orderBy("constraint")
  }
}
