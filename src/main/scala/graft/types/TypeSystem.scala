package graft.types

import org.apache.spark.sql.types._

import graft.config.WwConfig
import graft.types.{LogicalType => LT}

/** Per-column statistics gathered in ONE distributed aggregation pass over the
  * inference sample; every inference predicate is then a pure driver-side
  * function of these numbers. This is the Spark-first re-expression of the
  * reference's per-series predicate functions
  * (reference: woodwork/type_sys/inference_functions.py): instead of N python
  * passes over a pandas Series, one Catalyst agg computes everything for all
  * columns, and the DAG walk happens on the (tiny) collected row.
  */
final case class ColStats(
    dataType: DataType,
    totalCount: Long,
    nonNullCount: Long,      // after null-sentinel replacement
    distinctCount: Long,
    intParseFail: Long,      // non-null strings that don't parse as integers
    dblParseFail: Long,      // non-null strings that don't parse as doubles
    dblNonIntegral: Long,    // parsed doubles with a fractional part
    numNonIntegral: Long,    // for float physical cols: non-null non-integral values
    dtParseFail: Long,       // non-null strings that don't parse as timestamps
    boolBadToken: Long,      // non-null strings outside the boolean token maps
    boolTokens: Set[String], // lowercased boolean tokens present
    emailFail: Long,
    phoneFail: Long,
    postalFail: Long,
    urlFail: Long,
    ipFail: Long,
    nlAvgCommonWords: Double, // mean common-word count per cell (NaN if n/a)
    dateShapeCount: Long = 0L // non-null values matching d+[-/.]d+[-/.]d+ shape
) {
  def hasNulls: Boolean = nonNullCount < totalCount
}

/** Extensible inference type system: a parent/child DAG of logical types with
  * per-type inference predicates (reference: woodwork/type_sys/type_system.py).
  * Types are keyed by name; predicates consume [[ColStats]].
  */
final class TypeSystem private (
    private var inferenceFns: Map[String, Option[ColStats => Boolean]],
    private var rels: List[(String, String)],
    val defaultType: LogicalType) {

  private var instances: Map[String, LogicalType] =
    LT.all.map(t => t.name -> t).toMap

  def registeredTypes: Set[String] = inferenceFns.keySet
  def relationships: List[(String, String)] = rels
  def instanceOf(name: String): LogicalType = instances(name)

  /** Resolve a normalized (lowercase, underscored) name or type_string to a
    * registered instance — lets `LogicalType.fromString` see custom types.
    */
  def lookup(norm: String): Option[LogicalType] =
    instances.values.find(t =>
      t.typeString == norm || t.name.toLowerCase == norm)

  /** reference: type_system.py:143-189 `add_type` */
  def addType(ltype: LogicalType,
              inferenceFunction: Option[ColStats => Boolean] = None,
              parent: Option[String] = None): Unit = {
    require(parent.forall(inferenceFns.contains), "parent must be a registered type")
    instances += ltype.name -> ltype
    inferenceFns += ltype.name -> inferenceFunction
    parent.foreach(p => rels = rels :+ (p -> ltype.name))
  }

  /** reference: type_system.py:191-224 `remove_type` — children are
    * re-parented to the removed type's parent (or become roots).
    */
  def removeType(name: String): Unit = {
    require(name != defaultType.name, "cannot remove the default type")
    val parentOf = rels.find(_._2 == name).map(_._1)
    inferenceFns -= name
    if (!LT.all.exists(_.name == name)) instances -= name
    rels = rels.flatMap {
      case (p, c) if p == name => parentOf.map(_ -> c)
      case (p, c) if c == name => None
      case r => Some(r)
    }
  }

  /** reference: type_system.py:226-244 */
  def updateInferenceFunction(name: String,
                              fn: Option[ColStats => Boolean]): Unit = {
    require(inferenceFns.contains(name), s"$name is not registered")
    inferenceFns += name -> fn
  }

  /** reference: type_system.py:246-266 `update_relationship` */
  def updateRelationship(child: String, parent: String): Unit = {
    require(inferenceFns.contains(child) && inferenceFns.contains(parent))
    rels = rels.filterNot(_._2 == child) :+ (parent -> child)
  }

  /** reference: type_system.py:268-286 `reset_defaults` */
  def resetDefaults(): Unit = {
    inferenceFns = TypeSystem.defaultInferenceFns
    rels = TypeSystem.defaultRelationships
    instances = LT.all.map(t => t.name -> t).toMap
  }

  def rootTypes: Seq[String] = {
    val children = rels.map(_._2).toSet
    inferenceFns.keys.toSeq.filterNot(children).sorted
  }

  private def children(name: String): Seq[String] =
    rels.collect { case (p, c) if p == name => c }

  private def depth(name: String): Int = {
    var d = 0
    var cur = name
    var parent = rels.find(_._2 == cur).map(_._1)
    while (parent.isDefined) { d += 1; cur = parent.get; parent = rels.find(_._2 == cur).map(_._1) }
    d
  }

  /** DAG walk + tie-breaks, ported from the reference's `infer_logical_type`
    * (reference: type_system.py:336-437). BFS from root types, descending to
    * children on a match (types without a predicate pass through to their
    * children); NaturalLanguage is only consulted when nothing else matched;
    * tie-break order: IntegerNullable beats Categorical/Double, Double beats
    * Categorical, else deepest match, first-found wins on equal depth.
    */
  def inferFromStats(stats: ColStats): LogicalType = {
    if (stats.nonNullCount == 0) return defaultType

    val matches = scala.collection.mutable.ListBuffer.empty[String]
    var frontier: Seq[String] = rootTypes.filterNot(_ == "NaturalLanguage")
    while (frontier.nonEmpty) {
      val next = scala.collection.mutable.ListBuffer.empty[String]
      frontier.foreach { name =>
        inferenceFns.getOrElse(name, None) match {
          case Some(fn) =>
            // Boolean/Integer consult their nullable parent's result
            // (reference: type_system.py:366-377)
            val matched = name match {
              case "Boolean" =>
                matches.contains("BooleanNullable") && !stats.hasNulls
              case "Integer" =>
                matches.contains("IntegerNullable") && !stats.hasNulls
              case _ => fn(stats)
            }
            if (matched) { matches += name; next ++= children(name) }
          case None => next ++= children(name)
        }
      }
      frontier = next.toSeq
    }

    val winner: String =
      if (matches.isEmpty) {
        val nlMatch = inferenceFns.getOrElse("NaturalLanguage", None)
          .exists(fn => fn(stats))
        if (nlMatch) "NaturalLanguage" else defaultType.name
      } else if (matches.size == 1) matches.head
      else {
        var best =
          if ((matches.contains("Categorical") || matches.contains("Double")) &&
              matches.contains("IntegerNullable")) "IntegerNullable"
          else if (matches.contains("Categorical") && matches.contains("Double")) "Double"
          else matches.head
        var bestDepth = depth(best)
        matches.drop(1).foreach { m =>
          val d = depth(m)
          if (d > bestDepth) { best = m; bestDepth = d }
        }
        best
      }
    instances.getOrElse(winner, defaultType)
  }
}

object TypeSystem {

  private def isStringy(dt: DataType): Boolean = dt == StringType
  private def isIntegral(dt: DataType): Boolean = LT.isIntegralType(dt)
  private def isFloat(dt: DataType): Boolean = LT.isFractionalType(dt)
  private def isBool(dt: DataType): Boolean = dt == BooleanType
  private def isDatetime(dt: DataType): Boolean =
    dt == TimestampType || dt == DateType || dt == TimestampNTZType

  /** reference: inference_functions.py:27-45 `categorical_func` +
    * type_sys/utils.py:166-189 `_is_categorical_series`
    */
  private def categoricalFn(s: ColStats): Boolean = {
    val opts = WwConfig.options
    if (isStringy(s.dataType)) {
      val isDt = s.nonNullCount > 0 && s.dtParseFail == 0 && s.dblParseFail > 0
      if (isDt) false
      else s.distinctCount > 0 &&
        s.distinctCount.toDouble / s.nonNullCount <= opts.categoricalThreshold
    } else if (isFloat(s.dataType) || isIntegral(s.dataType)) {
      opts.numericCategoricalThreshold.exists(t =>
        s.distinctCount > 0 && s.distinctCount.toDouble / s.nonNullCount <= t)
    } else false
  }

  /** reference: inference_functions.py:62-87 `integer_nullable_func` */
  private def integerNullableFn(s: ColStats): Boolean =
    if (isIntegral(s.dataType)) {
      WwConfig.options.numericCategoricalThreshold match {
        case Some(t) => !(s.distinctCount > 0 &&
          s.distinctCount.toDouble / s.nonNullCount <= t)
        case None => true
      }
    } else if (isFloat(s.dataType)) {
      // a float column with NO nulls stays Double
      s.hasNulls && s.numNonIntegral == 0
    } else if (isStringy(s.dataType)) {
      s.intParseFail == 0
    } else false

  /** reference: inference_functions.py:90-107 `double_func` */
  private def doubleFn(s: ColStats): Boolean =
    if (isFloat(s.dataType)) {
      WwConfig.options.numericCategoricalThreshold match {
        case Some(t) => !(s.distinctCount > 0 &&
          s.distinctCount.toDouble / s.nonNullCount <= t)
        case None => true
      }
    } else if (isStringy(s.dataType)) {
      s.nonNullCount > 0 && s.dblParseFail == 0 && s.dblNonIntegral > 0
    } else false

  /** reference: inference_functions.py:120-143 `boolean_nullable_func` —
    * the lowercased distinct value set must EQUAL one of the configured sets.
    */
  private def booleanNullableFn(s: ColStats): Boolean =
    if (isBool(s.dataType)) true
    else if (isStringy(s.dataType)) {
      s.boolBadToken == 0 && s.boolTokens.nonEmpty && (
        s.boolTokens == Set("true", "false") ||
        WwConfig.options.booleanInferenceStrings.contains(s.boolTokens))
    } else if (isIntegral(s.dataType) && WwConfig.options.booleanInferenceInts.nonEmpty) {
      false // int-set inference disabled by default (config boolean_inference_ints = {})
    } else false

  /** reference: inference_functions.py:146-149 + type_sys/utils.py:7-41 */
  private def datetimeFn(s: ColStats): Boolean =
    if (isDatetime(s.dataType)) true
    else if (isStringy(s.dataType)) {
      // parseable as datetime AND not numeric-castable
      s.nonNullCount > 0 && s.dtParseFail == 0 && s.dblParseFail > 0
    } else false

  private def timedeltaFn(s: ColStats): Boolean =
    s.dataType.isInstanceOf[DayTimeIntervalType] ||
      s.dataType.isInstanceOf[YearMonthIntervalType]

  /** reference: inference_functions.py:169-174 `natural_language_func` */
  private def naturalLanguageFn(s: ColStats): Boolean =
    isStringy(s.dataType) && !s.nlAvgCommonWords.isNaN && s.nlAvgCommonWords > 1.14

  private def regexFn(fail: ColStats => Long)(s: ColStats): Boolean =
    isStringy(s.dataType) && fail(s) == 0

  /** reference: type_system.py:50-77 DEFAULT_INFERENCE_FUNCTIONS */
  def defaultInferenceFns: Map[String, Option[ColStats => Boolean]] = Map(
    "Address" -> None,
    "Age" -> None,
    "AgeFractional" -> None,
    "AgeNullable" -> None,
    "Boolean" -> Some((s: ColStats) => booleanNullableFn(s) && !s.hasNulls),
    "BooleanNullable" -> Some(booleanNullableFn _),
    "Categorical" -> Some(categoricalFn _),
    "CountryCode" -> None,
    "CurrencyCode" -> None,
    "Datetime" -> Some(datetimeFn _),
    "Double" -> Some(doubleFn _),
    "EmailAddress" -> Some(regexFn(_.emailFail) _),
    "Filepath" -> None,
    "PersonFullName" -> None,
    "Integer" -> Some((s: ColStats) => integerNullableFn(s) && !s.hasNulls),
    "IntegerNullable" -> Some(integerNullableFn _),
    "IPAddress" -> Some(regexFn(_.ipFail) _),
    "LatLong" -> None,
    "NaturalLanguage" -> Some(naturalLanguageFn _),
    "Ordinal" -> None,
    "PhoneNumber" -> Some(regexFn(_.phoneFail) _),
    "PostalCode" -> Some(regexFn(_.postalFail) _),
    "SubRegionCode" -> None,
    "Timedelta" -> Some(timedeltaFn _),
    "URL" -> Some(regexFn(_.urlFail) _),
    "Unknown" -> None
  )

  /** reference: type_system.py:80-97 DEFAULT_RELATIONSHIPS */
  def defaultRelationships: List[(String, String)] = List(
    "BooleanNullable" -> "Boolean",
    "Categorical" -> "CountryCode",
    "Categorical" -> "CurrencyCode",
    "Categorical" -> "Ordinal",
    "Categorical" -> "PostalCode",
    "Categorical" -> "SubRegionCode",
    "Double" -> "AgeFractional",
    "Integer" -> "Age",
    "IntegerNullable" -> "AgeNullable",
    "IntegerNullable" -> "Integer",
    "Unknown" -> "EmailAddress",
    "Unknown" -> "IPAddress",
    "Unknown" -> "PhoneNumber",
    "Unknown" -> "PostalCode",
    "Unknown" -> "Timedelta",
    "Unknown" -> "URL"
  )

  def default(): TypeSystem =
    new TypeSystem(defaultInferenceFns, defaultRelationships, LT.Unknown)

  /** Process-wide registry, mirroring the reference's module-level
    * `ww.type_system` singleton.
    */
  lazy val global: TypeSystem = default()
}
