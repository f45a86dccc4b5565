package graft.types

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.config.WwConfig

/** Logical type layer over Spark physical types.
  *
  * Re-expresses the reference's 25-type logical type system
  * (reference: woodwork/logical_types.py) Spark-first: every coercion
  * (`transform`) and validation (`invalidExpr`) is a Catalyst Column
  * expression — codegen'd, distributed, no driver-side row work. The
  * physical layer is a Spark `DataType` rather than a pandas dtype; the
  * nullable-vs-non-nullable pandas distinction (int64 vs Int64) is carried by
  * the logical type identity itself (Integer vs IntegerNullable).
  *
  * OPEN for extension (reference contract: type_system.py:143-189 `add_type`
  * accepts user LogicalType subclasses, exercised by
  * tests/type_system/test_custom_types.py): user types subclass this trait,
  * optionally override [[LogicalType.withParams]] for parameterized
  * round-trips, and register via `TypeSystem.addType` — after which
  * inference, coercion, schema metadata and disk serialization all treat
  * them exactly like built-ins.
  */
trait LogicalType extends Serializable {
  /** Class-style name, e.g. "IntegerNullable". */
  def name: String = getClass.getSimpleName.stripSuffix("$")

  /** snake_case name, e.g. "integer_nullable" (reference: utils.py:58-60). */
  def typeString: String = LogicalType.camelToSnake(name)

  /** Target Spark physical type. */
  def sparkType: DataType

  /** Standard semantic tags contributed by this type. */
  def standardTags: Set[String] = Set.empty

  /** Extra parameters serialized with the type (order, format, ...). */
  def params: Map[String, String] = Map.empty

  /** Coerce a column of physical type `from` to this logical type's physical
    * representation. Invalid values become null (matching the reference's
    * errors="coerce" paths). Pure Column expression — stays in codegen.
    */
  def transform(c: Column, from: DataType): Column =
    if (from == sparkType) c else c.try_cast(sparkType)

  /** Coercion with the reference's `null_invalid_values` knob
    * (reference: logical_types.py transform signatures, default False): types
    * whose invalid values can be PRESERVED in the physical representation
    * (the regex string types) only null them when the flag is set. Types
    * whose physical coercion inherently nulls unparseable values (numerics,
    * datetimes, booleans, LatLong — where the reference would raise instead)
    * ignore the flag; that errors="coerce" default is the documented
    * divergence.
    */
  def transform(c: Column, from: DataType, nullInvalidValues: Boolean): Column =
    transform(c, from)

  /** Boolean expression that is true for rows whose value is INVALID for this
    * logical type (null-safe: null is never invalid). Used by
    * `validate_logical_types` (reference: logical_types.py:70-78, 807-827).
    */
  def invalidExpr(c: Column): Column = lit(false)

  /** Reconstruct this type with deserialized params (identity for
    * parameter-free types). Custom parameterized types override this so
    * schema-metadata and disk round-trips restore their parameters.
    */
  def withParams(params: Map[String, String]): LogicalType = this
}

object LogicalType {
  /** Spark's IntegralType/FractionalType are private[sql]; public matchers. */
  def isIntegralType(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }
  def isFractionalType(dt: DataType): Boolean = dt match {
    case FloatType | DoubleType | _: DecimalType => true
    case _ => false
  }

  def camelToSnake(s: String): String =
    s.replaceAll("([a-z0-9])([A-Z])", "$1_$2")
      .replaceAll("([A-Z]+)([A-Z][a-z])", "$1_$2")
      .toLowerCase

  /** Replace the configured string null sentinels with null
    * (reference: logical_types.py:830-845 `_replace_nans`).
    */
  def replaceNans(c: Column, from: DataType): Column = from match {
    case StringType =>
      when(c.isin(WwConfig.options.nanValues: _*), lit(null).cast(StringType))
        .otherwise(c)
    case _ => c
  }

  /** Start-anchored match, mirroring pandas `str.match` semantics used by the
    * reference's regex validation (reference: logical_types.py:807-827,
    * inference_functions.py:176-222).
    */
  def startMatch(c: Column, regex: String): Column =
    c.rlike("^(?:" + regex + ")")

  private def regexInvalid(c: Column, regex: String): Column =
    c.isNotNull && !startMatch(c.cast(StringType), regex)

  private def regexTransform(c: Column, from: DataType, regex: String): Column = {
    val s = replaceNans(c, from).cast(StringType)
    when(startMatch(s, regex), s)
  }

  // ---------------------------------------------------------------- plain text
  /** reference: logical_types.py:81 */
  case object Address extends LogicalType { def sparkType: DataType = StringType }

  /** reference: logical_types.py:488 */
  case object PersonFullName extends LogicalType { def sparkType: DataType = StringType }

  /** reference: logical_types.py:473 */
  case object Filepath extends LogicalType { def sparkType: DataType = StringType }

  /** reference: logical_types.py:558 */
  case object NaturalLanguage extends LogicalType { def sparkType: DataType = StringType }

  /** Fallback type (reference: logical_types.py:573, type_system.py:99). */
  case object Unknown extends LogicalType { def sparkType: DataType = StringType }

  // ---------------------------------------------------------------- numerics
  /** reference: logical_types.py:394 */
  case object Integer extends LogicalType {
    def sparkType: DataType = LongType
    override def standardTags: Set[String] = Set("numeric")
    override def transform(c: Column, from: DataType): Column =
      IntegerNullable.transform(c, from)
  }

  /** Nullable integer; non-integral floats coerce to null
    * (reference: logical_types.py:410-439, 923-928 `_coerce_integer`).
    */
  case object IntegerNullable extends LogicalType {
    def sparkType: DataType = LongType
    override def standardTags: Set[String] = Set("numeric")
    override def transform(c: Column, from: DataType): Column = from match {
      case t if isIntegralType(t) => c.cast(LongType)
      // try_cast, not cast: a >Long.Max integral double (e.g. a 20-digit
      // integer string inferred as IntegerNullable) must coerce to null under
      // ANSI mode (errors="coerce"), not throw at action time
      case t if isFractionalType(t) => when(c % 1 === 0, c.try_cast(LongType))
      case _ =>
        val s = replaceNans(c, from)
        // exact integer strings first: routing a 19-digit id through
        // DoubleType would round it to the nearest 2^53-representable value
        val d = s.try_cast(DoubleType)
        coalesce(s.try_cast(LongType),
          when(d % 1 === 0, d.try_cast(LongType)))
    }
  }

  /** reference: logical_types.py:372-391, 891-894 `_coerce_numeric` */
  case object Double extends LogicalType {
    def sparkType: DataType = DoubleType
    override def standardTags: Set[String] = Set("numeric")
    override def transform(c: Column, from: DataType): Column =
      replaceNans(c, from).try_cast(DoubleType)
  }

  /** Non-negative integer age; validate flags negatives
    * (reference: logical_types.py:94-118, 848-876).
    */
  case object Age extends LogicalType {
    def sparkType: DataType = LongType
    override def standardTags: Set[String] = Set("numeric")
    override def transform(c: Column, from: DataType): Column =
      IntegerNullable.transform(c, from)
    override def invalidExpr(c: Column): Column = c.isNotNull && c < 0
  }

  /** reference: logical_types.py:153 */
  case object AgeNullable extends LogicalType {
    def sparkType: DataType = LongType
    override def standardTags: Set[String] = Set("numeric")
    override def transform(c: Column, from: DataType): Column = {
      // negative ages coerce to null (reference: logical_types.py:931-937)
      val v = IntegerNullable.transform(c, from)
      when(v >= 0, v)
    }
    override def invalidExpr(c: Column): Column = c.isNotNull && c < 0
  }

  /** reference: logical_types.py:121 */
  case object AgeFractional extends LogicalType {
    def sparkType: DataType = DoubleType
    override def standardTags: Set[String] = Set("numeric")
    override def transform(c: Column, from: DataType): Column = {
      val v = Double.transform(c, from)
      when(v >= 0, v)
    }
    override def invalidExpr(c: Column): Column = c.isNotNull && c < 0
  }

  // ---------------------------------------------------------------- booleans
  private def booleanCoerce(c: Column, from: DataType): Column = from match {
    case BooleanType => c
    case _: NumericType => when(c.isNotNull, c =!= 0)
    case _ =>
      // string token map (reference: logical_types.py:904-920
      // `_transform_boolean`; token maps at config.py:65-74 plus "1"/"0")
      val s = lower(trim(replaceNans(c, from).cast(StringType)))
      val mapping = WwConfig.options.booleanTransformMappings ++
        Map("1" -> true, "0" -> false, "1.0" -> true, "0.0" -> false)
      mapping.foldLeft(when(s.isNull, lit(null).cast(BooleanType))) {
        case (acc, (k, v)) => acc.when(s === k, lit(v))
      }
  }

  /** reference: logical_types.py:185-226; `cast_nulls_as` fills nulls with a
    * fixed boolean during coercion (reference: logical_types.py:201-206).
    */
  final case class BooleanT(castNullsAs: Option[Boolean] = None) extends LogicalType {
    override def name: String = "Boolean"
    def sparkType: DataType = BooleanType
    override def params: Map[String, String] =
      castNullsAs.map(v => "cast_nulls_as" -> v.toString).toMap
    override def transform(c: Column, from: DataType): Column = {
      val coerced = booleanCoerce(c, from)
      castNullsAs match {
        case Some(v) => coalesce(coerced, lit(v))
        case None => coerced
      }
    }
  }

  /** reference: logical_types.py:229-245 */
  case object BooleanNullable extends LogicalType {
    def sparkType: DataType = BooleanType
    override def transform(c: Column, from: DataType): Column = booleanCoerce(c, from)
  }

  // ---------------------------------------------------------------- categoricals
  /** reference: logical_types.py:248-266. Spark has no dictionary dtype at the
    * API level; parquet dictionary encoding covers storage, so the physical
    * type is string + the `category` tag.
    */
  case object Categorical extends LogicalType {
    def sparkType: DataType = StringType
    override def standardTags: Set[String] = Set("category")
    override def transform(c: Column, from: DataType): Column =
      replaceNans(c, from).cast(StringType)
  }

  /** reference: logical_types.py:269 (ISO-3166 alpha-2) */
  case object CountryCode extends LogicalType {
    def sparkType: DataType = StringType
    override def standardTags: Set[String] = Set("category")
    override def transform(c: Column, from: DataType): Column =
      replaceNans(c, from).cast(StringType)
  }

  /** reference: logical_types.py:284 (ISO-4217) */
  case object CurrencyCode extends LogicalType {
    def sparkType: DataType = StringType
    override def standardTags: Set[String] = Set("category")
    override def transform(c: Column, from: DataType): Column =
      replaceNans(c, from).cast(StringType)
  }

  /** reference: logical_types.py:681 (ISO 3166-2) */
  case object SubRegionCode extends LogicalType {
    def sparkType: DataType = StringType
    override def standardTags: Set[String] = Set("category")
    override def transform(c: Column, from: DataType): Column =
      replaceNans(c, from).cast(StringType)
  }

  /** US zip; numeric inputs normalize to 5-digit strings
    * (reference: logical_types.py:743-768, 947-950).
    */
  case object PostalCode extends LogicalType {
    def sparkType: DataType = StringType
    override def standardTags: Set[String] = Set("category")
    override def transform(c: Column, from: DataType): Column = from match {
      // when-guard: java.util.Formatter renders a null arg as the literal
      // string "null" rather than propagating SQL NULL
      case _: NumericType =>
        when(c.isNotNull, format_string("%05.0f", c.cast(DoubleType)))
      case _ => replaceNans(c, from).cast(StringType)
    }
    /** flag → `_coerce_postal_code` (reference: logical_types.py:758-760,
      * 947-950): numeric normalization plus regex nulling.
      */
    override def transform(c: Column, from: DataType,
                           nullInvalidValues: Boolean): Column = {
      val base = transform(c, from)
      if (nullInvalidValues)
        when(startMatch(base, WwConfig.options.postalCodeInferenceRegex), base)
      else base
    }
    override def invalidExpr(c: Column): Column =
      regexInvalid(c, WwConfig.options.postalCodeInferenceRegex)
  }

  /** Ordered categorical; order is explicit (Spark has no ordered category
    * dtype — order lives in the schema metadata, rank is
    * `array_position(order, value)`). reference: logical_types.py:588-637.
    */
  final case class Ordinal(order: Seq[String] = Nil) extends LogicalType {
    override def name: String = "Ordinal"
    def sparkType: DataType = StringType
    override def standardTags: Set[String] = Set("category")
    override def params: Map[String, String] =
      if (order.isEmpty) Map.empty else Map("order" -> order.mkString(Ordinal.Sep))
    override def transform(c: Column, from: DataType): Column =
      replaceNans(c, from).cast(StringType)
    /** all non-null values must be in `order` (reference: logical_types.py:610-627) */
    override def invalidExpr(c: Column): Column =
      if (order.isEmpty) lit(false)
      else c.isNotNull && !c.cast(StringType).isin(order: _*)
    /** 1-based rank of each value in the declared order (0 = absent). */
    def rank(c: Column): Column = array_position(lit(order.toArray), c.cast(StringType))
  }
  object Ordinal {
    /** Separator used when serializing `order` into flat string params. */
    val Sep = "\u001f"
  }

  // ---------------------------------------------------------------- temporal
  /** Candidate timestamp formats for format-free string parsing; mirrors the
    * spirit of pandas' per-element format fallback
    * (reference: utils.py:595-650 `_infer_datetime_format` + to_datetime's
    * element-wise parse) without per-row python.
    */
  val datetimeFormats: Seq[String] = Seq(
    "yyyy-MM-dd", "yyyy-MM-dd HH:mm:ss", "yyyy/MM/dd", "MM/dd/yyyy",
    "MM-dd-yyyy", "dd/MM/yyyy", "yyyyMMdd", "MM/dd/yy", "dd-MMM-yyyy",
    "MMM d, yyyy", "yyyy-MM-dd'T'HH:mm:ss")

  /** Two-digit-year pivot: Spark's `yy` maps everything to 20xx; pandas
    * pivots 69-99 into 19xx (reference: logical_types.py:329-333, 367-368).
    * Applied only to the two-digit-year format branches.
    */
  private def pivotTwoDigitYear(t: Column): Column =
    when(year(t) >= 2069, add_months(t, -1200)).otherwise(t)

  /** Permissive shape guard per format — a SUPERSET of the strings the
    * format can parse (java.time two-letter fields parse exactly two digits,
    * so `{1,2}` widths can never reject a parseable value). On the all-fail
    * path (non-datetime strings, unknown formats) the cascade then costs 12
    * compiled-regex rejections instead of 12 exception-throwing parse
    * attempts — measured 4× faster inference on digit-shaped columns.
    */
  private val formatShapes: Map[String, String] = Map(
    "yyyy-MM-dd" -> "^\\s*\\d{4}-\\d{1,2}-\\d{1,2}\\s*$",
    "yyyy-MM-dd HH:mm:ss" ->
      "^\\s*\\d{4}-\\d{1,2}-\\d{1,2} \\d{1,2}:\\d{1,2}:\\d{1,2}\\s*$",
    "yyyy/MM/dd" -> "^\\s*\\d{4}/\\d{1,2}/\\d{1,2}\\s*$",
    "MM/dd/yyyy" -> "^\\s*\\d{1,2}/\\d{1,2}/\\d{4}\\s*$",
    "MM-dd-yyyy" -> "^\\s*\\d{1,2}-\\d{1,2}-\\d{4}\\s*$",
    "dd/MM/yyyy" -> "^\\s*\\d{1,2}/\\d{1,2}/\\d{4}\\s*$",
    "yyyyMMdd" -> "^\\s*\\d{8}\\s*$",
    "MM/dd/yy" -> "^\\s*\\d{1,2}/\\d{1,2}/\\d{2}\\s*$",
    "dd-MMM-yyyy" -> "^\\s*\\d{1,2}-[A-Za-z]{3}-\\d{4}\\s*$",
    "MMM d, yyyy" -> "^\\s*[A-Za-z]{3} \\d{1,2}, \\d{4}\\s*$",
    "yyyy-MM-dd'T'HH:mm:ss" ->
      "^\\s*\\d{4}-\\d{1,2}-\\d{1,2}T\\d{1,2}:\\d{1,2}:\\d{1,2}\\s*$")

  /** Guarded multi-format timestamp parse shared by inference and coercion —
    * a column that INFERS as Datetime must also COERCE under the same parser.
    * The length guard short-circuits the format cascade for free text; the
    * per-format shape guards short-circuit the parse attempts themselves.
    */
  def parseTimestamp(s: Column): Column =
    when(length(s).between(6, 35),
      coalesce((s.try_cast(TimestampType) +:
        datetimeFormats.map { f =>
          val t = when(s.rlike(formatShapes(f)), try_to_timestamp(s, lit(f)))
          if (f.contains("yy") && !f.contains("yyyy")) pivotTwoDigitYear(t) else t
        }): _*))

  /** reference: logical_types.py:298-368. Spark TimestampType (session TZ
    * UTC); explicit format via to_timestamp, otherwise the shared
    * multi-format parse (errors="coerce" equivalent).
    *
    * Timezone strip-and-store (reference `_remove_timezone`,
    * logical_types.py:319-324): with `timezone` set, coerced values are the
    * WALL-CLOCK time in that zone (the pandas `tz_localize(None)` result) and
    * the zone name rides in the params for serialization.
    */
  final case class Datetime(datetimeFormat: Option[String] = None,
                            timezone: Option[String] = None) extends LogicalType {
    override def name: String = "Datetime"
    def sparkType: DataType = TimestampType
    override def params: Map[String, String] =
      datetimeFormat.map("datetime_format" -> _).toMap ++
        timezone.map("timezone" -> _).toMap
    private def stripTz(t: Column): Column = timezone match {
      // instant (UTC-normalized under the session zone) → naive wall clock
      // in the stored zone, matching pandas' tz_localize(None)
      case Some(tz) => from_utc_timestamp(t, tz)
      case None => t
    }
    override def transform(c: Column, from: DataType): Column = from match {
      case TimestampType => stripTz(c)
      case DateType => c.cast(TimestampType)
      case _: NumericType => c.cast(TimestampType)
      case _ =>
        val s = replaceNans(c, from).cast(StringType)
        datetimeFormat match {
          case Some(fmt) =>
            // pandas pivots two-digit years 69-99 into 19xx; Spark's `yy`
            // maps everything to 20xx (reference: logical_types.py:329-333)
            val t = try_to_timestamp(s, lit(fmt))
            stripTz(
              if (fmt.contains("yy") && !fmt.contains("yyyy"))
                pivotTwoDigitYear(t)
              else t)
          case None => stripTz(parseTimestamp(s))
        }
    }
  }

  /** reference: logical_types.py:697 */
  case object Timedelta extends LogicalType {
    def sparkType: DataType = DayTimeIntervalType()
  }

  // ---------------------------------------------------------------- regex-validated strings
  /** Shared shape for the regex string types: the 2-arg transform keeps the
    * strict errors="coerce" behavior (nulls non-matching values); the flagged
    * transform mirrors the reference exactly — invalid values are PRESERVED
    * unless `null_invalid_values` is set (reference: logical_types.py:455-461
    * and siblings, default False).
    */
  sealed trait RegexStringType extends LogicalType {
    def sparkType: DataType = StringType
    protected def regex: String
    override def transform(c: Column, from: DataType): Column =
      regexTransform(c, from, regex)
    override def transform(c: Column, from: DataType,
                           nullInvalidValues: Boolean): Column =
      if (nullInvalidValues) regexTransform(c, from, regex)
      else replaceNans(c, from).cast(StringType)
    override def invalidExpr(c: Column): Column = regexInvalid(c, regex)
  }

  /** reference: logical_types.py:442-470 */
  case object EmailAddress extends RegexStringType {
    protected def regex: String = WwConfig.options.emailInferenceRegex
  }

  /** reference: logical_types.py:503 (ipv4 or ipv6); NOTE the reference's
    * IPAddress has NO transform coercion at all — values pass through and
    * only validate flags them — so the flagged path preserves always.
    */
  case object IPAddress extends LogicalType {
    def sparkType: DataType = StringType
    private def regex =
      s"(${WwConfig.options.ipv4InferenceRegex})|(${WwConfig.options.ipv6InferenceRegex})"
    override def transform(c: Column, from: DataType): Column =
      regexTransform(c, from, regex)
    override def transform(c: Column, from: DataType,
                           nullInvalidValues: Boolean): Column =
      if (nullInvalidValues) regexTransform(c, from, regex)
      else replaceNans(c, from).cast(StringType)
    override def invalidExpr(c: Column): Column = regexInvalid(c, regex)
  }

  /** reference: logical_types.py:648 (US/Canada numbers) */
  case object PhoneNumber extends RegexStringType {
    protected def regex: String = WwConfig.options.phoneInferenceRegex
  }

  /** reference: logical_types.py:711 */
  case object URL extends RegexStringType {
    protected def regex: String = WwConfig.options.urlInferenceRegex
  }

  // ---------------------------------------------------------------- LatLong
  /** The one genuinely structured type: (lat, lon) as a struct of doubles
    * (reference: logical_types.py:518-545; parse at utils.py:222-259).
    * Accepts struct input, array<double> input, or a "(lat, lon)" /
    * "[lat, lon]" string. A malformed value coerces to null.
    *
    * Null convention (SURVEY §4.3.6): a fully-null pair is a NULL STRUCT —
    * never struct(null, null) — mirroring the reference's single-NaN
    * representation (utils.py:311-327 `_is_latlong_nan`); a half-null pair
    * keeps the struct with one null field.
    */
  case object LatLong extends LogicalType {
    val structType: StructType = StructType(Seq(
      StructField("lat", DoubleType), StructField("lon", DoubleType)))
    def sparkType: DataType = structType
    override def transform(c: Column, from: DataType): Column = from match {
      case s: StructType if s.length == 2 =>
        val lat = c.getField(s(0).name).cast(DoubleType)
        val lon = c.getField(s(1).name).cast(DoubleType)
        when(c.isNotNull && (lat.isNotNull || lon.isNotNull),
          struct(lat.as("lat"), lon.as("lon")))
      case ArrayType(_, _) =>
        // fully-null pair stays a NULL STRUCT (the documented convention),
        // matching the struct and string branches
        when(size(c) === 2 &&
            (element_at(c, 1).isNotNull || element_at(c, 2).isNotNull),
          struct(element_at(c, 1).cast(DoubleType).as("lat"),
                 element_at(c, 2).cast(DoubleType).as("lon")))
      case _ =>
        val s = replaceNans(c, from).cast(StringType)
        val lat = regexp_extract(s,
          "^[\\(\\[]?\\s*(-?[0-9.]+)\\s*,\\s*(-?[0-9.]+)\\s*[\\)\\]]?$", 1)
        val lon = regexp_extract(s,
          "^[\\(\\[]?\\s*(-?[0-9.]+)\\s*,\\s*(-?[0-9.]+)\\s*[\\)\\]]?$", 2)
        when(lat =!= "" && lon =!= "",
          struct(lat.try_cast(DoubleType).as("lat"),
                 lon.try_cast(DoubleType).as("lon")))
    }
    override def invalidExpr(c: Column): Column =
      c.isNotNull && (abs(c.getField("lat")) > 90 || abs(c.getField("lon")) > 180)
  }

  /** All 25 concrete types (parameterized ones with default params). */
  val all: Seq[LogicalType] = Seq(
    Address, Age, AgeFractional, AgeNullable, BooleanT(), BooleanNullable,
    Categorical, CountryCode, CurrencyCode, Datetime(), Double, EmailAddress,
    Filepath, Integer, IntegerNullable, IPAddress, LatLong, NaturalLanguage,
    Ordinal(), PersonFullName, PhoneNumber, PostalCode, SubRegionCode,
    Timedelta, URL, Unknown)

  /** Resolve a type_string or class name to a LogicalType
    * (reference: type_sys/utils.py `str_to_logical_type` — which searches the
    * live type system's registered types, so custom types registered via
    * `TypeSystem.addType` resolve here too and survive disk round-trips).
    */
  def fromString(s: String, params: Map[String, String] = Map.empty,
                 ts: TypeSystem = TypeSystem.global): LogicalType = {
    val norm = s.trim.toLowerCase.replace(" ", "_")
    val base = all.find(t => t.typeString == norm || t.name.toLowerCase == norm)
      .orElse(ts.lookup(norm))
      .getOrElse(throw new IllegalArgumentException(s"Unknown logical type: $s"))
    base match {
      case _: Ordinal =>
        Ordinal(params.get("order").map(_.split(Ordinal.Sep).toSeq).getOrElse(Nil))
      case _: Datetime =>
        Datetime(params.get("datetime_format"), params.get("timezone"))
      case _: BooleanT =>
        BooleanT(params.get("cast_nulls_as").map(_.toBoolean))
      case t => if (params.isEmpty) t else t.withParams(params)
    }
  }
}
