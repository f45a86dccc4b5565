package graft.config

/** Global configuration registry for the engine.
  *
  * Mirrors the reference's option registry (reference: woodwork/config.py:6-118):
  * regex patterns used by type inference/validation, null sentinels, inference
  * thresholds, and boolean coercion maps. All defaults match the reference's
  * CONFIG_DEFAULTS so inference produces the same results on the same data.
  */
final case class WwOptions(
    categoricalThreshold: Double = 0.2,
    numericCategoricalThreshold: Option[Double] = None,
    // reference: woodwork/config.py:9
    emailInferenceRegex: String = "^[a-zA-Z0-9_.+-]+@[a-zA-Z0-9-]+\\.[a-zA-Z0-9-.]+$",
    // reference: woodwork/config.py:10
    urlInferenceRegex: String =
      "http[s]?://(?:[a-zA-Z]|[0-9]|[$-_@.&+]|[!*\\(\\),]|(?:%[0-9a-fA-F][0-9a-fA-F]))+",
    // reference: woodwork/config.py:11
    ipv4InferenceRegex: String =
      "^(([0-9]|[1-9][0-9]|1[0-9]{2}|2[0-4][0-9]|25[0-5])\\.){3}([0-9]|[1-9][0-9]|1[0-9]{2}|2[0-4][0-9]|25[0-5])$",
    // reference: woodwork/config.py:12-22 (joined multiline pattern)
    ipv6InferenceRegex: String =
      "(([0-9a-fA-F]{1,4}:){7,7}[0-9a-fA-F]{1,4}|([0-9a-fA-F]{1,4}:){1,7}:|([0-9a-fA-F]{1,4}:){1,6}:[0-9a-fA-F]{1,4}|([0-9a-fA-F]{1,4}:){1,5}(:[0-9a-fA-F]{1,4}){1,2}|([0-9a-fA-F]{1,4}:){1,4}(:[0-9a-fA-F]{1,4}){1,3}|([0-9a-fA-F]{1,4}:){1,3}(:[0-9a-fA-F]{1,4}){1,4}|([0-9a-fA-F]{1,4}:){1,2}(:[0-9a-fA-F]{1,4}){1,5}|[0-9a-fA-F]{1,4}:((:[0-9a-fA-F]{1,4}){1,6})|:((:[0-9a-fA-F]{1,4}){1,7}|:)|fe80:(:[0-9a-fA-F]{0,4}){0,4}%[0-9a-zA-Z]{1,}|::(ffff(:0{1,4}){0,1}:){0,1}((25[0-5]|(2[0-4]|1{0,1}[0-9]){0,1}[0-9])\\.){3,3}(25[0-5]|(2[0-4]|1{0,1}[0-9]){0,1}[0-9])|([0-9a-fA-F]{1,4}:){1,4}:((25[0-5]|(2[0-4]|1{0,1}[0-9]){0,1}[0-9])\\.){3,3}(25[0-5]|(2[0-4]|1{0,1}[0-9]){0,1}[0-9]))",
    // reference: woodwork/config.py:23
    phoneInferenceRegex: String =
      "(?:\\+?(0{2})?1[-.\\s●]?)?\\(?([2-9][0-9]{2})\\)?[-\\.\\s●]?([2-9][0-9]{2})[-\\.\\s●]?([0-9]{4})$",
    // reference: woodwork/config.py:24
    postalCodeInferenceRegex: String = "^[0-9]{5}(?:-[0-9]{4})?$",
    // reference: woodwork/config.py:25-51 (string sentinels only; NaN/NaT are
    // physical nulls in Spark)
    nanValues: Seq[String] = Seq(
      "", " ", "None", "NONE", "none", "NULL", "Null", "null", "NAN", "NaN",
      "Nan", "nan", "NA", "na", "N/A", "n/a", "n/A", "N/a", "<NA>", "<N/A>",
      "<n/a>", "<na>"),
    frequenceInferenceWindowLength: Int = 15,
    frequenceInferenceThreshold: Double = 0.9,
    medcoupleThreshold: Double = 0.3,
    medcoupleSampleSize: Int = 10000,
    // reference: woodwork/config.py:57-64
    booleanInferenceStrings: Set[Set[String]] = Set(
      Set("yes", "no"), Set("y", "n"), Set("true", "false"), Set("t", "f")),
    // reference: woodwork/config.py:65-74
    booleanTransformMappings: Map[String, Boolean] = Map(
      "yes" -> true, "no" -> false, "y" -> true, "n" -> false,
      "true" -> true, "false" -> false, "t" -> true, "f" -> false),
    booleanInferenceInts: Set[Long] = Set.empty,
    /** Rows sampled for type inference (reference: type_system.py:101). */
    inferenceSampleSize: Int = 100000,
    /** Rows sampled for datetime-format inference (reference: utils.py:595-603). */
    datetimeFormatSampleSize: Int = 100
)

object WwConfig {
  @volatile private var current: WwOptions = WwOptions()
  def options: WwOptions = current
  def set(opts: WwOptions): Unit = { current = opts }
  def reset(): Unit = { current = WwOptions() }

  /** Loaner-pattern equivalent of the reference's `with_options` context
    * manager (reference: woodwork/config.py:104-113).
    */
  def withOptions[A](opts: WwOptions)(body: => A): A = {
    val prev = current
    current = opts
    try body
    finally current = prev
  }
}
