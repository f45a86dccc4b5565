package graft

import org.apache.spark.sql.functions._

import graft.frame.WoodworkFrame
import graft.infer.DatetimeFormat
import graft.types.{LogicalType => LT}

/** Learned datetime-format inference
  * (reference: woodwork/utils.py:595-650, logical_types.py:319-368).
  */
class DatetimeFormatSpec extends SparkSpec {
  import spark.implicits._

  test("guessFormat: dot-separated day-first data votes dd.MM.yyyy") {
    val samples = Seq("31.12.2020", "15.06.2019", "01.02.2021", "28.11.2018")
    assert(DatetimeFormat.guessFormat(samples).contains("dd.MM.yyyy"))
  }

  test("guessFormat: year-first dot format and time variants") {
    assert(DatetimeFormat.guessFormat(Seq("2020.12.31", "2019.01.05"))
      .contains("yyyy.MM.dd"))
    assert(DatetimeFormat.guessFormat(
      Seq("31.12.2020 10:30:00", "15.06.2019 23:59:59"))
      .contains("dd.MM.yyyy HH:mm:ss"))
  }

  test("guessFormat: two-digit-year permutations via the fallback list") {
    // yy/MM/dd: no primary format parses, the reference's first fallback wins
    assert(DatetimeFormat.guessFormat(Seq("99/12/31", "05/06/15"))
      .contains("yy/MM/dd"))
    // ambiguous all-small values resolve by fallback order (MM/dd/yy before
    // dd/MM/yy), matching the reference's check_for_other_formats order —
    // but only when no primary format matches; 4-digit years go primary
    assert(DatetimeFormat.guessFormat(Seq("31/12/99")).contains("dd/MM/yy"))
  }

  test("guessFormat: garbage yields None") {
    assert(DatetimeFormat.guessFormat(Seq("31.13.2020", "99.99.9999")).isEmpty)
    assert(DatetimeFormat.guessFormat(Nil).isEmpty)
  }

  test("end-to-end: dd.MM.yyyy column infers Datetime with learned format and coerces") {
    val df = Seq("31.12.2020", "15.06.2019", "01.02.2021", "28.11.2018",
      "13.01.2020", "25.07.2017").toDF("d")
    val f = WoodworkFrame.init(df)
    f.schema("d").logicalType match {
      case LT.Datetime(Some(fmt), _) => assert(fmt == "dd.MM.yyyy")
      case other => fail(s"expected Datetime with learned format, got $other")
    }
    val got = f.df.select(date_format(col("d"), "yyyy-MM-dd")).as[String]
      .collect().sorted
    assert(got sameElements Array("2017-07-25", "2018-11-28", "2019-06-15",
      "2020-01-13", "2020-12-31", "2021-02-01"))
  }

  test("Datetime timezone strip-and-store: wall clock in the stored zone + round-trip") {
    val dt = LT.Datetime(timezone = Some("America/New_York"))
    val df = Seq("2020-01-01 00:00:00+00:00", "2020-06-15 12:30:00Z").toDF("t")
    val got = df.select(date_format(
        dt.transform(col("t"), org.apache.spark.sql.types.StringType),
        "yyyy-MM-dd HH:mm:ss").as("wall")).as[String].collect().sorted
    // pandas tz_localize(None) keeps the wall clock: EST -5 / EDT -4
    assert(got sameElements Array("2019-12-31 19:00:00", "2020-06-15 08:30:00"))
    // the zone survives schema metadata + disk round-trips via params
    val f = WoodworkFrame.init(df, logicalTypes = Map("t" -> dt))
    assert(WoodworkFrame.init(f.df).schema("t").logicalType == dt)
    val dir = java.nio.file.Files.createTempDirectory("ww_tz").toString
    graft.io.ReadWrite.toDisk(f, dir)
    assert(graft.io.ReadWrite.fromDisk(spark, dir).schema("t").logicalType == dt)
  }

  test("two-digit-year coercion pivots 69-99 into 19xx like pandas") {
    val dt = LT.Datetime(datetimeFormat = Some("dd/MM/yy"))
    val df = Seq("31/12/99", "01/06/15", "15/03/69", "20/08/68").toDF("d")
    val got = df.select(date_format(
        dt.transform(col("d"), org.apache.spark.sql.types.StringType),
        "yyyy-MM-dd").as("iso"))
      .as[String].collect().sorted
    assert(got sameElements Array("1969-03-15", "1999-12-31", "2015-06-01",
      "2068-08-20"))
  }
}
