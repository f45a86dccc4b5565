package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.types.{LogicalType => LT}

/** Coercion/validation kernels per logical type
  * (reference: woodwork/tests/logical_types/test_logical_types.py).
  */
class LogicalTypesSpec extends SparkSpec {

  private def coerce(lt: LT, values: Seq[String]): Seq[Any] = {
    import spark.implicits._
    values.toDF("c")
      .select(lt.transform(col("c"), StringType).as("c"))
      .collect().map(r => if (r.isNullAt(0)) null else r.get(0)).toSeq
  }

  test("Boolean coerces token strings; unknowns null; cast_nulls_as fills") {
    assert(coerce(LT.BooleanT(), Seq("yes", "NO", "t", "F", "1", "0", "bogus")) ==
      Seq(true, false, true, false, true, false, null))
    assert(coerce(LT.BooleanT(castNullsAs = Some(false)), Seq("yes", "bogus", "N/A")) ==
      Seq(true, false, false))
    assert(LT.fromString("Boolean", Map("cast_nulls_as" -> "true")) ==
      LT.BooleanT(Some(true)))
  }

  test("IntegerNullable nulls non-integral strings") {
    assert(coerce(LT.IntegerNullable, Seq("5", "5.0", "5.5", "x")) ==
      Seq(5L, 5L, null, null))
  }

  test("IntegerNullable coerces >Long.Max integrals to null, not ANSI error") {
    // a 20-digit integer string passes %1==0 but overflows long: errors=coerce
    assert(coerce(LT.IntegerNullable, Seq("5", "12345678901234567890123")) ==
      Seq(5L, null))
    import spark.implicits._
    val big = Seq(1.0, 1.23e19).toDF("c")
      .select(LT.IntegerNullable.transform(col("c"), DoubleType))
      .collect().map(r => if (r.isNullAt(0)) null else r.get(0)).toSeq
    assert(big == Seq(1L, null))
  }

  test("Double coerces numeric strings, nulls garbage") {
    assert(coerce(LT.Double, Seq("1.5", "2", "junk")) == Seq(1.5, 2.0, null))
  }

  test("null sentinels become nulls in transform") {
    assert(coerce(LT.Categorical, Seq("a", "N/A", "", " ", "<NA>", "none")) ==
      Seq("a", null, null, null, null, null))
  }

  test("AgeNullable nulls negatives") {
    assert(coerce(LT.AgeNullable, Seq("30", "-4", "0")) == Seq(30L, null, 0L))
  }

  test("PostalCode normalizes numerics to 5-digit strings") {
    import spark.implicits._
    val out = Seq(1234, 90210).toDF("c")
      .select(LT.PostalCode.transform(col("c"), IntegerType))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("01234", "90210"))
  }

  test("EmailAddress transform nulls regex failures; validate flags them") {
    assert(coerce(LT.EmailAddress, Seq("a@b.co", "nope")) == Seq("a@b.co", null))
    import spark.implicits._
    val invalid = Seq("a@b.co", "nope").toDF("c")
      .select(LT.EmailAddress.invalidExpr(col("c"))).collect().map(_.getBoolean(0)).toSeq
    assert(invalid == Seq(false, true))
  }

  test("null_invalid_values flag: regex types preserve by default, null when set " +
    "(reference logical_types.py transform default False)") {
    import spark.implicits._
    import graft.frame.WoodworkFrame
    val df = Seq(("a@b.co", "99999"), ("nope", "z1")).toDF("em", "zip")
    val types = Map("em" -> (LT.EmailAddress: LT), "zip" -> (LT.PostalCode: LT))
    // default (reference parity): non-matching values survive coercion
    val keep = WoodworkFrame.init(df, logicalTypes = types)
    assert(keep.df.select("em").as[String].collect().toSet == Set("a@b.co", "nope"))
    assert(keep.df.select("zip").as[String].collect().toSet == Set("99999", "z1"))
    // flag set: non-matching values null out
    val nulled = WoodworkFrame.init(df, logicalTypes = types, nullInvalidValues = true)
    assert(nulled.df.select("em").collect().map(r =>
      if (r.isNullAt(0)) null else r.getString(0)).toSet == Set("a@b.co", null))
    assert(nulled.df.select("zip").collect().map(r =>
      if (r.isNullAt(0)) null else r.getString(0)).toSet == Set("99999", null))
    // setTypes threads the same flag
    val re = keep.setTypes(Map("em" -> LT.EmailAddress), nullInvalidValues = true)
    assert(re.df.select("em").collect().count(_.isNullAt(0)) == 1)
  }

  test("LatLong null convention: fully-null pair → null struct") {
    import spark.implicits._
    val df = Seq(
      (Some(1.0), Some(2.0)), (None, None), (Some(3.0), None))
      .toDF("lat", "lon").select(struct(col("lat"), col("lon")).as("c"))
    val out = df.select(LT.LatLong.transform(col("c"),
      df.schema("c").dataType).as("c")).collect()
    assert(!out(0).isNullAt(0))
    assert(out(1).isNullAt(0)) // fully-null pair = null struct
    assert(!out(2).isNullAt(0) && out(2).getStruct(0).isNullAt(1))
  }

  test("LatLong parses string pairs into struct; malformed → null") {
    import spark.implicits._
    val rows = Seq("(33.3, -45.2)", "[1.5, 2.5]", "junk").toDF("c")
      .select(LT.LatLong.transform(col("c"), StringType).as("c")).collect()
    assert(rows(0).getStruct(0).getDouble(0) == 33.3)
    assert(rows(0).getStruct(0).getDouble(1) == -45.2)
    assert(rows(1).getStruct(0).getDouble(0) == 1.5)
    assert(rows(2).isNullAt(0))
  }

  test("Ordinal validates membership and ranks by declared order") {
    import spark.implicits._
    val ord = LT.Ordinal(Seq("low", "med", "high"))
    val df = Seq("low", "high", "bogus").toDF("c")
    val invalid = df.select(ord.invalidExpr(col("c"))).collect().map(_.getBoolean(0)).toSeq
    assert(invalid == Seq(false, false, true))
    val ranks = df.select(ord.rank(col("c"))).collect().map(_.getLong(0)).toSeq
    assert(ranks == Seq(1L, 3L, 0L))
  }

  test("transform is idempotent (transform∘transform = transform)") {
    import spark.implicits._
    for (lt <- Seq[LT](LT.Double, LT.IntegerNullable, LT.BooleanT(), LT.Categorical)) {
      val df = Seq("1", "2.5", "yes", "N/A", "x").toDF("c")
      val once = df.select(lt.transform(col("c"), StringType).as("c"))
      val twice = once.select(lt.transform(col("c"), once.schema("c").dataType).as("c"))
      assert(once.collect().toSeq == twice.collect().toSeq, lt.name)
    }
  }

  test("type_string naming is snake_case; fromString round-trips") {
    assert(LT.IntegerNullable.typeString == "integer_nullable")
    assert(LT.URL.typeString == "url")
    assert(LT.fromString("integer_nullable") == LT.IntegerNullable)
    assert(LT.fromString("Boolean") == LT.BooleanT())
    val ord = LT.Ordinal(Seq("a", "b"))
    assert(LT.fromString("ordinal", ord.params) == ord)
  }
}
