package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.infer.TypeInference

/** The reference's canonical `sample_df` fixture ported literally
  * (FIXTURES.md §1; reference: woodwork/tests/conftest.py:22-68 with expected
  * inferences at conftest.py:536-555). One documented divergence: the
  * `categorical` column infers Categorical in pandas only because its
  * PHYSICAL dtype is `category`; Spark has no category dtype, so the string
  * column falls through the nunique/count ≤ 0.2 threshold (4 rows, 3 distinct
  * → not categorical) to Unknown — the same answer the reference gives for a
  * plain string dtype.
  */
class SampleDfSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val sampleDf = {
    val schema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("full_name", StringType),
      StructField("email", StringType),
      StructField("phone_number", StringType),
      StructField("age", LongType),
      StructField("signup_date", TimestampType),
      StructField("is_registered", BooleanType),
      StructField("double", DoubleType, false),
      StructField("double_with_nan", DoubleType),
      StructField("integer", LongType, false),
      StructField("nullable_integer", LongType),
      StructField("boolean", BooleanType, false),
      StructField("categorical", StringType),
      StructField("datetime_with_NaT", TimestampType),
      StructField("url", StringType),
      StructField("ip_address", StringType)))
    val d = ts("2020-09-01 00:00:00")
    val rows = Seq(
      Row(0L, "Mr. John Doe", "john.smith@example.com", "5555555555",
        null, d, null, 0.0, null, -1L, null, true, "a", d,
        "https://github.com/alteryx/woodwork", "172.16.254.1"),
      Row(1L, "Doe, Mrs. Jane", null, "555-555-5555",
        33L, d, java.lang.Boolean.FALSE, 1.0, -123.45, 4L, -36L, false, "b", d,
        "https://twitter.com/AlteryxOSS", "2001:0db8:0000:0000:0000:ff00:0042:8329"),
      Row(2L, "James Brown", "team@featuretools.com", "1-(555)-555-5555",
        33L, d, java.lang.Boolean.TRUE, 0.0001, 0.0001, 9L, 49L, false, "c", d,
        null, "2001:db8::ff00:42:8329"),
      Row(3L, "Ms. Paige Turner", "junk@example.com", "555-555-5555",
        57L, d, java.lang.Boolean.TRUE, -5.4321, 1.0, 25L, 64L, true, "a", null,
        "http://google.com", null))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
  }

  test("sample_df inference matches the reference's pinned expectations") {
    val inferred = TypeInference.inferTypes(sampleDf).map {
      case (k, v) => k -> v.name
    }
    val expected = Map(
      "id" -> "Integer",
      "full_name" -> "Unknown",
      "email" -> "EmailAddress",
      "phone_number" -> "PhoneNumber",
      "age" -> "IntegerNullable",
      "signup_date" -> "Datetime",
      "is_registered" -> "BooleanNullable",
      "double" -> "Double",
      "double_with_nan" -> "Double",
      "integer" -> "Integer",
      "nullable_integer" -> "IntegerNullable",
      "boolean" -> "Boolean",
      // divergence from the category-dtype-driven pandas answer (see scaladoc)
      "categorical" -> "Unknown",
      "datetime_with_NaT" -> "Datetime",
      "url" -> "URL",
      "ip_address" -> "IPAddress")
    expected.foreach { case (colName, want) =>
      assert(inferred(colName) == want, s"column $colName")
    }
  }

  test("sample_df init applies corrected types and keeps all rows") {
    val f = frame.WoodworkFrame.init(sampleDf,
      index = Some("id"),
      logicalTypes = Map(
        "full_name" -> types.LogicalType.PersonFullName,
        "categorical" -> types.LogicalType.Categorical))
    assert(f.logicalTypes("full_name") == "PersonFullName")
    assert(f.logicalTypes("categorical") == "Categorical")
    assert(f.df.count() == 4)
    f.validateIndex()
    assert(f.semanticTags("categorical").contains("category"))
  }
}
