package graft

import org.apache.spark.sql.DataFrame

import graft.infer.TypeInference
import graft.types.{LogicalType => LT}

/** Inference parity with the reference's per-type fixtures
  * (reference: woodwork/tests/type_system/test_ltype_inference.py).
  */
class TypeInferenceSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def strDf(values: Seq[String]): DataFrame = {
    import spark.implicits._
    values.toDF("c")
  }
  private def infer(df: DataFrame): String =
    TypeInference.inferTypes(df, Seq("c")).apply("c").name

  test("integers infer Integer (no nulls)") {
    import spark.implicits._
    assert(infer(Seq(1L, 2L, 3L, 4L, 5L).toDF("c")) == "Integer")
  }

  test("integers with nulls infer IntegerNullable") {
    import spark.implicits._
    assert(infer(Seq[Option[Long]](Some(1), None, Some(3)).toDF("c")) == "IntegerNullable")
  }

  test("floats infer Double") {
    import spark.implicits._
    assert(infer(Seq(1.5, 2.7, 3.1).toDF("c")) == "Double")
  }

  test("integral floats with no nulls stay Double (reference rule)") {
    import spark.implicits._
    assert(infer(Seq(1.0, 2.0, 3.0).toDF("c")) == "Double")
  }

  test("integral floats WITH nulls infer IntegerNullable") {
    import spark.implicits._
    assert(infer(Seq[Option[Double]](Some(1.0), None, Some(3.0)).toDF("c")) == "IntegerNullable")
  }

  test("integer strings infer Integer") {
    assert(infer(strDf(Seq("1", "2", "42"))) == "Integer")
  }

  test("float strings infer Double") {
    assert(infer(strDf(Seq("1.5", "2.25", "3"))) == "Double")
  }

  test("yes/no strings infer Boolean; with nulls BooleanNullable") {
    assert(infer(strDf(Seq("yes", "no", "yes"))) == "Boolean")
    assert(infer(strDf(Seq("yes", null, "no"))) == "BooleanNullable")
  }

  test("single boolean token does NOT infer Boolean (exact-set rule)") {
    assert(infer(strDf(Seq("yes", "yes", "yes"))) != "Boolean")
  }

  test("low-cardinality strings infer Categorical") {
    assert(infer(strDf(Seq.fill(50)("a") ++ Seq.fill(50)("b"))) == "Categorical")
  }

  test("emails infer EmailAddress") {
    assert(infer(strDf(Seq("a@b.com", "x.y@z.org", "q+w@e.net"))) == "EmailAddress")
  }

  test("urls infer URL") {
    assert(infer(strDf(Seq("http://a.com/x", "https://b.org/y?z=1"))) == "URL")
  }

  test("ipv4 addresses infer IPAddress") {
    assert(infer(strDf(Seq("1.2.3.4", "255.255.255.0", "10.0.0.1"))) == "IPAddress")
  }

  test("zip codes infer PostalCode") {
    assert(infer(strDf(Seq("12345", "90210-1234", "60601"))) == "PostalCode")
  }

  test("datetime strings infer Datetime") {
    assert(infer(strDf(Seq("2024-01-01", "2024-02-15", "2023-12-31"))) == "Datetime")
  }

  test("prose infers NaturalLanguage via deferred pass") {
    val prose = Seq(
      "the quick brown fox jumps over the lazy dog and runs away",
      "a man and a woman walked to the store with their friends",
      "this is the time of the year when all the people gather",
      "the sound of the water was heard over the hill and far away",
      "every day the children go to school and learn new things about the world",
      "the old house at the end of the street has been there for many years")
    assert(infer(strDf(prose ++ prose ++ prose)) == "NaturalLanguage")
  }

  test("high-cardinality opaque strings infer Unknown") {
    val vals = (1 to 100).map(i => s"zqxv$i-kjhw$i")
    assert(infer(strDf(vals)) == "Unknown")
  }

  test("all-null column infers Unknown") {
    assert(infer(strDf(Seq(null, null, null))) == "Unknown")
  }

  test("null sentinels are nulls for inference") {
    assert(infer(strDf(Seq("N/A", "nan", "<NA>"))) == "Unknown")
  }

  test("custom type registration + removal (registry DAG)") {
    val ts = graft.types.TypeSystem.default()
    assert(ts.registeredTypes.contains("PostalCode"))
    ts.removeType("PostalCode")
    assert(!ts.registeredTypes.contains("PostalCode"))
    ts.resetDefaults()
    assert(ts.registeredTypes.contains("PostalCode"))
    // child re-parenting on removal
    ts.removeType("IntegerNullable")
    assert(!ts.relationships.exists(_._2 == "IntegerNullable"))
    ts.resetDefaults()
  }
}
