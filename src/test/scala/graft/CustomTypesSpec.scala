package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.frame.WoodworkFrame
import graft.io.ReadWrite
import graft.types.{ColStats, LogicalType, TypeSystem}

/** Custom logical-type registration — the extensibility contract the
  * reference exercises in tests/type_system/test_custom_types.py: user
  * subclasses of LogicalType register via addType, participate in inference,
  * coercion, tags, and survive disk serialization.
  */
object CustomTypesSpec {
  /** Ported from test_register_custom_logical_type's CustomLogicalType. */
  case object CustomLogicalType extends LogicalType {
    def sparkType: DataType = StringType
  }

  /** Ported from test_custom_type_with_accessor's AgesAbove20. */
  case object AgesAbove20 extends LogicalType {
    def sparkType: DataType = DoubleType
    override def standardTags: Set[String] = Set("age", "numeric")
    override def transform(c: Column, from: DataType): Column =
      c.cast(DoubleType)
  }

  /** A parameterized custom type exercising the withParams round-trip. */
  final case class Bucketed(buckets: Int = 10) extends LogicalType {
    override def name: String = "Bucketed"
    def sparkType: DataType = LongType
    override def params: Map[String, String] = Map("buckets" -> buckets.toString)
    override def withParams(params: Map[String, String]): LogicalType =
      Bucketed(params.get("buckets").map(_.toInt).getOrElse(10))
  }
}

class CustomTypesSpec extends SparkSpec {
  import CustomTypesSpec._
  import spark.implicits._

  test("register custom type: registry, relationship, inference dispatch " +
    "(reference test_custom_types.py::test_register_custom_logical_type)") {
    val ts = TypeSystem.default()
    val customFn: ColStats => Boolean = _ => true
    ts.addType(CustomLogicalType, Some(customFn), parent = Some("Categorical"))
    assert(ts.registeredTypes.contains("CustomLogicalType"))
    assert(ts.relationships.contains("Categorical" -> "CustomLogicalType"))
    // a low-cardinality string column matches Categorical, then descends to
    // the always-true custom child, which wins on depth
    val df = ("b" +: Seq.fill(11)("a")).toDF("v")
    val inferred = graft.infer.TypeInference.inferTypes(df, Seq("v"), ts)
    assert(inferred("v") == CustomLogicalType)
  }

  test("custom type through the frame: logical type, tags, physical dtype " +
    "(reference test_custom_types.py::test_custom_type_with_accessor)") {
    val ts = TypeSystem.default()
    // stats-predicate port of ages_func: integral, no value above-20 check is
    // expressible on ColStats, so the predicate matches integral columns and
    // relies on DAG depth below IntegerNullable to win
    ts.addType(AgesAbove20,
      Some((s: ColStats) => LogicalType.isIntegralType(s.dataType)),
      parent = Some("IntegerNullable"))
    // the reference's sample_df age column is nullable Int64 with a missing
    // value — Integer (non-nullable) therefore doesn't match and the custom
    // child wins on DAG depth
    val df = Seq(Some(25L), None, Some(33L), Some(40L)).toDF("age")
    val f = WoodworkFrame.init(df, typeSystem = ts)
    assert(f.schema("age").logicalType == AgesAbove20)
    assert(f.semanticTags("age") == Set("age", "numeric"))
    assert(f.df.schema("age").dataType == DoubleType)
  }

  test("override a default inference function " +
    "(reference test_custom_types.py::test_accessor_override_default_function)") {
    val ts = TypeSystem.default()
    ts.updateInferenceFunction("Double",
      Some((s: ColStats) => s.dataType == BooleanType))
    ts.updateInferenceFunction("BooleanNullable", None)
    val df = Seq(true, false, true).toDF("is_registered")
    val f = WoodworkFrame.init(df, typeSystem = ts)
    assert(f.logicalTypes("is_registered") == "Double")
    assert(f.df.schema("is_registered").dataType == DoubleType)
    // resetDefaults restores the stock behavior
    ts.resetDefaults()
    val f2 = WoodworkFrame.init(df, typeSystem = ts)
    assert(f2.logicalTypes("is_registered") == "Boolean")
  }

  test("custom type serialization: schema metadata and disk round-trip") {
    TypeSystem.global.addType(Bucketed(), None, parent = None)
    try {
      val df = Seq(1L, 2L, 3L).toDF("b")
      val f = WoodworkFrame.init(df,
        logicalTypes = Map("b" -> Bucketed(32)))
      // metadata-in-StructField round-trip (pandas-proxy survival path)
      val recovered = WoodworkFrame.init(f.df)
      assert(recovered.schema("b").logicalType == Bucketed(32))
      // full disk round-trip through the typing sidecar
      val dir = java.nio.file.Files.createTempDirectory("ww_custom").toString
      ReadWrite.toDisk(f, dir)
      val back = ReadWrite.fromDisk(spark, dir)
      assert(back.schema("b").logicalType == Bucketed(32))
      // fromString resolves the registered custom type by its snake name
      assert(LogicalType.fromString("bucketed", Map("buckets" -> "7")) ==
        Bucketed(7))
    } finally TypeSystem.global.removeType("Bucketed")
  }
}
