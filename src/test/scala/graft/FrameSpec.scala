package graft

import org.apache.spark.sql.functions._

import graft.frame.WoodworkFrame
import graft.schema.SchemaMetadata
import graft.types.{LogicalType => LT}

/** WoodworkFrame API behavior
  * (reference: woodwork/tests/accessor/test_table_accessor.py).
  */
class FrameSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = WoodworkFrame.init(
    Seq((1L, "a@b.com", "red", 10.5), (2L, "c@d.org", "blue", 20.0),
        (3L, "e@f.net", "red", 30.25)).toDF("id", "email", "color", "amount"),
    index = Some("id"),
    logicalTypes = Map("color" -> LT.Categorical))

  test("init: explicit types win, the rest infer; tags include standard + index") {
    val f = fixture
    assert(f.logicalTypes("color") == "Categorical")
    assert(f.logicalTypes("email") == "EmailAddress")
    assert(f.logicalTypes("id") == "Integer")
    assert(f.logicalTypes("amount") == "Double")
    assert(f.semanticTags("id").contains("index"))
    assert(f.semanticTags("amount").contains("numeric"))
    assert(f.index.contains("id"))
  }

  test("init: ignore_columns reuses existing schema types; already_sorted skips the sort") {
    val f = fixture
    // re-init with ignore: the ignored column keeps its schema type without
    // re-inference; ignoring without an existing schema (or while forcing)
    // raises like the reference
    val again = WoodworkFrame.init(f.df, ignoreColumns = Set("email"))
    assert(again.logicalTypes("email") == "EmailAddress")
    intercept[IllegalArgumentException] {
      WoodworkFrame.init(f.df, ignoreColumns = Set("email"),
        logicalTypes = Map("email" -> LT.NaturalLanguage))
    }
    intercept[IllegalArgumentException] {
      WoodworkFrame.init(Seq((1L, "x")).toDF("id", "v"),
        ignoreColumns = Set("v"))
    }
    // already_sorted: sortedByTime becomes the identity plan
    val ts = Seq((2L, "2024-01-02"), (1L, "2024-01-01"))
      .toDF("id", "t")
    val sorted = WoodworkFrame.init(ts, index = Some("id"),
      timeIndex = Some("t"), alreadySorted = true)
    assert(sorted.sortedByTime.queryExecution.analyzed ==
      sorted.df.queryExecution.analyzed)
    val unsorted = WoodworkFrame.init(ts, index = Some("id"), timeIndex = Some("t"))
    assert(unsorted.sortedByTime.collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
  }

  test("select by tag / type; drop; pop; rename") {
    val f = fixture
    assert(f.select(include = Seq("numeric")).columnNames == Seq("id", "amount"))
    assert(f.select(include = Seq("EmailAddress")).columnNames == Seq("email"))
    assert(f.select(exclude = Seq("category")).columnNames == Seq("id", "email", "amount"))
    assert(f.drop(Seq("email")).columnNames == Seq("id", "color", "amount"))
    val (rest, (colDf, cs)) = f.pop("color")
    assert(rest.columnNames == Seq("id", "email", "amount"))
    assert(cs.logicalType == LT.Categorical && colDf.columns.toSeq == Seq("color"))
    val renamed = f.rename(Map("amount" -> "value"))
    assert(renamed.columnNames == Seq("id", "email", "color", "value"))
    assert(renamed.logicalTypes("value") == "Double")
  }

  test("setTypes re-coerces; tag algebra add/remove/reset") {
    val f = fixture.setTypes(Map("amount" -> LT.IntegerNullable))
    assert(f.logicalTypes("amount") == "IntegerNullable")
    // 10.5 is non-integral → coerced to null
    val vals = f.df.select("amount").collect().map(r => if (r.isNullAt(0)) null else r.get(0))
    assert(vals.contains(null) && vals.contains(20L))

    val tagged = fixture.addSemanticTags(Map("amount" -> Set("currency")))
    assert(tagged.semanticTags("amount").contains("currency"))
    val removed = tagged.removeSemanticTags(Map("amount" -> Set("currency")))
    assert(!removed.semanticTags("amount").contains("currency"))
    val reset = tagged.resetSemanticTags(retainIndexTags = true)
    assert(reset.semanticTags("id").contains("index"))
    assert(!reset.semanticTags("amount").contains("currency"))
  }

  test("typing metadata survives plain DataFrame ops and parquet round-trip") {
    val f = fixture
    val transformed = f.df.where(col("amount") > 15).select("id", "color")
    val recovered = SchemaMetadata.recover(transformed)
    assert(recovered.get.columns("color").logicalType == LT.Categorical)

    val path = java.nio.file.Files.createTempDirectory("ww").toString + "/t.parquet"
    f.df.write.mode("overwrite").parquet(path)
    val back = WoodworkFrame.fromMetadata(spark.read.parquet(path))
    assert(back.get.logicalTypes("email") == "EmailAddress")
    assert(back.get.semanticTags("id").contains("index"))
  }

  test("validateIndex catches duplicates and nulls") {
    val dup = WoodworkFrame.init(
      Seq((1L, "x"), (1L, "y")).toDF("id", "v"), index = Some("id"))
    intercept[IllegalArgumentException](dup.validateIndex())
    fixture.validateIndex() // unique → fine
  }

  test("concatColumns outer-joins on the shared index and merges typing") {
    val base = Seq((1L, "a"), (2L, "b")).toDF("id", "x")
    val other = Seq((2L, 5.0), (3L, 6.0)).toDF("id", "y")
    val f1 = WoodworkFrame.init(base, index = Some("id"))
    val f2 = WoodworkFrame.init(other, index = Some("id"))
    val cat = WoodworkFrame.concatColumns(Seq(f1, f2))
    assert(cat.columnNames == Seq("id", "x", "y"))
    assert(cat.df.count() == 3) // outer join
    intercept[IllegalArgumentException] {
      WoodworkFrame.concatColumns(Seq(f1, f1)) // duplicate column names
    }
  }

  test("concatColumns promotes non-nullable types on null-gaining columns") {
    val base = Seq((1L, 10L), (2L, 20L)).toDF("id", "n")
    val other = Seq((2L, true), (3L, false)).toDF("id", "flag")
    val f1 = WoodworkFrame.init(base, index = Some("id"))
    val f2 = WoodworkFrame.init(other, index = Some("id"))
    assert(f1.logicalTypes("n") == "Integer")
    assert(f2.logicalTypes("flag") == "Boolean")
    val cat = WoodworkFrame.concatColumns(Seq(f1, f2))
    // outer join introduces nulls → nullable parents (reference:
    // utils.py:513-524); the index itself is never promoted
    assert(cat.logicalTypes("n") == "IntegerNullable")
    assert(cat.logicalTypes("flag") == "BooleanNullable")
    assert(cat.logicalTypes("id") == "Integer")
  }

  test("withColumn infers and coerces; cannot replace index") {
    val f = fixture.withColumn("flag", when(col("amount") > 15, "yes").otherwise("no"))
    assert(f.logicalTypes("flag") == "Boolean")
    assert(f.df.schema("flag").dataType.typeName == "boolean")
    intercept[IllegalArgumentException](fixture.withColumn("id", lit(1)))
  }

  test("validateLogicalTypes counts invalid rows per column") {
    val f = WoodworkFrame.init(Seq(("a@b.com"), ("nope")).toDF("email"),
      logicalTypes = Map("email" -> LT.EmailAddress), coerce = false)
    assert(f.validateLogicalTypes()("email") == 1L)
  }

  test("setDescription/setOrigin round-trip through metadata; standard tags obey useStandardTags") {
    val f = fixture.setDescription("amount", Some("order total"))
      .setOrigin("amount", Some("base"))
    assert(f.schema("amount").description.contains("order total"))
    assert(f.schema("amount").origin.contains("base"))
    val recovered = SchemaMetadata.recover(f.df).get
    assert(recovered("amount").description.contains("order total"))
    assert(recovered("amount").origin.contains("base"))

    val noStd = WoodworkFrame.init(Seq(1.5, 2.5).toDF("v"), useStandardTags = false)
    assert(!noStd.schema("v").allTags.contains("numeric"))
    assert(fixture.schema("amount").allTags.contains("numeric"))
  }

  test("invalidRows returns offending rows with their invalid columns") {
    val f = WoodworkFrame.init(
      Seq(("a@b.com", 30L), ("nope", -1L)).toDF("email", "age"),
      logicalTypes = Map("email" -> LT.EmailAddress, "age" -> LT.Age),
      coerce = false)
    val bad = f.invalidRows().collect()
    assert(bad.length == 1)
    assert(bad.head.getAs[Seq[String]]("invalid_columns").toSet == Set("email", "age"))
  }

  test("loc index lookup, typed unionAll, validMiColumns, withOptions") {
    val f = fixture
    assert(f.loc(2L).df.count() == 1)
    assert(f.loc(1L).unionAll(f.loc(3L)).df.count() == 2)
    intercept[IllegalArgumentException](f.unionAll(f.drop(Seq("email"))))
    assert(f.validMiColumns.toSet == Set("color", "amount"))

    val opts = graft.config.WwConfig.options.copy(categoricalThreshold = 0.9)
    graft.config.WwConfig.withOptions(opts) {
      assert(graft.config.WwConfig.options.categoricalThreshold == 0.9)
    }
    assert(graft.config.WwConfig.options.categoricalThreshold == 0.2)
  }

  test("iloc positional slice over the canonical (index) order") {
    val df = Seq((30L, "c"), (10L, "a"), (20L, "b"), (40L, "d"))
      .toDF("id", "v").repartition(3)
    val f = WoodworkFrame.init(df, index = Some("id"))
    // positions follow index order, not partition/input order
    assert(f.iloc(0).df.select("v").head.getString(0) == "a")
    assert(f.iloc(1, 3).df.orderBy("id").select("v")
      .collect().map(_.getString(0)).toSeq == Seq("b", "c"))
    assert(f.iloc(2, 100).df.count() == 2)   // until clamps past the end
    assert(f.iloc(4, 9).df.count() == 0)
    assert(f.iloc(1, 3).schema == f.schema)  // typing preserved
    intercept[IllegalArgumentException](f.iloc(-1, 2))
    // no ordering available and not declared sorted -> refuse
    val bare = WoodworkFrame.init(Seq(1, 2).toDF("x"))
    intercept[IllegalArgumentException](bare.iloc(0))
    // declared pre-sorted: partition order is trusted
    val sorted = WoodworkFrame.init(Seq(5, 6, 7).toDF("x").coalesce(1),
      alreadySorted = true)
    assert(sorted.iloc(1).df.head.getLong(0) == 6L)
  }

  test("initColumn infers/coerces one column; schema validity check") {
    val df = Seq("1", "2", "3").toDF("n")
    val (out, cs) = WoodworkFrame.initColumn(df, "n")
    assert(cs.logicalType.name == "Integer")
    assert(out.schema("n").dataType.typeName == "long")

    val f = fixture
    assert(WoodworkFrame.isSchemaValid(f.df, f.schema))
    assert(WoodworkFrame.invalidSchemaMessage(f.df.drop("email"), f.schema).isDefined)
    val retyped = f.df.withColumn("amount", col("amount").cast("string"))
    assert(WoodworkFrame.invalidSchemaMessage(retyped, f.schema)
      .exists(_.contains("dtype mismatch")))
  }

  test("multi-format datetime strings coerce under the same parser that infers them") {
    val df = Seq("01/15/2024", "02/20/2024", "12/31/2023").toDF("d")
    val f = WoodworkFrame.init(df)
    assert(f.logicalTypes("d") == "Datetime")
    assert(f.df.schema("d").dataType.typeName == "timestamp")
    assert(f.df.where(col("d").isNull).count() == 0)
  }

  test("two-digit years pivot at 69 (pandas convention)") {
    val df = Seq("01/15/69", "01/15/25").toDF("d")
    val f = WoodworkFrame.init(df, logicalTypes =
      Map("d" -> graft.types.LogicalType.Datetime()))
    val years = f.df.select(year(col("d"))).collect().map(_.getInt(0)).toSeq
    assert(years == Seq(1969, 2025))
  }

  test("time index must be datetime or numeric") {
    val df = Seq(("x", 1L)).toDF("name", "t")
    intercept[IllegalArgumentException] {
      WoodworkFrame.init(df, timeIndex = Some("name"))
    }
    assert(WoodworkFrame.init(df, timeIndex = Some("t")).timeIndex.contains("t"))
  }
}
