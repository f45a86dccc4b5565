package graft.types

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry introspection tables (reference: `ww.list_logical_types` /
  * `ww.list_semantic_tags`, woodwork/type_sys/utils.py:68-138). Both tables
  * read the LIVE type system, so custom types registered via
  * `TypeSystem.addType` appear exactly like the reference's registry dump.
  */
object TypeTables {

  /** Built-in types plus everything registered in `ts` (custom types
    * included; de-registered built-ins still listed with
    * is_registered=false, matching the reference).
    */
  private def knownTypes(ts: TypeSystem): Seq[LogicalType] =
    (LogicalType.all.map(_.name) ++ ts.registeredTypes.toSeq.sorted)
      .distinct.map(ts.instanceOf)

  def listLogicalTypes(spark: SparkSession,
                       ts: TypeSystem = TypeSystem.global): DataFrame = {
    import spark.implicits._
    knownTypes(ts).map { lt =>
      (lt.name, lt.typeString, lt.sparkType.simpleString,
        lt.standardTags.toSeq.sorted.mkString(";"),
        lt.name == ts.defaultType.name,
        ts.registeredTypes.contains(lt.name))
    }.toDF("name", "type_string", "physical_type", "standard_tags",
      "is_default_type", "is_registered")
      .orderBy("name")
  }

  def listSemanticTags(spark: SparkSession,
                       ts: TypeSystem = TypeSystem.global): DataFrame = {
    import spark.implicits._
    val standard = knownTypes(ts)
      .flatMap(lt => lt.standardTags.map(_ -> lt.name))
      .groupBy(_._1)
      .map { case (tag, pairs) =>
        (tag, "standard", pairs.map(_._2).sorted.mkString(";")) }
      .toSeq
    val system = Seq(
      ("index", "index", "Any unique, non-null column"),
      ("time_index", "time_index", "Any Datetime or numeric column"))
    (standard ++ system)
      .toDF("name", "is_standard_tag", "valid_logical_types")
      .orderBy("name")
  }
}
