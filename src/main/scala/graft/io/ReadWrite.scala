package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.frame.WoodworkFrame
import graft.schema.{SchemaMetadata, WwColumnSchema, WwTableSchema}
import graft.types.LogicalType

/** Typed I/O: read a file into an initialized frame, write a frame with its
  * typing info, and round-trip through a woodwork-compatible typing-info JSON
  * (schema version 12.0.0) so tables serialized by the reference can be
  * ingested (reference: woodwork/serializers/, deserializers/,
  * utils.py:95-195 `read_file`).
  *
  * Parquet needs no sidecar — ww typing rides in StructField.metadata, which
  * Spark persists in the parquet footer natively. The JSON sidecar is for
  * CSV/JSON/ORC and for reference compatibility.
  */
object ReadWrite {

  val SchemaVersion: String = SchemaMetadata.SchemaVersion

  private val extToFormat = Map(
    "csv" -> "csv", "parquet" -> "parquet", "orc" -> "orc", "json" -> "json",
    "feather" -> "feather", "arrow" -> "feather")

  /** reference: utils.py:150-163 content-type guessing. `unknown` decides
    * the fallback for unrecognized extensions (plain default here; the
    * readFile path passes the magic-byte sniff).
    */
  def formatFor(path: String,
                unknown: => String = "parquet"): String = {
    val ext = path.reverse.takeWhile(_ != '.').reverse.toLowerCase
    extToFormat.getOrElse(ext, unknown)
  }

  /** Content sniffing from the leading magic bytes of the first data file —
    * used when the extension is unrecognized (the reference guesses purely by
    * extension, utils.py:150-163; sniffing is strictly safer for a `.dat`
    * that is really parquet). Goes through the Hadoop FileSystem of the
    * session so it works on any configured store, reads 8 bytes, never the
    * file. Recognizes parquet (PAR1), Arrow IPC (ARROW1), ORC, JSON text,
    * and falls back to csv for other text (incl. gzip/zstd, which Spark's
    * csv reader decompresses by extension-codec).
    */
  def sniffFormat(spark: SparkSession, path: String): Option[String] = {
    import org.apache.hadoop.fs.{Path => HPath}
    val p = new HPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def firstFile(h: HPath): Option[HPath] = {
      val st = fs.getFileStatus(h)
      if (st.isFile) { if (st.getLen > 0) Some(h) else None }
      else fs.listStatus(h).sortBy(_.getPath.getName)
        .filterNot(s => s.getPath.getName.startsWith("_") ||
          s.getPath.getName.startsWith("."))
        .iterator.map(s => firstFile(s.getPath))
        .collectFirst { case Some(f) => f }
    }
    try firstFile(p).map { f =>
      val in = fs.open(f)
      val head = new Array[Byte](8)
      val n = try {
        var off = 0
        var r = 0
        while (off < 8 && { r = in.read(head, off, 8 - off); r > 0 }) off += r
        off
      } finally in.close()
      val s = new String(head, 0, n, StandardCharsets.US_ASCII)
      if (s.startsWith("PAR1")) "parquet"
      else if (s.startsWith("ARROW1")) "feather"
      else if (s.startsWith("ORC")) "orc"
      else {
        val firstPrintable = s.dropWhile(c => c == ' ' || c == '\t' ||
          c == '\r' || c == '\n')
        if (firstPrintable.startsWith("{") || firstPrintable.startsWith("["))
          "json"
        else "csv"
      }
    } catch { case _: java.io.IOException => None }
  }

  /** Read + init in one step (reference: `ww.read_file`). CSV reads with
    * header + schema inference disabled so logical-type inference owns
    * typing; parquet/orc keep their physical schema.
    */
  def readFile(spark: SparkSession, path: String,
               format: Option[String] = None,
               name: Option[String] = None,
               index: Option[String] = None,
               timeIndex: Option[String] = None,
               logicalTypes: Map[String, LogicalType] = Map.empty,
               semanticTags: Map[String, Set[String]] = Map.empty,
               replaceNan: Boolean = false): WoodworkFrame = {
    // extension first (reference parity), magic-byte sniff when it lies
    val fmt = format.getOrElse(
      formatFor(path, sniffFormat(spark, path).getOrElse("parquet")))
    val reader = spark.read
    val raw = fmt match {
      case "csv" => reader.option("header", "true").csv(path)
      case "feather" | "arrow" => ArrowIo.read(spark, path)
      case other => reader.format(other).load(path)
    }
    // replace_nan (reference: utils.py:95-195): string null-sentinels become
    // physical nulls at read time, one projection over the string columns
    val df =
      if (!replaceNan) raw
      else raw.select(raw.schema.fields.map { f =>
        LogicalType.replaceNans(org.apache.spark.sql.functions.col(f.name),
          f.dataType).as(f.name)
      }.toSeq: _*)
    WoodworkFrame.init(df, name = name, index = index, timeIndex = timeIndex,
      logicalTypes = logicalTypes, semanticTags = semanticTags)
  }

  /** Write data + typing info (reference: `df.ww.to_disk`,
    * table_accessor.py:654-697). Parquet embeds typing in the footer; every
    * format also gets the JSON sidecar for reference compatibility.
    */
  /** `partitionCols` lays the data out hive-style (`col=value/` dirs) so
    * later reads prune partitions at file-listing time — at 100 TB the
    * first and cheapest pushdown lever (a `source=`/`date=` filter skips
    * whole directory trees before any row is read). Partition columns move
    * to the tail of the physical layout and come back as
    * partition-inferred types; [[fromDisk]]'s sidecar re-coercion restores
    * BOTH the declared column order and the logical types, so the
    * round-trip is layout-invariant. Not supported for csv headers-only
    * and arrow (single-dir formats).
    */
  def toDisk(frame: WoodworkFrame, path: String, format: String = "parquet",
             mode: String = "overwrite",
             partitionCols: Seq[String] = Nil): Unit = {
    partitionCols.foreach(c => require(frame.df.columns.contains(c),
      s"partition column '$c' not in frame"))
    format match {
      case "csv" =>
        require(partitionCols.isEmpty, "partitionCols unsupported for csv")
        frame.df.write.mode(mode).option("header", "true").csv(s"$path/data")
      case "feather" | "arrow" =>
        require(partitionCols.isEmpty, "partitionCols unsupported for arrow")
        ArrowIo.write(frame.df, s"$path/data")
      case other =>
        val w = frame.df.write.mode(mode).format(other)
        (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
          .save(s"$path/data")
    }
    // sidecar through the session's Hadoop FS, NOT java.nio: a remote
    // path (s3a://, hdfs://) must carry data and typing info together
    val hPath = new org.apache.hadoop.fs.Path(s"$path/woodwork_typing_info.json")
    val fs = hPath.getFileSystem(
      frame.df.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(hPath, true)
    try out.write(typingInfoJson(frame).getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Read back a frame written by [[toDisk]]: typing info from the JSON
    * sidecar, re-init without inference (reference: `read_woodwork_table`,
    * deserialize.py:4-70).
    */
  def fromDisk(spark: SparkSession, path: String,
               format: String = "parquet"): WoodworkFrame = {
    val df = format match {
      case "csv" => spark.read.option("header", "true").csv(s"$path/data")
      case "feather" | "arrow" => ArrowIo.read(spark, s"$path/data")
      case other => spark.read.format(other).load(s"$path/data")
    }
    val hPath = new org.apache.hadoop.fs.Path(s"$path/woodwork_typing_info.json")
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(hPath)
    val json =
      try new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        StandardCharsets.UTF_8)
      finally in.close()
    val schema = typingInfoFromJson(json)
    val coerced = df.select(schema.columns.map { case (n, cs) =>
      cs.logicalType.transform(org.apache.spark.sql.functions.col(n), df.schema(n).dataType)
        .as(n, SchemaMetadata.columnMetadata(cs))
    }.toSeq: _*)
    WoodworkFrame(coerced, schema)
  }

  // ---------------------------------------------------------------- JSON
  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Typing info as woodwork-compatible JSON
    * (reference: serializers/serializer_base.py:137-185
    * `typing_info_to_dict`).
    */
  def typingInfoJson(frame: WoodworkFrame): String = {
    val cols = frame.schema.columns.zipWithIndex.map { case ((n, cs), i) =>
      val params = cs.logicalType.params.map { case (k, v) =>
        s""""${esc(k)}": "${esc(v)}"""" }.mkString(", ")
      s"""{"name": "${esc(n)}", "ordinal": $i,
         |"logical_type": {"parameters": {$params}, "type": "${esc(cs.logicalType.name)}"},
         |"physical_type": {"type": "${esc(frame.df.schema(n).dataType.simpleString)}"},
         |"semantic_tags": [${cs.semanticTags.toSeq.sorted.map(t => s""""${esc(t)}"""").mkString(", ")}],
         |"use_standard_tags": ${cs.useStandardTags},
         |"description": ${cs.description.map(d => s""""${esc(d)}"""").getOrElse("null")},
         |"origin": ${cs.origin.map(o => s""""${esc(o)}"""").getOrElse("null")},
         |"metadata": {}}""".stripMargin.replace("\n", " ")
    }.mkString(",\n  ")
    val idx = frame.index.map(i => s""""${esc(i)}"""").getOrElse("null")
    val tidx = frame.timeIndex.map(i => s""""${esc(i)}"""").getOrElse("null")
    val name = frame.schema.name.map(n => s""""${esc(n)}"""").getOrElse("null")
    s"""{
       |  "schema_version": "$SchemaVersion",
       |  "name": $name,
       |  "index": $idx,
       |  "time_index": $tidx,
       |  "column_typing_info": [
       |  $cols
       |  ],
       |  "loading_info": {"table_type": "spark"},
       |  "table_metadata": {}
       |}""".stripMargin
  }

  /** Parse a typing-info JSON (ours or the reference's) back to a schema.
    * Minimal purpose-built parser over the fixed document shape — no JSON
    * library dependency.
    */
  def typingInfoFromJson(json: String): WwTableSchema = {
    val verRe = """"schema_version"\s*:\s*"([^"]+)"""".r
    verRe.findFirstMatchIn(json).foreach { m =>
      val major = m.group(1).takeWhile(_ != '.')
      if (major != SchemaVersion.takeWhile(_ != '.'))
        System.err.println(
          s"[graft.io] typing info schema version ${m.group(1)} differs from $SchemaVersion")
    }
    // top-level name lives BEFORE the column array — grab it from the
    // prefix so a column named "name" can't shadow it
    val arrStart0 = json.indexOf("\"column_typing_info\"")
    val tableName = """"name"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
      .findFirstMatchIn(if (arrStart0 > 0) json.substring(0, arrStart0) else json)
      .map(m => graft.schema.SchemaMetadata.unescape(m.group(1)))
    val index = """"index"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(json).map(_.group(1))
    val timeIndex = """"time_index"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(json).map(_.group(1))

    // split column_typing_info into balanced-brace objects, then extract each
    // field independently — field ORDER differs between our serializer and
    // the reference's python dict ordering, so no whole-object regex.
    val arrStart = json.indexOf("\"column_typing_info\"")
    require(arrStart >= 0, "typing info JSON missing column_typing_info")
    val objs = scala.collection.mutable.ListBuffer.empty[String]
    var i = json.indexOf('[', arrStart) + 1
    var depth = 0
    var objStart = -1
    var inStr = false
    var done = false
    while (i < json.length && !done) {
      val ch = json.charAt(i)
      if (inStr) { if (ch == '\\') i += 1 else if (ch == '"') inStr = false }
      else ch match {
        case '"' => inStr = true
        case '{' => if (depth == 0) objStart = i; depth += 1
        case '}' =>
          depth -= 1
          if (depth == 0) { objs += json.substring(objStart, i + 1) }
        case ']' => if (depth == 0) done = true
        case _ =>
      }
      i += 1
    }

    def strField(obj: String, key: String): Option[String] =
      (s""""$key"\\s*:\\s*"((?:[^"\\\\]|\\\\.)*)"""").r
        .findFirstMatchIn(obj)
        .map(m => graft.schema.SchemaMetadata.unescape(m.group(1)))

    // balanced-brace sub-object for a key (nested dicts break naive regexes)
    def subObject(obj: String, key: String): Option[String] = {
      val idx = obj.indexOf("\"" + key + "\"")
      if (idx < 0) return None
      val start = obj.indexOf('{', idx)
      if (start < 0) return None
      var d = 0; var j = start; var inS = false
      var res: Option[String] = None
      while (j < obj.length && res.isEmpty) {
        val ch = obj.charAt(j)
        if (inS) { if (ch == '\\') j += 1 else if (ch == '"') inS = false }
        else ch match {
          case '"' => inS = true
          case '{' => d += 1
          case '}' => d -= 1; if (d == 0) res = Some(obj.substring(start, j + 1))
          case _ =>
        }
        j += 1
      }
      res
    }
    val cols = objs.toSeq.map { obj =>
      val name = strField(obj, "name").getOrElse(
        throw new IllegalArgumentException(s"column object missing name: $obj"))
      val ordinal = """"ordinal"\s*:\s*(\d+)""".r
        .findFirstMatchIn(obj).map(_.group(1).toInt).getOrElse(0)
      val lt = subObject(obj, "logical_type").getOrElse("{}")
      val ltName = """"type"\s*:\s*"([^"]+)"""".r
        .findFirstMatchIn(lt).map(_.group(1)).getOrElse("Unknown")
      val params = subObject(lt, "parameters")
        .map(SchemaMetadata.parseJsonValueMap)
        .getOrElse(Map.empty[String, String])
      val colMeta = subObject(obj, "metadata")
        .map(SchemaMetadata.parseJsonValueMap)
        .getOrElse(Map.empty[String, String])
      val tags = """"semantic_tags"\s*:\s*\[(.*?)\]""".r
        .findFirstMatchIn(obj)
        .map(m => """"([^"]+)"""".r.findAllMatchIn(m.group(1)).map(_.group(1)).toSet)
        .getOrElse(Set.empty[String])
      val ust = """"use_standard_tags"\s*:\s*(true|false)""".r
        .findFirstMatchIn(obj).forall(_.group(1).toBoolean)
      val sysTags =
        (if (index.contains(name)) Set("index") else Set.empty[String]) ++
          (if (timeIndex.contains(name)) Set("time_index") else Set.empty[String])
      (ordinal, name, WwColumnSchema(
        logicalType = LogicalType.fromString(ltName, params),
        semanticTags = tags ++ sysTags,
        useStandardTags = ust,
        description = strField(obj, "description"),
        origin = strField(obj, "origin"),
        metadata = colMeta))
    }.sortBy(_._1)
    // table_metadata sits AFTER the column array — parse it from the
    // suffix so column metadata objects can't shadow it
    val tailStart = {
      val lastObjEnd = if (objs.isEmpty) arrStart else
        json.indexOf(']', json.indexOf(objs.last) + objs.last.length)
      math.max(lastObjEnd, arrStart)
    }
    val tableMeta = {
      val tail = json.substring(tailStart)
      val idx = tail.indexOf("\"table_metadata\"")
      if (idx < 0) Map.empty[String, String]
      else {
        val start = tail.indexOf('{', idx)
        val end = if (start >= 0) tail.indexOf('}', start) else -1
        if (start < 0 || end < 0) Map.empty[String, String]
        else SchemaMetadata.parseJsonValueMap(tail.substring(start, end + 1))
      }
    }
    WwTableSchema(ListMap(cols.map(c => c._2 -> c._3): _*), name = tableName,
      metadata = tableMeta)
  }
}
