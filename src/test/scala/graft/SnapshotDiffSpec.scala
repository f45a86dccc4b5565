package graft

import org.apache.spark.sql.functions._
import graft.ops.SnapshotDiff

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private val v1 = Seq[(Long, Option[String], Option[Int])](
    (1L, Some("a"), Some(10)),
    (2L, Some("b"), None),
    (3L, Some("c"), Some(30)),
    (4L, None, Some(40))
  ).toDF("id", "tag", "v")

  private val v2 = Seq[(Long, Option[String], Option[Int])](
    (1L, Some("a"), Some(10)),      // unchanged
    (2L, Some("B"), None),          // changed: tag (null v unchanged, null-safe)
    (4L, None, None),               // changed: v (null -> null stays equal only when both null)
    (5L, Some("e"), Some(50))       // added; 3 removed
  ).toDF("id", "tag", "v")

  test("diff classifies added/removed/changed/unchanged with null-safe compares") {
    val out = SnapshotDiff.diff(v1, v2, Seq("id"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getInt(3)))).toMap
    assert(out(1L) == (("unchanged", "", 0)))
    assert(out(2L) == (("changed", "tag", 1)))
    assert(out(3L) == (("removed", "", 0)))
    assert(out(4L) == (("changed", "v", 1)))
    assert(out(5L) == (("added", "", 0)))
  }

  test("multi-column change lists columns in compare order") {
    val w2 = Seq((1L, Some("z"), Option(99))).toDF("id", "tag", "v")
    val out = SnapshotDiff.diff(v1.where(col("id") === 1), w2,
      Seq("id"), Seq("tag", "v")).collect()
    assert(out.length == 1)
    assert(out.head.getString(1) == "changed")
    assert(out.head.getString(2) == "tag,v")
    assert(out.head.getInt(3) == 2)
  }

  test("summary counts statuses and changed cells in one aggregation") {
    val s = SnapshotDiff.summary(SnapshotDiff.diff(v1, v2, Seq("id"))).head()
    assert((s.getLong(0), s.getLong(1), s.getLong(2), s.getLong(3), s.getLong(4))
      == ((1L, 1L, 2L, 1L, 2L)))
  }

  test("summary of an empty diff reports zeros, not nulls") {
    val empty = v1.where(lit(false))
    val s = SnapshotDiff.summary(SnapshotDiff.diff(empty, empty, Seq("id"))).head()
    assert((0 to 4).map(s.getLong) == Seq(0L, 0L, 0L, 0L, 0L))
  }

  test("keysOnly = membership diffing; accidental empty compare set still refused") {
    val out = SnapshotDiff.diff(v1.select("id"), v2.select("id"), Seq("id"),
        keysOnly = true)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getInt(3)))).toMap
    assert(out(3L) == (("removed", "", 0)))
    assert(out(5L) == (("added", "", 0)))
    assert(Seq(1L, 2L, 4L).forall(k => out(k) == (("unchanged", "", 0))))
    // without the flag, key-only snapshots are refused loudly
    intercept[IllegalArgumentException] {
      SnapshotDiff.diff(v1.select("id"), v2.select("id"), Seq("id"))
    }
    // and the flag contradicting explicit compareCols is refused too
    intercept[IllegalArgumentException] {
      SnapshotDiff.diff(v1, v2, Seq("id"), Seq("tag"), keysOnly = true)
    }
  }

  test("default compareCols = shared non-key columns; extra columns ignored") {
    val v2extra = v2.withColumn("only_new", lit(1))
    val out = SnapshotDiff.diff(v1, v2extra, Seq("id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "unchanged" && out(2L) == "changed")
  }
}
