package graft

import org.apache.spark.sql.functions._

import graft.ops.Packing

/** Sequence packing: cumsum and greedy strategies. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    // shard a: tokens 60+50 cross the 100 budget at doc 2
    ("a", 1L, 60L), ("a", 2L, 50L), ("a", 3L, 10L),
    // shard b: single doc larger than the budget
    ("b", 4L, 250L), ("b", 5L, 10L)
  ).toDF("shard", "id", "n_tok")

  test("packByCumsum: exclusive prefix sum assigns boundary doc to its first-token pack") {
    val out = Packing.packByCumsum(docs, "id", "n_tok", budget = 100L,
        shardCol = Some("shard"))
      .select("id", "pack_id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // a: cumBefore 0, 60, 110 -> packs a:0, a:0, a:1
    assert(out(1L) == "a:0" && out(2L) == "a:0" && out(3L) == "a:1")
    // b: cumBefore 0, 250 -> packs b:0, b:2
    assert(out(4L) == "b:0" && out(5L) == "b:2")
  }

  test("packGreedyPerPartition: docs never split; oversized doc gets its own pack") {
    val out = Packing.packGreedyPerPartition(docs, "id", "n_tok",
        budget = 100L, numPartitions = 1)
      .select("id", "pack_id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // order by id: 60 | 50+10 | 250 | 10 — 50 doesn't fit after 60; 250
    // overflows alone and closes; 10 starts fresh
    assert(out(1L) != out(2L))
    assert(out(2L) == out(3L))
    assert(out(4L) != out(3L) && out(5L) != out(4L))
    // greedy never overfills except for single oversized docs
    val stats = Packing.packStats(
      Packing.packGreedyPerPartition(docs, "id", "n_tok", budget = 100L,
        numPartitions = 1), "n_tok", budget = 100L).collect()
    stats.foreach { r =>
      assert(r.getLong(2) <= 100L || r.getLong(1) == 1L,
        s"overfilled multi-doc pack: $r")
    }
  }

  test("packStats: counts, totals and fill ratio") {
    val packed = Packing.packByCumsum(docs, "id", "n_tok", budget = 100L,
      shardCol = Some("shard"))
    val stats = Packing.packStats(packed, "n_tok", budget = 100L)
      .orderBy("pack_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(stats.toSeq == Seq(
      ("a:0", 2L, 110L, 1.1), ("a:1", 1L, 10L, 0.1),
      ("b:0", 1L, 250L, 2.5), ("b:2", 1L, 10L, 0.1)))
  }
}
