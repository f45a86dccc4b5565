package graft

import org.apache.spark.sql.functions._
import scala.util.Random
import graft.ops.RecordLinkage

class RecordLinkageSpec extends SparkSpec {
  import spark.implicits._

  private def brute(strs: Seq[(Long, String)], d: Int): Set[(Long, Long, Int)] = {
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val cur = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(a.length)
    }
    (for {
      (ia, sa) <- strs; (ib, sb) <- strs if ia < ib
      dist = lev(sa, sb) if dist <= d
    } yield (ia, ib, dist)).toSet
  }

  private def collected(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("fuzzySelfPairs matches brute force on random strings (d = 2)") {
    val rnd = new Random(7)
    val strs = (0L until 60L).map { i =>
      i -> (0 until (3 + rnd.nextInt(8))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    }
    val df = strs.toDF("id", "s")
    val got = collected(RecordLinkage.fuzzySelfPairs(df, "id", "s", maxDist = 2))
    assert(got == brute(strs, 2))
    assert(got.nonEmpty) // the fixture actually exercises matches
  }

  test("short and empty strings: zero-length segments keep recall exact") {
    val strs = Seq(0L -> "", 1L -> "a", 2L -> "b", 3L -> "ab", 4L -> "ba",
      5L -> "abc", 6L -> "", 7L -> "c")
    val df = strs.toDF("id", "s")
    for (d <- Seq(1, 2)) {
      val got = collected(RecordLinkage.fuzzySelfPairs(df, "id", "s", d))
      assert(got == brute(strs, d), s"maxDist=$d")
    }
  }

  test("grid-split path (chunkSize = 2) returns the identical pair set") {
    val rnd = new Random(11)
    val strs = (0L until 40L).map { i =>
      i -> (0 until (4 + rnd.nextInt(4))).map(_ => ('a' + rnd.nextInt(2)).toChar).mkString
    }
    val df = strs.toDF("id", "s")
    val plain = collected(RecordLinkage.fuzzySelfPairs(df, "id", "s", 1))
    val grid = collected(RecordLinkage.fuzzySelfPairs(df, "id", "s", 1, chunkSize = 2))
    assert(plain == grid)
    assert(plain == brute(strs, 1))
  }

  test("cross-table join: every within-distance pair, exactly once") {
    val left = Seq(1L -> "alpha", 2L -> "beta", 3L -> "gamma").toDF("id", "s")
    val right = Seq(10L -> "alpho", 11L -> "betas", 12L -> "delta",
      13L -> "alpha").toDF("id", "s")
    val got = collected(
      RecordLinkage.fuzzyJoinPairs(left, "id", "s", right, "id", "s", 1))
    assert(got == Set((1L, 10L, 1), (1L, 13L, 0), (2L, 11L, 1)))
  }

  test("d = 1: deletion-neighborhood and PassJoin plans agree exactly") {
    val rnd = new Random(23)
    val strs = (0L until 50L).map { i =>
      // duplicates on purpose: the deletion path collapses them first
      i -> (0 until (2 + rnd.nextInt(5))).map(_ => ('a' + rnd.nextInt(2)).toChar).mkString
    }
    val df = strs.toDF("id", "s")
    val fast = collected(ops.RecordLinkage.deletionSelf(df, "id", "s", 4096))
    val pass = collected(ops.RecordLinkage.passJoinSelf(df, "id", "s", 1, 4096))
    assert(fast == pass)
    assert(fast == brute(strs, 1))
    val left = strs.take(25).toDF("id", "s")
    val right = strs.drop(25).toDF("id", "s")
    val fastX = collected(
      ops.RecordLinkage.deletionCross(left, "id", "s", right, "id", "s", 4096))
    val passX = collected(
      ops.RecordLinkage.passJoinCross(left, "id", "s", right, "id", "s", 1, 4096))
    assert(fastX == passX)
    assert(fastX.nonEmpty)
  }

  test("nulls are ignored; maxDist = 0 degenerates to exact equality") {
    val df = Seq((0L, "x"), (1L, null), (2L, "x"), (3L, "y")).toDF("id", "s")
    val got = collected(RecordLinkage.fuzzySelfPairs(df, "id", "s", 0))
    assert(got == Set((0L, 2L, 0)))
  }

  private def lev2(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = dp(0); dp(0) = j
      for (i <- 1 to a.length) {
        val cur = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(a.length)
  }

  test("multiFieldSelfPairs: conjunction of banded fields, per-field dists") {
    val rnd = new Random(11)
    def s(n: Int, alpha: Int) =
      (0 until n).map(_ => ('a' + rnd.nextInt(alpha)).toChar).mkString
    val recs = (0L until 50L).map(i =>
      (i, s(4 + rnd.nextInt(4), 3), s(5, 4)))
    val df = recs.toDF("id", "name", "addr")
    val want = (for {
      (ia, na, aa) <- recs; (ib, nb, ab) <- recs if ia < ib
      dn = lev2(na, nb) if dn <= 1
      da = lev2(aa, ab) if da <= 2
    } yield (ia, ib, dn, da)).toSet
    val got = RecordLinkage.multiFieldSelfPairs(df, "id",
        Seq("name" -> 1, "addr" -> 2))
      .collect().map(r => (r.getLong(r.fieldIndex("id_1")),
        r.getLong(r.fieldIndex("id_2")),
        r.getInt(r.fieldIndex("dist_name")),
        r.getInt(r.fieldIndex("dist_addr")))).toSet
    assert(got == want)
    assert(want.nonEmpty)   // the fixture exercises surviving pairs
    // and the second predicate actually prunes (fixture is discriminating)
    assert(RecordLinkage.fuzzySelfPairs(df, "id", "name", 1).count() >
      got.size)
  }

  test("multiFieldJoinPairs: cross-table, null in any field disqualifies") {
    val left = Seq((0L, "abc", "pp"), (1L, "abd", null), (2L, "zzz", "qq"))
      .toDF("lid", "lname", "laddr")
    val right = Seq((10L, "abc", "pp"), (11L, "abe", "pr"), (12L, "abd", "qq"))
      .toDF("rid", "rname", "raddr")
    val got = RecordLinkage.multiFieldJoinPairs(left, "lid", right, "rid",
        Seq(("lname", "rname", 1), ("laddr", "raddr", 1)))
      .collect().map(r => (r.getLong(r.fieldIndex("id_1")),
        r.getLong(r.fieldIndex("id_2")),
        r.getInt(r.fieldIndex("dist_lname")),
        r.getInt(r.fieldIndex("dist_laddr")))).toSet
    // (0,10): name 0, addr 0; (0,11): name 1, addr 1; (0,12): name 1,
    // addr 2 > 1 → out; (1,*): null laddr → out; (2,*): name too far
    assert(got == Set((0L, 10L, 0, 0), (0L, 11L, 1, 1)))
  }
}
