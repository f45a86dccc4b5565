package graft

import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Large-k SemDeDup: the two-level CentroidIndex training + HOF-literal
  * assignment path that replaces the (codegen-bounded) literal-centroid
  * projection past k=256.
  */
class HierarchicalSemDedupSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8

  /** Well-separated synthetic corpus: `groups` cluster centers on scaled
    * unit axes pairs, `per` jittered members each, plus one exact duplicate
    * of each group's first member.
    */
  private def corpus(groups: Int, per: Int) = {
    val rnd = new java.util.Random(7L)
    val rows = (0 until groups).flatMap { g =>
      val center = Array.tabulate(dim)(i =>
        if (i == g % dim) 10.0 + g else if (i == (g + 3) % dim) 5.0 + g else 0.0)
      val members = (0 until per).map { j =>
        val v = center.map(_ + rnd.nextGaussian() * 0.01)
        (g.toLong * 1000 + j, v.map(_.toFloat).toSeq)
      }
      members :+ ((g.toLong * 1000 + 999, members.head._2))
    }
    rows.toDF("vec_id", "embedding")
  }

  test("hierarchical index: dense global ids covering >= requested k") {
    val df = corpus(groups = 30, per = 20)
    val idx = Similarity.kmeansFitHierarchical(df, "embedding", k = 40,
      iters = 3, seed = 42L)
    assert(idx.coarse.length >= 2)
    assert(idx.fine.length == idx.coarse.length)
    assert(idx.k >= 40)
    assert(idx.offsets.head == 0)
    assert(idx.offsets.zip(idx.fine.map(_.length)).map { case (o, l) => o + l }
      .sameElements(idx.offsets.tail :+ idx.k))
  }

  test("hierarchical assignment: deterministic pure function of the vector") {
    val df = corpus(groups = 20, per = 10)
    val idx = Similarity.kmeansFitHierarchical(df, "embedding", k = 32,
      iters = 3, seed = 42L)
    def run() = Similarity.ivfAssignHierarchical(df, "vec_id", "embedding", idx)
      .select("id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getInt(2 - 1)).toMap
    val a = run(); val b = run()
    assert(a == b)
    // identical vectors always share a cell
    val byId = a
    (0 until 20).foreach { g =>
      assert(byId(g.toLong * 1000 + 999) == byId(g.toLong * 1000))
    }
  }

  test("hierarchical assignment agrees with brute-force argmin on separated data") {
    val df = corpus(groups = 20, per = 10)
    val idx = Similarity.kmeansFitHierarchical(df, "embedding", k = 32,
      iters = 3, seed = 42L)
    val flat = idx.fine.flatten
    val assigned = Similarity.ivfAssignHierarchical(df, "vec_id", "embedding", idx)
      .collect()
    var agree = 0
    assigned.foreach { r =>
      val v = r.getSeq[Double](1).toArray
      val chosen = r.getInt(2)
      val exact = flat.indices.minBy { c =>
        flat(c).zip(v).map { case (a, b) => (a - b) * (a - b) }.sum
      }
      if (chosen == exact) agree += 1
    }
    assert(agree >= (assigned.length * 0.95).toInt,
      s"only $agree/${assigned.length} matched exact argmin")
  }

  test("semanticDedupScaled large-k path: exact duplicates deduped, one keeper each") {
    val df = corpus(groups = 25, per = 8)   // 225 rows
    // force the hierarchical path: targetCell=8 -> k=29 > codegenMaxK=16.
    // tau sits between the max cross-group cosine (groups sharing an axis
    // pair reach 0.9990) and the within-group jitter cosine (~1.0)
    val out = Similarity.semanticDedupScaled(df, "vec_id", "embedding",
      tau = 0.9995, targetCell = 8, kMin = 8, iters = 3, seed = 42L,
      codegenMaxK = 16)
    val rows = out.collect().map(r => (r.getLong(0), r.getBoolean(2)))
    assert(rows.length == df.count())
    val kept = rows.filter(_._2).map(_._1).toSet
    (0 until 25).foreach { g =>
      val dupPair = Seq(g.toLong * 1000, g.toLong * 1000 + 999)
      assert(dupPair.count(kept.contains) == 1,
        s"group $g: expected exactly one of the exact-duplicate pair kept")
    }
  }

  test("degenerate corpus (all vectors identical) through the hierarchical path: one keeper") {
    // every centroid collapses to the same point, every assignment ties
    // (argmin keeps the first), and the single cell holds the whole corpus
    // — the skew guard grid-splits it; exactly one row survives
    val one = Array.tabulate(dim)(_ => 1.0f).toSeq
    val df = (0L until 500L).map(i => (i, one)).toDF("vec_id", "embedding")
    val out = Similarity.semanticDedupScaled(df, "vec_id", "embedding",
      tau = 0.99, targetCell = 1, kMin = 2, iters = 2, seed = 42L,
      codegenMaxK = 4)
    val rows = out.collect().map(r => (r.getLong(0), r.getBoolean(2)))
    assert(rows.length == 500)
    assert(rows.count(_._2) == 1 && rows.find(_._2).get._1 == 0L,
      "exactly the min-id row must be kept")
  }

  test("semanticDedupScaled small corpora keep the literal-codegen path and pinned k") {
    // below kMin*targetCell the plan must not contain the hierarchical
    // literal — same semantics as the pinned q76 oracle
    val df = corpus(groups = 4, per = 5)
    val out = Similarity.semanticDedupScaled(df, "vec_id", "embedding",
      tau = 0.999, iters = 3, seed = 42L)
    assert(out.select(countDistinct(col("cluster"))).head().getLong(0) <= 8L)
    assert(out.count() == df.count())
  }
}
