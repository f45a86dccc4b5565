package graft

import org.apache.spark.sql.functions._
import graft.ops.Privacy
import graft.stats.KeyDiscovery

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  test("kAnonymity: class sizes, below-k tail, and the anonymity verdict") {
    // classes: (a,x)=3, (a,y)=2, (b,x)=1
    val df = Seq(("a", "x"), ("a", "x"), ("a", "x"), ("a", "y"), ("a", "y"),
      ("b", "x")).toDF("qi1", "qi2")
    val r = Privacy.kAnonymity(df, Seq("qi1", "qi2"), k = 3).head()
    assert(r.getLong(1) == 6 && r.getLong(2) == 3) // n_rows, n_classes
    assert(r.getLong(3) == 1)                      // min_class_size
    assert(r.getLong(4) == 2 && r.getLong(5) == 3) // classes/rows below k
    assert(r.getDouble(6) == 0.5)
    assert(!r.getBoolean(7))

    val r2 = Privacy.kAnonymity(df, Seq("qi1", "qi2"), k = 2)
    assert(!r2.head.getBoolean(7)) // the singleton class still violates
    val r3 = Privacy.kAnonymity(df.where(col("qi2") === "x" &&
      col("qi1") === "a"), Seq("qi1", "qi2"), k = 3).head()
    assert(r3.getBoolean(7) && r3.getLong(5) == 0)
  }

  test("tCloseness: distances equal the brute-force variational reference") {
    // classes g1: {x:2, y:2}, g2: {x:3, z:1}; global over 8 rows
    val df = Seq(
      ("g1", "x"), ("g1", "x"), ("g1", "y"), ("g1", "y"),
      ("g2", "x"), ("g2", "x"), ("g2", "x"), ("g2", "z"))
      .toDF("qi", "s")
    def brute(rows: Seq[(String, String)]): Map[String, Double] = {
      val n = rows.size.toDouble
      val g = rows.groupBy(_._2).view.mapValues(_.size / n).toMap
      rows.groupBy(_._1).map { case (q, rs) =>
        val sz = rs.size.toDouble
        val p = rs.groupBy(_._2).view.mapValues(_.size / sz).toMap
        q -> 0.5 * (g.keySet ++ p.keySet).toSeq
          .map(v => math.abs(p.getOrElse(v, 0.0) - g.getOrElse(v, 0.0))).sum
      }
    }
    val dists = brute(Seq(
      ("g1", "x"), ("g1", "x"), ("g1", "y"), ("g1", "y"),
      ("g2", "x"), ("g2", "x"), ("g2", "x"), ("g2", "z")))
    val expectMax = dists.values.max
    val r = Privacy.tCloseness(df, Seq("qi"), "s", t = 0.10).head()
    assert(r.getLong(1) == 8 && r.getLong(2) == 2)
    assert(math.abs(r.getDouble(3) - expectMax) < 1e-12)
    // g1: |1/2-5/8| + |1/2-2/8| + |0-1/8| = 1/8+2/8+1/8 = 1/2 -> t=1/4
    // g2: |3/4-5/8| + |0-2/8| + |1/4-1/8| = 1/8+2/8+1/8 = 1/2 -> t=1/4
    assert(r.getDouble(3) == 0.25)
    assert(r.getLong(4) == 2 && r.getLong(5) == 8)  // both classes above 0.10
    assert(r.getDouble(6) == 1.0 && !r.getBoolean(7))
    val ok = Privacy.tCloseness(df, Seq("qi"), "s", t = 0.25).head()
    assert(ok.getBoolean(7) && ok.getLong(4) == 0)  // boundary: <= t passes
  }

  test("tCloseness: null sensitives carry no mass; empty input is vacuously close") {
    val df = Seq(
      ("g1", Some("x")), ("g1", Some("y")), ("g1", None),
      ("g2", Some("x")), ("g2", Some("y")), ("g2", None), ("g2", None))
      .toDF("qi", "s")
    val r = Privacy.tCloseness(df, Seq("qi"), "s", t = 0.5).head()
    assert(r.getLong(1) == 4)               // nulls excluded from n_rows
    assert(r.getDouble(3) == 0.0)           // both classes: exactly global
    assert(r.getBoolean(7))
    val empty = Privacy.tCloseness(df.where(col("s").isNull),
      Seq("qi"), "s", t = 0.5).head()
    assert(empty.getLong(1) == 0 && empty.getLong(2) == 0)
    assert(empty.getDouble(3) == 0.0 && empty.getBoolean(7))
  }

  test("tClosenessOrdered: EMD equals the hand-computed cumulative form") {
    // class A: {1:2, 2:2}; class B: {3:4}; global n=8, m=3
    // A: p=(.5,.5,0) q=(.25,.25,.5), cum diffs (.25,.5,0) -> EMD .75/2=.375
    // B: p=(0,0,1), cum diffs (-.25,-.5,0)            -> EMD .75/2=.375
    val df = Seq(("A", 1), ("A", 1), ("A", 2), ("A", 2),
      ("B", 3), ("B", 3), ("B", 3), ("B", 3)).toDF("qi", "s")
    val r = Privacy.tClosenessOrdered(df, Seq("qi"), "s", t = 0.3).head()
    assert(r.getLong(1) == 8 && r.getLong(2) == 2)   // n_rows, n_classes
    assert(r.getDouble(3) == 0.375)                  // exact: 24/64
    assert(r.getLong(4) == 2 && r.getLong(5) == 8)   // both classes above
    assert(r.getDouble(6) == 1.0)
    assert(!r.getBoolean(7))
    // at t above the max the same frame is t-close
    assert(Privacy.tClosenessOrdered(df, Seq("qi"), "s", t = 0.4)
      .head().getBoolean(7))
  }

  test("tClosenessOrdered: adjacent mass is cheap under EMD, total under " +
    "variational — the reason the ordered form exists") {
    // global values 1..5 uniform; class X concentrated on the MIDDLE value:
    // variational reads 0.8, EMD reads 0.3 (mass moves short distances)
    val rows = (1 to 5).flatMap(v => Seq.fill(2)(
      (if (v == 3) "X" else "Y", v)))
    val df = rows.toDF("qi", "s")
    val emd = Privacy.tClosenessOrdered(df, Seq("qi"), "s", t = 0.01)
      .head().getDouble(3)
    val vari = Privacy.tCloseness(df, Seq("qi"), "s", t = 0.01)
      .head().getDouble(3)
    assert(emd == 0.3 && vari == 0.8, s"emd=$emd vari=$vari")
  }

  test("tClosenessOrdered: single-value vocabulary (m=1) is distance 0; " +
    "null sensitives carry no mass") {
    val one = Seq(("a", 7), ("a", 7), ("b", 7)).toDF("qi", "s")
    val r1 = Privacy.tClosenessOrdered(one, Seq("qi"), "s", t = 0.01).head()
    assert(r1.getDouble(3) == 0.0 && r1.getBoolean(7))
    val withNulls = Seq(("a", Some(1)), ("a", None), ("b", Some(2)),
      ("b", None), ("c", None)).toDF("qi", "s")
    val r2 = Privacy.tClosenessOrdered(withNulls, Seq("qi"), "s",
      t = 0.4).head()
    // only the 2 non-null rows count; class c vanishes entirely
    assert(r2.getLong(1) == 2 && r2.getLong(2) == 2)
    // each class holds all mass on its own value: cum |r| at v1 = 1*2-1*1=1,
    // at v2 = 0 -> dist = 1/((2-1)*1*2) = 0.5 for both classes
    assert(r2.getDouble(3) == 0.5)
    // empty input: zeroed report, vacuously close
    val r3 = Privacy.tClosenessOrdered(
      one.where(col("qi") === "zzz"), Seq("qi"), "s", t = 0.2).head()
    assert(r3.getLong(1) == 0 && r3.getLong(2) == 0 && r3.getBoolean(7))
  }

  test("kAnonymity: nulls form their own equivalence class") {
    val df = Seq(Some("a"), Some("a"), None, None, None)
      .toDF("qi")
    val r = Privacy.kAnonymity(df, Seq("qi"), k = 3).head()
    // classes: a=2 (below), null=3 (at k)
    assert(r.getLong(2) == 2 && r.getLong(3) == 2)
    assert(r.getLong(4) == 1 && r.getLong(5) == 2)
  }

  test("lDiversity: distinct sensitive values per class; all-null counts 0") {
    val df = Seq(
      ("g1", Some(10)), ("g1", Some(20)), ("g1", Some(30)),
      ("g2", Some(10)), ("g2", Some(10)),
      ("g3", None), ("g3", None)
    ).toDF("qi", "s")
    val r = Privacy.lDiversity(df, Seq("qi"), "s", l = 2).head()
    assert(r.getLong(1) == 3)     // n_classes
    assert(r.getLong(2) == 0)     // min_diversity: g3 has only nulls
    assert(r.getLong(3) == 2)     // g2 (1 value) and g3 (0) below l
    assert(r.getLong(4) == 4)     // their rows
    assert(!r.getBoolean(6))
  }

  test("empty input: zeroed counts and a vacuously-true verdict, never null") {
    val df = Seq(("a", 1)).toDF("qi", "s").where(lit(false))
    val k = Privacy.kAnonymity(df, Seq("qi"), k = 2).head()
    assert(k.getLong(1) == 0 && k.getLong(2) == 0 && k.getLong(3) == 0)
    assert(k.getDouble(6) == 0.0)
    assert(k.getBoolean(7)) // vacuously anonymous — and never an NPE
    val l = Privacy.lDiversity(df, Seq("qi"), "s", l = 2).head()
    assert(l.getLong(1) == 0 && l.getLong(2) == 0)
    assert(l.getBoolean(6))
  }

  test("columnEntropy: an all-null column yields a zeroed row, not a gap") {
    val df = Seq(("a", Option.empty[String]), ("b", None)).toDF("x", "dead")
    val out = KeyDiscovery.columnEntropy(df, Seq("x", "dead")).collect()
    assert(out.length == 2)
    assert(out.map(_.getString(0)).toSeq == Seq("x", "dead")) // given order
    val dead = out(1)
    assert(dead.getLong(1) == 0 && dead.getLong(2) == 0)
    assert(dead.getDouble(3) == 0.0 && dead.getDouble(4) == 0.0)
  }

  test("columnEntropy: constant -> 0, uniform -> normalized 1, nulls drop") {
    val df = (1 to 32).map(i =>
        ("const", s"u$i", if (i <= 16) Some(s"h${i % 4}") else None))
      .toDF("c_const", "c_uniform", "c_nullhalf")
    val out = KeyDiscovery.columnEntropy(df,
        Seq("c_const", "c_uniform", "c_nullhalf"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    val (cn, cd, ce, cne) = out("c_const")
    assert(cn == 32 && cd == 1 && ce == 0.0 && cne == 0.0)
    val (un, ud, ue, une) = out("c_uniform")
    assert(un == 32 && ud == 32 && une == 1.0)
    assert(math.abs(ue - math.log(32.0)) < 1e-6)
    val (nn, nd, _, nne) = out("c_nullhalf")
    assert(nn == 16 && nd == 4) // nulls dropped before counting
    assert(nne == 1.0)          // h0..h3 x4 each: uniform over 4
  }
}
