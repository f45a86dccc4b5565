package graft

import org.apache.spark.sql.functions._
import graft.stats.KeyDiscovery

class KeyDiscoverySpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq[(Int, Option[String], String, Option[Int])](
    (1, Some("a"), "x", Some(10)),
    (2, Some("b"), "x", Some(10)),
    (3, Some("c"), "y", Some(20)),
    (4, None, "y", Some(20)),
    (5, Some("e"), "z", None)
  ).toDF("id", "tag", "grp", "grp_val")

  test("candidateKeys: unique-and-non-null wins; nulls and dupes disqualify") {
    val out = KeyDiscovery.candidateKeys(df, Seq("id", "tag", "grp"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out("id") == ((5L, 5L, 0L, true)))
    // unique among non-nulls but has a null: NOT a key
    assert(out("tag") == ((5L, 4L, 1L, false)))
    assert(out("grp") == ((5L, 3L, 0L, false)))
  }

  test("fdAgg (scanOnce) batches every pair measure over ONE table scan; paths agree") {
    import org.apache.spark.sql.catalyst.plans.logical.LeafNode
    val fd = KeyDiscovery.fdAgg(df, Seq("id" -> "grp", "grp" -> "id",
      "grp" -> "grp_val", "grp_val" -> "grp"))
    assert(fd.queryExecution.optimizedPlan.collect {
      case l: LeafNode => l }.size == 1)
    val cols = Seq("id", "grp", "grp_val")
    val jobs = KeyDiscovery.functionalDependencies(df, cols)
      .collect().map(_.toSeq).toSeq
    val batched = KeyDiscovery.functionalDependencies(df, cols,
      scanOnce = true).collect().map(_.toSeq).toSeq
    assert(jobs == batched)
    // and each per-pair job prunes to its two columns
    val scanned = KeyDiscovery.pairProfileAgg(df, "grp" -> "grp_val")
      .queryExecution.optimizedPlan.collectLeaves()
      .flatMap(_.output).map(_.name).toSet
    assert(scanned.subsetOf(Set("grp", "grp_val")), s"scanned: $scanned")
  }

  test("per-candidate profile jobs prune to the candidate's columns") {
    // the concurrent-jobs shape reads ≈ one full-width scan in TOTAL only
    // because each job's plan references nothing beyond its tuple
    val plan = KeyDiscovery.tupleProfileAgg(df, Seq("grp", "grp_val"))
      .queryExecution.optimizedPlan
    val scanned = plan.collectLeaves().flatMap(_.output).map(_.name).toSet
    assert(scanned.subsetOf(Set("grp", "grp_val")), s"scanned: $scanned")
  }

  test("functionalDependencies: keys determine all; value columns don't") {
    val out = KeyDiscovery.functionalDependencies(df,
        Seq("id", "grp", "grp_val"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getBoolean(4)).toMap
    assert(out(("id", "grp")))
    assert(out(("id", "grp_val")))
    assert(!out(("grp", "id")))
    // grp -> grp_val holds: x->10, y->20, z has only a null grp_val (the
    // any-null-skipping pair count ignores it, as does the oracle)
    assert(out(("grp", "grp_val")))
    assert(out(("grp_val", "grp"))) // 10->x, 20->y over non-null pairs
    assert(!out(("grp_val", "id")))
  }

  test("functionalDependencies breaks when one determinant maps to two values") {
    val broken = df.unionAll(
      Seq((6, Option("f"), "x", Option(99))).toDF("id", "tag", "grp", "grp_val"))
    val out = KeyDiscovery.functionalDependencies(broken, Seq("grp", "grp_val"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getBoolean(4)).toMap
    assert(!out(("grp", "grp_val"))) // x maps to 10 and 99
    assert(out(("grp_val", "grp")))
  }

  test("compositeCandidateKeys: tuple distinct + any-null semantics") {
    val out = KeyDiscovery.compositeCandidateKeys(df,
        Seq(Seq("id"), Seq("grp", "grp_val"), Seq("id", "tag"),
          Seq("grp", "id")))
      .collect().map(r => r.getString(0) ->
        ((r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getBoolean(5)))).toMap
    assert(out("id") == ((1, 5L, 5L, 0L, true)))
    // (grp, grp_val): pairs (x,10)(x,10)(y,20)(y,20)(z,null) → distinct 2
    // over the 4 all-non-null rows, 1 any-null row, not a key
    assert(out("grp,grp_val") == ((2, 5L, 2L, 1L, false)))
    // (id, tag): unique tuples but one null member row disqualifies
    assert(out("id,tag") == ((2, 5L, 4L, 1L, false)))
    // adding id to a non-key makes the tuple a key (no nulls in either)
    assert(out("grp,id") == ((2, 5L, 5L, 0L, true)))
  }

  test("discoverKeys(maxArity=2): singles + pairs, lattice order; scanOnce parity") {
    val out = KeyDiscovery.discoverKeys(df, Seq("id", "grp", "grp_val"))
    val names = out.collect().map(_.getString(0)).toSeq
    assert(names == Seq("id", "grp", "grp_val",
      "id,grp", "id,grp_val", "grp,grp_val"))
    // the scanOnce=true Expand path (scan-bound-cluster alternative) and
    // the default concurrent-jobs path must agree row for row
    val tuples = Seq(Seq("id"), Seq("grp"), Seq("id", "grp"),
      Seq("grp", "grp_val"))
    val jobs = KeyDiscovery.compositeCandidateKeys(df, tuples)
      .collect().map(_.toSeq).toSeq
    val batched = KeyDiscovery.compositeCandidateKeys(df, tuples,
      scanOnce = true).collect().map(_.toSeq).toSeq
    assert(jobs == batched)
    // and the batched path really is one scan
    import org.apache.spark.sql.catalyst.plans.logical.LeafNode
    val agg = KeyDiscovery.compositeKeyAgg(df, tuples)
    assert(agg.queryExecution.optimizedPlan.collect {
      case l: LeafNode => l }.size == 1)
  }

  test("discoverKeysStaged prunes supersets of found keys, agrees on the key set") {
    val staged = KeyDiscovery.discoverKeysStaged(df, Seq("id", "grp", "grp_val"))
      .collect().map(r => r.getString(0) -> r.getBoolean(5)).toMap
    // id is an arity-1 key, so no arity-2 tuple containing it is measured
    assert(staged.keySet == Set("id", "grp", "grp_val", "grp,grp_val"))
    assert(staged("id") && !staged("grp,grp_val"))
    // the unpruned walk's key set is the staged key set plus the implied
    // supersets of discovered keys — nothing else
    val full = KeyDiscovery.discoverKeys(df, Seq("id", "grp", "grp_val"))
      .collect().map(r => r.getString(0) -> r.getBoolean(5)).toMap
    val impliedExtra = full.filter(_._2).keySet -- staged.filter(_._2).keySet
    assert(impliedExtra.forall(_.split(",").contains("id")), s"$impliedExtra")
  }

  test("compositeCandidateKeys misuse guards are loud") {
    intercept[IllegalArgumentException] {
      KeyDiscovery.compositeCandidateKeys(df, Seq(Seq("id", "id")))
    }
    intercept[IllegalArgumentException] {
      KeyDiscovery.compositeCandidateKeys(df, Seq(Seq("nope")))
    }
    intercept[IllegalArgumentException] {
      KeyDiscovery.compositeCandidateKeys(df,
        Seq.fill(KeyDiscovery.MaxCandidates + 1)(Seq("id")))
    }
  }
}
