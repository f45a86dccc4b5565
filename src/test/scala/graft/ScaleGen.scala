package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-stress data generator (dev tool, not part of the driver contract):
  * synthesizes an sf1-shaped dataset from sf0.1 by unioning `copies`
  * key-shifted replicas of each fact table — the cheapest local stand-in
  * for a 10× scale-up when no dbgen is reachable (zero-egress sandbox).
  *
  * Per copy i every identifier column shifts by i·10¹⁰ (far beyond any
  * real key), so joins land on the matching replica exactly like a larger
  * generated dataset; nation/region keys stay unshifted (dims kept 1×,
  * like TPC-H's constant-size tables). Document text gets a per-copy
  * suffix so the corpus isn't 90% exact duplicates, which would stress
  * dedup in an unrealistic way.
  *
  * Usage: Test/runMain graft.ScaleGen [outDir] [copies] [tables] [zipfPct]
  *        (tables = optional comma list, e.g. "embeddings" for a
  *        vectors-only stress corpus at high copy counts; zipfPct > 0
  *        remaps that percentage of EVENTS rows — deterministically by
  *        event_id hash — onto ONE hot actor spanning every copy, the
  *        adversarial bot/service-account skew the uniform generator
  *        never produces, so actor-keyed operators probe their skew
  *        posture, not just their volume scaling)
  * then:  SPARK_GRAFT_SF_DIR=<outDir> sbt "runMain graft.Bench"
  */
object ScaleGen {
  private val Shift = 10000000000L

  def main(args: Array[String]): Unit = {
    val outDir = if (args.length > 0) args(0) else "/tmp/graft_sf1"
    val copies = if (args.length > 1) args(1).toInt else 10
    // the %03d thrice-repeated name block proves cross-copy distance >= 3
    // only for 3-digit indices; a 4-digit index would print 12 chars and
    // the argument would rest on length difference alone — enforce the
    // invariant where it is assumed (r10 ADVICE)
    require(copies <= 999,
      s"copies = $copies > 999: the name-block distance argument covers " +
        "3-digit copy indices only — extend ScaleGen before going past it")
    val only: Option[Set[String]] =
      if (args.length > 2 && args(2).nonEmpty)
        Some(args(2).split(",").map(_.trim).toSet) else None
    val zipfPct = if (args.length > 3) args(3).toInt else 0
    require(zipfPct >= 0 && zipfPct <= 90, s"zipfPct $zipfPct not in 0..90")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val srcDir = "/root/testdata/sf0.1"
    val facts = Seq("lineitem", "orders", "customer", "supplier", "part",
      "events", "documents", "embeddings")
    val dims = Seq("nation", "region")

    def shifted(df: DataFrame, i: Int): DataFrame = {
      val idCols = df.columns.filter { n =>
        val l = n.toLowerCase
        (l.endsWith("key") || l == "doc_id" || l == "vec_id" ||
          l == "user_id" || l == "event_id") &&
          !l.endsWith("nationkey") && !l.endsWith("regionkey")
      }.toSet
      var out = idCols.foldLeft(df)((d, c) =>
        d.withColumn(c, col(c) + lit(i.toLong * Shift)))
      // A real 10x corpus has 10x the documents at the SAME duplicate
      // density — not 10 near-copies of every doc. Suffixing every token
      // with the copy index is a bijection on the token alphabet: within a
      // copy, every shingle set (and so every Jaccard / MinHash / SimHash
      // relation) is preserved exactly, while cross-copy shingle overlap
      // drops to zero. Copy 0 keeps the original text so single-corpus
      // results at sf0.1 remain a subset.
      if (out.columns.contains("text") && i > 0)
        out = out.withColumn("text",
          regexp_replace(col("text"), "(\\S+)", s"$$1·$i"))
      // Entity names: regenerate per copy so copies carry DISTINCT names
      // — otherwise every name repeats `copies` times and fuzzy-join
      // pair density grows with the copy count instead of staying
      // corpus-constant. The copy index is embedded as a THRICE-REPEATED
      // three-digit block ("007007007"): two distinct copies then differ
      // in >= 3 positions (at least one digit of difference per block),
      // so cross-copy Levenshtein >= 3 and FastSS d=1 deletion
      // neighborhoods (which intersect only at distance <= 2) can never
      // bridge copies — only the original within-copy neighbor structure
      // (the 9-digit tail) contributes d<=1 pairs. The earlier TWO-digit
      // doubled block ("0707") held distance >= 2 but broke past 100
      // copies: %02d prints three digits for i >= 100, and the mixed
      // 4/6-char blocks sit at exactly distance 2 in
      // insertion-compatible patterns, so deletion variants started
      // COLLIDING across copies — candidate (not output) volume then
      // grew super-linearly with the copy count (caught by the r10 300×
      // probe: the q133 100×→300× segment read 4.9× for 3× data with
      // output exactly 300×). A single embedded copy digit would be
      // worse still — distance 1 across copies inflates the true pair
      // set itself. The tail is the ORIGINAL key (mod Shift), lpad 9.
      for ((nameCol, keyCol, prefix) <- Seq(
          ("s_name", "s_suppkey", "Supplier#"),
          ("c_name", "c_custkey", "Customer#"))) {
        if (out.columns.contains(nameCol) && i > 0)
          out = out.withColumn(nameCol,
            concat(lit(prefix + f"$i%03d$i%03d$i%03d"),
              lpad(pmod(col(keyCol), lit(Shift)).cast("string"), 9, "0")))
      }
      // Same idea for vectors: rotation ∘ per-copy sign flips — both
      // orthogonal transforms, so all within-copy cosines/distances are
      // exact — while cross-copy cosine falls to noise, keeping near-dup
      // density per vector constant as the corpus grows. Rotation alone
      // repeats every `dim` copies (and slice() breaks past it), so the
      // sign pattern keeps same-rotation copies decorrelated at any copy
      // count.
      if (out.columns.contains("embedding") && i > 0) {
        val d = lit(i % 63 + 1) // rotation in 1..63, never the identity
        val rotated = concat(
          slice(col("embedding"), d + 1, size(col("embedding")) - d),
          slice(col("embedding"), lit(1), d))
        val signs = Array.tabulate(64) { j =>
          if ((((i.toLong * 0x9E3779B9L) >>> (j % 31)) & 1L) == 1L) -1.0f
          else 1.0f
        }
        out = out.withColumn("embedding",
          zip_with(rotated, lit(signs), (x, s) => x * s))
      }
      out
    }

    // one hot actor far outside the shifted id space, shared by all copies
    val HotActor = 77L * Shift
    for (t <- facts.filter(t => only.forall(_.contains(t)))) {
      val base = Queries.table(spark, srcDir, t)
      var scaled = (0 until copies).map(i => shifted(base, i))
        .reduce(_ unionAll _)
      if (t == "events" && zipfPct > 0)
        scaled = scaled.withColumn("user_id",
          when(pmod(xxhash64(col("event_id")), lit(100L)) < zipfPct,
            lit(HotActor)).otherwise(col("user_id")))
      scaled.write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      println(s"[scalegen] $t x$copies -> $outDir" +
        (if (t == "events" && zipfPct > 0) s" (zipf $zipfPct%)" else ""))
    }
    for (t <- dims.filter(t => only.forall(_.contains(t)))) {
      Queries.table(spark, srcDir, t)
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      println(s"[scalegen] $t x1 -> $outDir")
    }
    spark.stop()
  }
}
