package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`): brute-force cosine as the exact baseline, and a
  * random-hyperplane LSH bucketed variant as the scale path (candidates only
  * materialize within a bucket; the shuffle key is the bucket signature, so
  * no all-pairs join ever exists in the plan).
  */
object Similarity {

  /** Elementwise double view of a float vector. */
  def asDouble(c: Column): Column = transform(c, x => x.cast(DoubleType))

  /** Sequential-accumulation dot product, bit-deterministic (and
    * reproducible in engines whose list dot product also folds
    * sequentially). Uses the native codegen'd [[graft.expressions.VectorDot]]
    * when [[graft.GraftExtensions]] is installed in the session; falls back
    * to the (interpreted) higher-order-function fold otherwise — identical
    * arithmetic either way.
    */
  def dot(a: Column, b: Column): Column =
    if (nativeDotAvailable)
      call_function("ww_vector_dot", a, b)
    else
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  private def nativeDotAvailable: Boolean =
    try {
      org.apache.spark.sql.SparkSession.active.catalog
        .functionExists("ww_vector_dot")
    } catch { case _: Throwable => false }

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** All candidate pairs with rounded cosine ≥ threshold for each query
    * vector. Exact (cross join) — bounded query sets only; the broadcast of
    * the small query side keeps the big side shuffle-free.
    */
  def thresholdSearch(queries: DataFrame, candidates: DataFrame,
                      idCol: String, vecCol: String,
                      threshold: Double): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qv")))
    val c = candidates.select(col(idCol).as("candidate_id"),
      asDouble(col(vecCol)).as("cv"))
    q.join(c, col("query_id") =!= col("candidate_id"))
      .select(col("query_id"), col("candidate_id"),
        round(cosine(col("qv"), col("cv")), 4).as("cosine"))
      .where(col("cosine") >= threshold)
  }

  /** Exact top-k neighbors per query by brute force (broadcast queries,
    * per-query window rank).
    */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val scored = thresholdSearch(queries, candidates, idCol, vecCol, -1.0)
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("candidate_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Deterministic random hyperplanes (seeded driver-side RNG, broadcast as
    * literals). Public so oracle SQL can embed the exact same planes as
    * literals — the LSH bucketing is then reproducible in any engine.
    */
  def hyperplanes(dim: Int, numPlanes: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(numPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit LSH bucket signature for each vector: numPlanes sign bits
    * packed into a long. Vectors in the same bucket are ANN candidates.
    */
  def lshSignature(vec: Column, dim: Int, numPlanes: Int = 12,
                   seed: Long = 42L): Column = {
    val planes = hyperplanes(dim, numPlanes, seed)
    val v = asDouble(vec)
    (0 until numPlanes).map { p =>
      when(dot(v, lit(planes(p))) >= 0, shiftleft(lit(1L), p)).otherwise(0L)
    }.reduce(_.bitwiseOR(_))
  }

  /** LSH-bucketed ANN: candidates restricted to same-bucket vectors (probing
    * multiple signatures at smaller plane counts raises recall). Returns
    * (query_id, candidate_id, cosine) for same-bucket pairs with cosine ≥
    * threshold. At scale this is a bucket-key equi-join — shuffle on the
    * bucket signature, never an all-pairs product.
    *
    * NOTE: a FIXED `numPlanes` means a fixed bucket count, so buckets — and
    * with them within-bucket candidate pairs — grow quadratically with the
    * corpus (measured 56.8× runtime at 30× rows, BENCH_SF1.md). For
    * near-duplicate detection over a growing corpus use
    * [[embeddingNearDups]], which scales the plane count with log₂(n);
    * fixed planes are only right when the caller owns the bucket math
    * (e.g. a pinned-oracle regression control — [[embeddingNearDupsFixed]]).
    */
  def lshSearch(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                numPlanes: Int = 12, threshold: Double = 0.3,
                seed: Long = 42L): DataFrame = {
    val sig = df.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"),
      lshSignature(col(vecCol), dim, numPlanes, seed).as("bucket"))
    // skew-guarded self-join: a degenerate bucket (near-dup-heavy corpora)
    // grid-splits instead of exploding one task quadratically
    SkewJoin.selfPairs(sig, Seq("bucket"), "id", Seq("v"))
      .select(col("x_id").as("query_id"), col("y_id").as("candidate_id"),
        round(cosine(col("x_v"), col("y_v")), 4).as("cosine"))
      .where(col("cosine") >= threshold)
  }

  /** Per-group centroid L2 norms — the "vector aggregate" shape as ONE
    * groupBy with a per-dimension avg column each (no row explosion: the
    * shuffle carries one partial row per group instead of dim× the input;
    * element_at is indexed directly on the raw array so no HOF gets
    * re-inlined per dimension).
    */
  def centroidNorms(df: DataFrame, groupCol: String, vecCol: String): DataFrame = {
    // dim probe: MAX vector length (one cheap agg — deterministic, unlike
    // an unordered limit(1) that could sample a corrupt short row and
    // silently truncate every vector); empty/all-null input → empty result.
    // try_element_at below keeps ragged (shorter) vectors as nulls instead
    // of an ANSI INVALID_ARRAY_INDEX error — avg skips them per dimension.
    val dimRow = df.where(col(vecCol).isNotNull)
      .agg(max(size(col(vecCol)))).collect().filterNot(_.isNullAt(0))
    if (dimRow.isEmpty) {
      import org.apache.spark.sql.Row
      return df.sparkSession.createDataFrame(
        df.sparkSession.sparkContext.emptyRDD[Row],
        StructType(Seq(
          StructField("grp", df.schema(groupCol).dataType),
          StructField("centroid_norm", DoubleType))))
    }
    val dim = dimRow(0).getInt(0)
    val means = (0 until dim).map(i =>
      avg(try_element_at(col(vecCol), lit(i + 1)).cast(DoubleType)).as(s"m$i"))
    val normExpr = sqrt((0 until dim).map(i => col(s"m$i") * col(s"m$i"))
      .reduce(_ + _))
    df.groupBy(col(groupCol).as("grp"))
      .agg(means.head, means.tail: _*)
      .select(col("grp"), round(normExpr, 4).as("centroid_norm"))
  }

  /** Embedding-cosine near-duplicate pairs (the embedding analog of MinHash
    * dedup) — the corpus-scale path.
    *
    * A FIXED plane count is quadratic at scale: the bucket count is
    * constant, so buckets grow linearly with the corpus and within-bucket
    * candidate pairs grow quadratically (measured 7.2x runtime at 10x rows
    * in the sf1 scale-stress). Here the plane count grows as
    * `max(minPlanes, ceil(log2(n / targetBucket)))`, keeping the expected
    * bucket size ~`targetBucket` as the corpus grows — candidate volume
    * stays ~linear (a 1e9-vector corpus gets ~2^20 buckets/table). The
    * recall the extra planes cost is bought back with `numTables`
    * independent hyperplane families OR-ed together (standard LSH
    * OR-construction): a pair is a candidate if it collides in ANY table;
    * pairs are deduped on ids before the cosine filter.
    *
    * Below `targetBucket * 2^minPlanes` rows (=65536 at defaults) the plane
    * count is pinned at `minPlanes`, so fixture-scale results are stable
    * and oracle-reproducible with literal planes.
    */
  /** NOTE: `df` is evaluated numTables+1 times (the row-count probe that
    * sizes the plane count, then one signature scan per OR-table). For the
    * common case — a bare parquet scan — re-scanning is cheaper than
    * materializing the corpus; if `df` carries expensive upstream lineage,
    * pass `df.localCheckpoint()` (the [[graft.ops.Dedup.duplicateClusters]]
    * convention).
    */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                        threshold: Double = 0.95, targetBucket: Int = 256,
                        numTables: Int = 2, minPlanes: Int = 8,
                        maxPlanes: Int = 24, seed: Long = 42L): DataFrame = {
    val n = df.count()
    val p = math.min(maxPlanes, math.max(minPlanes,
      math.ceil(math.log(math.max(n, 1L).toDouble / targetBucket) /
        math.log(2.0)).toInt))
    val tables = (0 until numTables).map { t =>
      df.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"),
        lshSignature(col(vecCol), dim, p, seed + 7919L * t).as("bucket"))
        .withColumn("tbl", lit(t))
    }
    // cosine + threshold BEFORE the pair-distinct: a pair colliding in both
    // tables computes its (identical) cosine twice — cheap codegen — but the
    // distinct's exchange then carries only the id/cosine triples of actual
    // matches instead of two 64-dim vectors for every candidate pair (the
    // dominant shuffle at corpus scale; measured 6.8x on the 30x stress)
    SkewJoin.selfPairs(tables.reduce(_ union _),
        Seq("tbl", "bucket"), "id", Seq("v"))
      .select(col("x_id").as("query_id"), col("y_id").as("candidate_id"),
        round(cosine(col("x_v"), col("y_v")), 4).as("cosine"))
      .where(col("cosine") >= threshold)
      .dropDuplicates("query_id", "candidate_id")
  }

  /** DELIBERATELY-quadratic legacy control: [[lshSearch]] with a fixed plane
    * count, kept ONLY as the pinned regression baseline whose oracle embeds
    * the 4 hyperplanes as SQL literals (q39). Never the API default — the
    * default near-dup path is [[embeddingNearDups]] (scaled planes, OR-ed
    * tables, ~linear candidate volume).
    */
  def embeddingNearDupsFixed(df: DataFrame, idCol: String, vecCol: String,
                             dim: Int, numPlanes: Int = 4,
                             threshold: Double = 0.4,
                             seed: Long = 42L): DataFrame =
    lshSearch(df, idCol, vecCol, dim, numPlanes, threshold, seed)

  /** Cross-set embedding decontamination: corpus vectors that are
    * near-duplicates of any benchmark vector — the semantic analog of
    * n-gram decontamination, for "did a paraphrased eval item leak into
    * training data". Both sides bucket under the SAME hyperplanes; the
    * benchmark side (eval sets are small) is broadcast, so the corpus
    * streams map-side through the bucket equi-join with ZERO corpus
    * shuffle, and only same-bucket pairs pay a cosine.
    *
    * Output: (corpus_id, bench_id, cosine) with cosine ≥ threshold.
    */
  def crossSetMatches(corpus: DataFrame, corpusIdCol: String,
                      bench: DataFrame, benchIdCol: String,
                      vecCol: String, dim: Int, numPlanes: Int = 4,
                      threshold: Double = 0.8, seed: Long = 42L): DataFrame = {
    val cs = corpus.select(col(corpusIdCol).as("corpus_id"),
      asDouble(col(vecCol)).as("cv"),
      lshSignature(col(vecCol), dim, numPlanes, seed).as("bucket"))
    val bs = bench.select(col(benchIdCol).as("bench_id"),
      asDouble(col(vecCol)).as("bv"),
      lshSignature(col(vecCol), dim, numPlanes, seed).as("bucket"))
    cs.join(broadcast(bs), Seq("bucket"))
      .select(col("corpus_id"), col("bench_id"),
        round(cosine(col("cv"), col("bv")), 4).as("cosine"))
      .where(col("cosine") >= threshold)
  }

  // ------------------------------------------------------------------ IVF
  /** Coarse k-means centroids trained driver-side on a bounded sample
    * (Lloyd iterations on ≤sampleSize vectors — the classic IVF quantizer
    * training shape; the full data never leaves executors).
    */
  def trainCentroids(df: DataFrame, vecCol: String, k: Int = 16,
                     sampleSize: Int = 2000, iters: Int = 10,
                     seed: Long = 42L): Array[Array[Double]] = {
    val sample = sampleVectors(df, vecCol, sampleSize, seed)
    require(sample.nonEmpty, "empty sample for IVF training")
    kmeansLocal(sample, k, iters, seed)
  }

  /** Bounded driver-side vector sample shared by the quantizer trainers
    * (IVF coarse centroids here, PQ codebooks in [[Quantize]]). ONE scan:
    * per-partition top-n by a seeded random key (TakeOrderedAndProject
    * holds an n-entry heap per task, never the partition) — the old
    * count()-then-Bernoulli path scanned the table twice just to size the
    * fraction, which at 100 TB doubles the cost of training. Sample order
    * is the random-key order: deterministic for a fixed dataset and seed.
    */
  private[ops] def sampleVectors(df: DataFrame, vecCol: String,
                                 sampleSize: Int,
                                 seed: Long): Array[Array[Double]] = {
    // null/empty embeddings never train (a single null row would NPE the
    // driver-side kernels)
    df.where(col(vecCol).isNotNull && size(col(vecCol)) > 0)
      .select(asDouble(col(vecCol)).as("v"))
      .withColumn("__r", rand(seed))
      .orderBy(col("__r")).limit(sampleSize)
      .collect().map(_.getSeq[Double](0).toArray)
  }

  /** Rows whose vector is present and exactly `dim` wide — the guard every
    * centroid-arithmetic consumer needs (ragged/null vectors would NPE the
    * update collect or poison per-dimension averages).
    */
  private def validVecs(df: DataFrame, vecCol: String, dim: Int): DataFrame =
    df.where(col(vecCol).isNotNull && size(col(vecCol)) === dim)

  /** Lloyd k-means on an in-memory sample (init = seeded draw from the
    * sample; empty clusters keep their previous centroid).
    */
  private[ops] def kmeansLocal(sample: Array[Array[Double]], k: Int,
                               iters: Int, seed: Long): Array[Array[Double]] = {
    val dim = sample.head.length
    val rnd = new java.util.Random(seed)
    var centroids = Array.fill(k)(sample(rnd.nextInt(sample.length)).clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val cnts = new Array[Long](k)
      sample.foreach { v =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var d = 0.0; var i = 0
          while (i < dim) { val t = v(i) - centroids(c)(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        cnts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
      }
      centroids = Array.tabulate(k)(c =>
        if (cnts(c) == 0) centroids(c)
        else sums(c).map(_ / cnts(c)))
    }
    centroids
  }

  /** Distance rank expression: array of (squared-distance-proxy, cluster)
    * structs sorted ascending — proxy is ‖c‖² − 2·v·c (the ‖v‖² term is
    * constant per row).
    */
  private def distStructs(v: Column, centroids: Array[Array[Double]]): Column =
    array_sort(array(centroids.zipWithIndex.map { case (c, i) =>
      val cc = c.map(x => x * x).sum
      struct((lit(cc) - dot(v, lit(c)) * 2).as("d"), lit(i).as("cluster"))
    }: _*))

  /** IVF assignment: each vector goes to its nearest coarse centroid — one
    * codegen'd projection, no shuffle.
    */
  def ivfAssign(df: DataFrame, idCol: String, vecCol: String,
                centroids: Array[Array[Double]]): DataFrame =
    df.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("cluster",
        element_at(distStructs(col("v"), centroids), 1).getField("cluster"))

  /** IVF ANN search: queries probe their `nprobe` nearest centroid lists and
    * score only vectors in those lists. The probe-list join shuffles on the
    * cluster id — candidate volume is data/k·nprobe per query, never the full
    * cross product. This is the scale path next to [[lshSearch]].
    */
  def ivfSearch(queries: DataFrame, candidates: DataFrame,
                idCol: String, vecCol: String,
                centroids: Array[Array[Double]],
                nprobe: Int = 2, threshold: Double = 0.3): DataFrame = {
    val index = ivfAssign(candidates, idCol, vecCol, centroids)
      .select(col("id").as("candidate_id"), col("v").as("cv"),
        col("cluster").as("c_cluster"))
    val probes = queries
      .select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("probe", explode(slice(
        distStructs(col("qv"), centroids), 1, nprobe).getField("cluster")))
    broadcast(probes)
      .join(index, col("probe") === col("c_cluster") &&
        col("query_id") =!= col("candidate_id"))
      .select(col("query_id"), col("candidate_id"),
        round(cosine(col("qv"), col("cv")), 4).as("cosine"))
      .where(col("cosine") >= threshold)
  }

  // ------------------------------------------------- hierarchical centroids
  /** Two-level centroid index for large-k assignment: `coarse` is a small
    * (≤256) top-level codebook — safe for the literal-codegen projection —
    * and `fine(c)` holds the sub-centroids trained inside coarse cell `c`.
    * Global cluster ids are dense: cell c's sub-centroids own the id range
    * `[offsets(c), offsets(c) + fine(c).length)`.
    */
  case class CentroidIndex(coarse: Array[Array[Double]],
                           fine: Array[Array[Array[Double]]]) {
    val offsets: Array[Int] = fine.scanLeft(0)(_ + _.length).init
    def k: Int = offsets.last + fine.last.length
  }

  /** Hierarchical k-means for k beyond the literal-codegen bound: train
    * `kc ≈ √k` coarse centroids with the distributed [[kmeansFit]] (kc ≤ 256
    * keeps every per-row projection codegen'd), then take ONE bounded
    * per-cell sample pass (seeded rand + per-cell row_number — the shuffle
    * key is the cell, each task keeps ≤m rows) and train each cell's
    * `⌈k/kc⌉` sub-centroids driver-side on its sample, cells in parallel
    * across driver cores. Total driver state: ≤`sampleBudget` sample
    * vectors + k×dim centroid doubles — independent of data scale. The
    * realized centroid count is `kc·⌈k/kc⌉` (≥ k, < k + kc); callers that
    * size k for a target cell occupancy are insensitive to the rounding.
    *
    * Cells the sample never hit keep their coarse centroid as their only
    * sub-centroid, so every coarse cell stays addressable.
    */
  def kmeansFitHierarchical(df: DataFrame, vecCol: String, k: Int,
                            iters: Int = 5, seed: Long = 42L,
                            sampleBudget: Int = 100000): CentroidIndex = {
    val kc = math.min(256, math.max(2, math.ceil(math.sqrt(k.toDouble)).toInt))
    val finePer = math.ceil(k.toDouble / kc).toInt
    val coarse = kmeansFit(df, vecCol, kc, iters, seed)
    val dim = coarse.head.length
    val m = math.max(2 * finePer, sampleBudget / kc)
    val w = Window.partitionBy(col("cluster")).orderBy(col("__r"), col("v"))
    val sampled = validVecs(df, vecCol, dim)
      .select(asDouble(col(vecCol)).as("v"))
      .withColumn("cluster",
        element_at(distStructs(col("v"), coarse), 1).getField("cluster"))
      .withColumn("__r", rand(seed ^ 0x5ca1ab1eL))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= m)
      .select(col("cluster"), col("v"))
      .collect()
    val byCell = sampled.groupBy(_.getInt(0)).map { case (c, rows) =>
      c -> rows.map(_.getSeq[Double](1).toArray)
    }
    val fine = new Array[Array[Array[Double]]](kc)
    import scala.collection.parallel.CollectionConverters._
    (0 until kc).par.foreach { c =>
      fine(c) = byCell.get(c) match {
        case Some(sample) if sample.nonEmpty =>
          kmeansLocal(sample, math.min(finePer, sample.length), iters,
            seed + 31L * c)
        case _ => Array(coarse(c))
      }
    }
    CentroidIndex(coarse, fine)
  }

  /** Nearest-centroid assignment against a [[CentroidIndex]] — the large-k
    * replacement for [[ivfAssign]]'s literal projection. Per row: rank the
    * ≤256 coarse cells with the codegen'd literal proxy, then argmin over
    * the `nprobe` nearest cells' sub-centroids. The fine codebook rides the
    * plan as ONE array literal (a single Literal node — it cannot outgrow
    * whole-stage codegen the way k expanded struct expressions do) and the
    * argmin is a higher-order `aggregate` fold, so assignment stays a
    * shuffle-free, blowup-free projection at any k: no probe-explode row
    * multiplication, no candidate join pushing n vectors through an
    * exchange. Work per row is ~nprobe·(k/kc)·dim ≈ 2√k·dim multiply-adds.
    *
    * Assignment is approximate exactly like IVF search (the true nearest
    * sub-centroid is found iff it lives in a probed coarse cell) and is a
    * deterministic pure function of the vector — rerunning on the same data
    * and seed reproduces every cell bit-for-bit.
    */
  def ivfAssignHierarchical(df: DataFrame, idCol: String, vecCol: String,
                            index: CentroidIndex, nprobe: Int = 2): DataFrame = {
    val fineLit = typedlit[Seq[Seq[(Int, Seq[Double], Double)]]](
      index.fine.zipWithIndex.map { case (subs, c) =>
        subs.zipWithIndex.map { case (fc, j) =>
          (index.offsets(c) + j, fc.toSeq, fc.map(x => x * x).sum)
        }.toSeq
      }.toSeq)
    val v = col("v")
    val probes = slice(distStructs(v, index.coarse), 1,
      math.min(nprobe, index.coarse.length)).getField("cluster")
    val cands = flatten(transform(probes, c => element_at(fineLit, c + 1)))
    val best = aggregate(cands,
      struct(lit(Double.MaxValue).as("d"), lit(-1).as("cluster")),
      (acc, x) => {
        val d = x.getField("_3") - dot(v, x.getField("_2")) * 2
        when(d < acc.getField("d"),
          struct(d.as("d"), x.getField("_1").as("cluster"))).otherwise(acc)
      },
      acc => acc.getField("cluster"))
    df.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("cluster", best)
  }

  /** Distributed Lloyd k-means over the FULL table (vs [[trainCentroids]],
    * which fits on a bounded driver sample for quantizer training): each
    * iteration is ONE Spark job — assignment is a codegen'd projection
    * against the broadcast-as-literal centroids, and the update is a
    * k-row aggregate of per-dimension means — so the cluster-side state is
    * k×(dim+1) scalars per task and the driver holds k×dim doubles, at any
    * data scale. Init draws k seeded sample vectors ([[sampleVectors]]);
    * empty clusters keep their previous centroid, matching
    * [[kmeansLocal]].
    */
  def kmeansFit(df: DataFrame, vecCol: String, k: Int, iters: Int = 5,
                seed: Long = 42L): Array[Array[Double]] = {
    var centroids = sampleVectors(df, vecCol, k, seed)
    require(centroids.length == k,
      s"need at least k=$k non-null vectors, got ${centroids.length}")
    val dim = centroids.head.length
    val vecs = validVecs(df, vecCol, dim).select(asDouble(col(vecCol)).as("v"))
    for (_ <- 0 until iters) {
      val upd = vecs
        .withColumn("cluster",
          element_at(distStructs(col("v"), centroids), 1).getField("cluster"))
        .groupBy(col("cluster"))
        .agg(count(lit(1)).as("n"),
          (0 until dim).map(i => avg(element_at(col("v"), i + 1)).as(s"m$i")): _*)
        .collect()
      val next = centroids.map(_.clone())
      upd.foreach { r =>
        val c = r.getInt(0)
        next(c) = Array.tabulate(dim)(i => r.getDouble(i + 2))
      }
      centroids = next
    }
    centroids
  }

  /** Per-cluster k-means fit summary: size and inertia (within-cluster sum
    * of squared distance) under the final [[kmeansFit]] centroids. The
    * exact squared distance reuses the sorted proxy (‖c‖² − 2·v·c) plus the
    * row's own ‖v‖² — one projection, one k-row aggregate.
    *
    * Output: (cluster, n, inertia) — the corpus-clustering profile that
    * fronts SemDeDup / source-mix analyses.
    */
  def kmeansSummary(df: DataFrame, vecCol: String, k: Int, iters: Int = 5,
                    seed: Long = 42L): DataFrame = {
    val centroids = kmeansFit(df, vecCol, k, iters, seed)
    val best = element_at(distStructs(col("v"), centroids), 1)
    validVecs(df, vecCol, centroids.head.length)
      .select(asDouble(col(vecCol)).as("v"))
      .select(best.getField("cluster").as("cluster"),
        (dot(col("v"), col("v")) + best.getField("d")).as("sqdist"))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"), round(sum(col("sqdist")), 4).as("inertia"))
  }

  /** [[semanticDedup]] with the cluster count scaled to the corpus:
    * `k = clamp(ceil(n / targetCell), kMin, kMax)`, holding the expected
    * cell size — and with it the within-cell candidate-pair volume PER ROW
    * — constant as the corpus grows. A fixed k is the same quadratic shape
    * as fixed-plane LSH (the sf3 scale-stress measured it: BENCH_SF1.md);
    * SemDeDup at LAION scale runs tens of thousands of cells for exactly
    * this reason (Abbas et al. 2023, §3).
    *
    * Assignment picks its physical shape by k: up to `codegenMaxK` (256)
    * the centroids ride the plan as expanded literal struct expressions —
    * the fastest path, and the one whose k·dim terms would outgrow
    * whole-stage codegen past ~256×64 — and beyond it training and
    * assignment switch to the two-level [[CentroidIndex]]
    * ([[kmeansFitHierarchical]] / [[ivfAssignHierarchical]]), which keeps
    * k unclamped to `kMax` = 65536 (268M rows at the default cell before
    * the clamp binds; raise kMax for more — the index is √k-shaped, the
    * cap is just a sanity bound). Below `kMin · targetCell` rows (8192
    * at defaults) k pins at `kMin`, so fixture-scale results are stable
    * and identical to the pinned oracle.
    */
  /** NOTE: like [[embeddingNearDups]], the row-count probe plus the
    * k-means iterations re-evaluate `df`; checkpoint expensive upstream
    * lineage before calling.
    */
  def semanticDedupScaled(df: DataFrame, idCol: String, vecCol: String,
                          tau: Double, targetCell: Int = 1024,
                          kMin: Int = 8, kMax: Int = 65536, iters: Int = 5,
                          seed: Long = 42L, codegenMaxK: Int = 256): DataFrame = {
    val n = df.count()
    val k = math.min(kMax, math.max(kMin,
      math.ceil(n.toDouble / targetCell).toInt))
    if (k <= codegenMaxK) semanticDedup(df, idCol, vecCol, k, tau, iters, seed)
    else {
      val index = kmeansFitHierarchical(df, vecCol, k, iters, seed)
      dedupAssigned(ivfAssignHierarchical(
        validVecs(df, vecCol, index.coarse.head.length),
        idCol, vecCol, index), tau)
    }
  }

  /** SemDeDup (Abbas et al. 2023): semantic deduplication = cluster the
    * embedding space (k-means), then within each cluster drop all but one
    * of every group of near-identical vectors (cosine ≥ `tau`, grouped
    * transitively, min-id canonical). The two scale levers compose: the
    * k-means pass bounds candidate generation to within-cluster pairs, and
    * the within-cluster self-join is skew-guarded ([[SkewJoin.selfPairs]])
    * so a dense cluster grid-splits instead of exploding one task.
    *
    * Output: one row per input vector — (id, cluster, keep) — the dedup
    * verdict joined back onto the full population.
    */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
                    k: Int, tau: Double, iters: Int = 5,
                    seed: Long = 42L): DataFrame = {
    val centroids = kmeansFit(df, vecCol, k, iters, seed)
    dedupAssigned(ivfAssign(validVecs(df, vecCol, centroids.head.length),
      idCol, vecCol, centroids), tau)
  }

  /** Shared SemDeDup tail: within-cell skew-guarded pairs → transitive
    * duplicate clusters → keep-verdict join. `assigned` is (id, v, cluster)
    * from either assignment path.
    */
  private def dedupAssigned(assigned: DataFrame, tau: Double): DataFrame = {
    val pairs = SkewJoin.selfPairs(assigned, Seq("cluster"), "id", Seq("v"))
      .select(col("x_id").as("id_1"), col("y_id").as("id_2"),
        round(cosine(col("x_v"), col("y_v")), 4).as("cosine"))
      .where(col("cosine") >= tau)
    val verdicts = Dedup.duplicateClusters(pairs)
      .select(col("id").as("d_id"), col("cluster_id").as("canonical"))
    assigned.join(verdicts, col("id") === col("d_id"), "left")
      .select(col("id"), col("cluster"),
        coalesce(col("canonical") === col("id"), lit(true)).as("keep"))
  }

  /** IVF-PQ search: the index side stores (cluster, PQ codes) — never the
    * raw vectors, which is what makes a 100 TB embedding index fit in a
    * fraction of the data's footprint. Queries probe `nprobe` coarse cells
    * (exactly [[ivfSearch]]); candidate scoring decodes the codes to their
    * centroid reconstruction inline (asymmetric distance: exact query vs
    * quantized candidate) — a codebook-literal lookup that stays in the
    * projection, no extra shuffle beyond the probe join.
    */
  def ivfSearchPq(queries: DataFrame, candidates: DataFrame,
                  idCol: String, vecCol: String,
                  centroids: Array[Array[Double]],
                  pq: Quantize.PqBooks,
                  nprobe: Int = 2, threshold: Double = 0.3): DataFrame = {
    val index = ivfAssign(candidates, idCol, vecCol, centroids)
      .select(col("id").as("candidate_id"),
        Quantize.pqEncodeExpr(col("v"), pq).as("codes"),
        col("cluster").as("c_cluster"))
    val probes = queries
      .select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("probe", explode(slice(
        distStructs(col("qv"), centroids), 1, nprobe).getField("cluster")))
    // ADC scoring: the reconstruction appears ONCE (the dot product); the
    // candidate's norm comes from per-code norms precomputed driver-side
    // (an m×k literal lookup), so the interpreted decode HOF runs once per
    // candidate row instead of three times inside cosine()
    val dec = Quantize.pqDecodeExpr(col("codes"), pq)
    val codeNormSq = (0 until pq.m).map { i =>
      val norms = pq.books(i).map(c => c.map(x => x * x).sum).toIndexedSeq
      element_at(typedlit(norms), element_at(col("codes"), i + 1) + 1)
    }.reduce(_ + _)
    broadcast(probes)
      .join(index, col("probe") === col("c_cluster") &&
        col("query_id") =!= col("candidate_id"))
      .select(col("query_id"), col("candidate_id"),
        round(dot(col("qv"), dec) / (norm(col("qv")) * sqrt(codeNormSq)), 4)
          .as("cosine"))
      .where(col("cosine") >= threshold)
  }

  /** Per-dimension embedding statistics — the embedding-column QA profile
    * (dead dims, scale imbalance, drift inputs). Values quantize to exact
    * integer MICRO units before aggregation (order-independent long /
    * decimal sums — the repo's hash-stable fixed-point convention; a double
    * sum would depend on partitioning), one posexplode + one groupBy(dim).
    * Output per dimension: n, mean, std (population), min, max, zero_frac
    * (|v| < 0.5 micro — true zeros), all rounded to 4.
    */
  def embeddingStats(df: DataFrame, vecCol: String): DataFrame = {
    val exploded = df.where(col(vecCol).isNotNull)
      .select(posexplode(col(vecCol)).as(Seq("dim", "v")))
      .withColumn("c", round(col("v") * 1e6, 0).cast(LongType))
    exploded.groupBy(col("dim"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("c")).as("s"),
        // widen BEFORE multiplying: c*c in LongType overflows 2^63 once
        // |v| >= ~3037 (ANSI mode turns that into a query-killing
        // ArithmeticException); the decimal-first product matches the
        // oracle's CAST(c AS HUGEINT) * c shape
        sum(col("c").cast(DecimalType(38, 0)) * col("c")).as("ss"),
        min(col("c")).as("mn"),
        max(col("c")).as("mx"),
        sum(when(abs(col("c")) === 0L, 1L).otherwise(0L)).as("z"))
      .select(col("dim"), col("n"),
        round(col("s").cast(DoubleType) / col("n") / 1e6, 4).as("mean"),
        round(sqrt(greatest(
          (col("ss").cast(DoubleType) * col("n") -
            col("s").cast(DoubleType) * col("s")) /
            (col("n").cast(DoubleType) * col("n")), lit(0.0))) / 1e6, 4)
          .as("std"),
        // min/max are EXACT micro integers: emit the bare division (the
        // identical IEEE op in both engines) — rounding them to 4 places
        // lands on decimal ties (…50 micros) where Java's shortest-repr
        // BigDecimal rounding and a binary-value rounding disagree
        (col("mn").cast(DoubleType) / 1e6).as("min_v"),
        (col("mx").cast(DoubleType) / 1e6).as("max_v"),
        round(col("z").cast(DoubleType) / col("n"), 4).as("zero_frac"))
      .orderBy("dim")
  }
}
