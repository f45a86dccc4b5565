package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Banded Hamming-distance pair generation over fixed-width bit signatures
  * (dHash, audio envelope hash, any ≤63-bit fingerprint): the shared core
  * of the perceptual near-dup family.
  */
object Hamming {

  /** All id pairs whose signatures differ in at most `maxDist` bits.
    * Input: (id, sig) rows, sig a non-negative long of `bits` bits.
    *
    * Banding into maxDist+1 chunks gives EXACT recall by pigeonhole
    * (distance ≤ maxDist ⇒ some chunk identical); candidates materialize
    * only inside shared-chunk buckets, skew-guarded by the grid-split
    * self-join — never an all-pairs join, so the shape scales like the
    * MinHash/SimHash family. Output: (id_1, id_2, hamming), id_1 < id_2.
    */
  def pairs(sigs: DataFrame, bits: Int, maxDist: Int,
            idCol: String = "id", sigCol: String = "sig"): DataFrame = {
    require(bits > 0 && bits < 64, s"bits must be in 1..63, got $bits")
    require(maxDist >= 0 && maxDist < bits, s"bad maxDist $maxDist")
    val nChunks = maxDist + 1
    // even bit distribution: chunk j covers [j·bits/n, (j+1)·bits/n) — every
    // chunk non-empty for any maxDist < bits (a fixed ceil width would push
    // trailing chunks past the signature and break the pigeonhole guarantee)
    val bounds = (0 to nChunks).map(j => j * bits / nChunks)
    val base = sigs.select(col(idCol).as("id"), col(sigCol).as("sig"))
      .where(col("sig").isNotNull)
    val chunks = base.select(col("id"), col("sig"),
      explode(array((0 until nChunks).map { j =>
        val lo = bounds(j); val w = bounds(j + 1) - lo
        struct(lit(j).as("chunk"),
          shiftright(col("sig"), lo)
            .bitwiseAND((1L << w) - 1L).as("v"))
      }: _*)).as("c"))
      .select(col("id"), col("sig"),
        col("c.chunk").as("chunk"), col("c.v").as("v"))
    // filter BEFORE distinct: each candidate appears once per shared chunk
    // and most exceed maxDist — the distinct should only shuffle actual
    // matches (hamming is a pure function of the pair, so order is free)
    SkewJoin.selfPairs(chunks, Seq("chunk", "v"), "id", Seq("sig"))
      .select(col("x_id").as("id_1"), col("y_id").as("id_2"),
        bit_count(col("x_sig").bitwiseXOR(col("y_sig")))
          .cast(LongType).as("hamming"))
      .where(col("hamming") <= maxDist)
      .distinct()
  }
}
