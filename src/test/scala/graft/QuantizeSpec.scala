package graft

import org.apache.spark.sql.functions._

import graft.ops.Quantize

/** SQ8 scalar quantization: bounds, code range, reconstruction error. */
class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (1L, Seq(0.0f, 10.0f, 5.0f)),
    (2L, Seq(1.0f, 10.0f, -5.0f)),
    (3L, Seq(0.5f, 10.0f, 0.0f))
  ).toDF("id", "vec")

  test("bounds: per-dimension min/max from one agg; degenerate dim kept") {
    val b = Quantize.sq8Bounds(vecs, "vec", dim = 3)
    assert(b.mins == Seq(0.0, 10.0, -5.0))
    assert(b.maxs == Seq(1.0, 10.0, 5.0))
  }

  test("encode: codes in [0,255], extremes at the ends, degenerate dim codes 0") {
    val b = Quantize.sq8Bounds(vecs, "vec", dim = 3)
    val codes = Quantize.sq8Encode(vecs, "vec", b)
      .select("id", "codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes(1L)(0) == 0 && codes(2L)(0) == 255)
    assert(codes.values.forall(_(1) == 0))          // degenerate dim
    assert(codes(2L)(2) == 0 && codes(1L)(2) == 255)
    assert(codes.values.flatten.forall(c => c >= 0 && c <= 255))
  }

  test("decode error is bounded by half a quantization step per dimension") {
    val b = Quantize.sq8Bounds(vecs, "vec", dim = 3)
    val err = Quantize.sq8Error(vecs, "vec", b)
      .select("id", "max_err").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // worst step: dim 2 spans 10 -> step 10/255, half-step ~0.0196
    // (+5e-7: max_err is rounded to 6dp, which can round up past the bound)
    val halfStep = 10.0 / 255.0 / 2.0 + 5e-7
    assert(err.values.forall(_ <= halfStep), s"errors $err exceed $halfStep")
  }
}
