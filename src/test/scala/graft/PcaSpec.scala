package graft

import graft.ops.Pca
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("symEig: residual and orthonormality on a random symmetric matrix") {
    val rnd = new scala.util.Random(11)
    val n = 12
    val a = Array.ofDim[Double](n, n)
    for (i <- 0 until n; j <- i until n) {
      val x = rnd.nextGaussian(); a(i)(j) = x; a(j)(i) = x
    }
    val (values, vecs) = Pca.symEig(a)
    // A·v_k = λ_k·v_k for every eigenpair
    for (k <- 0 until n) {
      for (i <- 0 until n) {
        val av = (0 until n).map(j => a(i)(j) * vecs(j)(k)).sum
        assert(math.abs(av - values(k) * vecs(i)(k)) < 1e-8,
          s"residual at ($i,$k)")
      }
    }
    // VᵀV = I
    for (k <- 0 until n; l <- 0 until n) {
      val d = (0 until n).map(i => vecs(i)(k) * vecs(i)(l)).sum
      assert(math.abs(d - (if (k == l) 1.0 else 0.0)) < 1e-9)
    }
    // trace preserved
    val trA = (0 until n).map(i => a(i)(i)).sum
    assert(math.abs(values.sum - trA) < 1e-9)
  }

  test("fit recovers a planted principal direction; projection matches by hand") {
    // points spread along u = (0.6, 0.8, 0) with small noise in other dims
    val rnd = new scala.util.Random(5)
    val rows = (0 until 400).map { _ =>
      val tmain = rnd.nextGaussian() * 10.0
      Array((0.6 * tmain + rnd.nextGaussian() * 0.01).toFloat,
        (0.8 * tmain + rnd.nextGaussian() * 0.01).toFloat,
        (rnd.nextGaussian() * 0.01).toFloat)
    }
    val df = rows.map(Tuple1(_)).toDF("embedding")
    val model = Pca.fit(df, "embedding", dim = 3, k = 2)
    val c0 = model.components(0)
    assert(math.abs(c0(0) - 0.6) < 0.01 && math.abs(c0(1) - 0.8) < 0.01,
      s"first component ${c0.toSeq}")
    assert(c0(1) > 0) // sign convention: largest-|coeff| entry positive
    assert(model.variances(0) > model.variances(1))
    // projection of a hand-picked vector: pc_0 = <v - mean, c0>
    val v = rows.head.map(_.toDouble)
    val expected = (0 until 3)
      .map(i => (v(i) - model.mean(i)) * c0(i)).sum
    val got = Pca.project(df.limit(1), "embedding", model)
      .select(element_at(col("pc"), 1)).as[Double].head()
    assert(math.abs(got - expected) < 1e-9)
  }

  test("whiten: unit variance per retained component") {
    val rnd = new scala.util.Random(9)
    val rows = (0 until 2000).map { _ =>
      Array((rnd.nextGaussian() * 7).toFloat, (rnd.nextGaussian() * 2).toFloat,
        (rnd.nextGaussian() * 0.5).toFloat, rnd.nextGaussian().toFloat)
    }
    val df = rows.map(Tuple1(_)).toDF("embedding")
    val model = Pca.fit(df, "embedding", dim = 4, k = 3)
    val proj = Pca.project(df, "embedding", model, whiten = true)
      .select((1 to 3).map(j => variance(element_at(col("pc"), j))): _*)
      .head()
    for (j <- 0 until 3)
      // sample (n-1) vs population (n) variance: off by n/(n-1) ≈ 1.0005
      assert(math.abs(proj.getDouble(j) - 1.0) < 0.01,
        s"whitened var $j = ${proj.getDouble(j)}")
  }

  test("ragged and null rows are skipped, not crashed on") {
    val df = Seq(
      Some(Array(1.0f, 2.0f)), None, Some(Array(3.0f)),
      Some(Array(2.0f, 1.0f)), Some(Array(0.0f, 0.0f))
    ).toDF("embedding")
    val model = Pca.fit(df, "embedding", dim = 2, k = 1)
    assert(model.mean.length == 2 && model.components.length == 1)
  }
}
