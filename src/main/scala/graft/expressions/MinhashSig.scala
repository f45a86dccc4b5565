package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature of a document computed PER ROW:
  * `ww_minhash(tokens, k, numHashes)` → array<long>.
  *
  * Builds every word k-gram of the token array and folds it into `numHashes`
  * running minima using the two-hash XOR-rotate family
  * (h_i = h1 ⊕ rotl(h2, i)) — bit-identical to the aggregation-based
  * signature path in [[graft.ops.Dedup.minhashSignaturesFromTable]]
  * (h1 = xxhash64(gram), h2 = xxhash64(1L, gram), both seeded 42 like
  * Spark's `xxhash64`).
  *
  * This is the scale-defining form: signatures require NO shuffle at all —
  * the (doc, shingle) pairs never leave the row — where the aggregation form
  * shuffles every shingle of the corpus. Documents with fewer than k tokens
  * hash their whole joined token string (matching the shingle-table
  * convention).
  *
  * CodegenFallback: the per-row work is a tight JVM loop over the token
  * array; generating Java source for the string assembly would not change
  * the inner loop the JIT sees.
  */
case class MinhashSig(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {

  private lazy val k: Int = second.eval().asInstanceOf[Int]
  private lazy val numHashes: Int = third.eval().asInstanceOf[Int]
  // xxhash64(lit(1), gram) chains as hashInt(1, 42) → seed for the gram
  // bytes (the literal is an INTEGER, so Spark hashes it with hashInt)
  private lazy val seed2: Long = XXH64.hashInt(1, 42L)
  private val sep = UTF8String.fromString(" ")

  override def checkInputDataTypes(): TypeCheckResult = first.dataType match {
    case ArrayType(StringType, _)
        if second.foldable && second.dataType == IntegerType &&
          third.foldable && third.dataType == IntegerType =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, int literal, int literal)")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = first.nullable

  override def nullSafeEval(tokens: Any, kk: Any, nn: Any): Any = {
    val arr = tokens.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)

    // may return null — UTF8String.concatWs skips null inputs, matching the
    // SQL concat_ws semantics of the aggregation fallback path
    def tok(i: Int): UTF8String = arr.getUTF8String(i)
    def foldGram(bytes: Array[Byte]): Unit = {
      val h1 = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L)
      val h2 = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, seed2)
      var i = 0
      while (i < numHashes) {
        val h = h1 ^ java.lang.Long.rotateLeft(h2, i)
        if (h < mins(i)) mins(i) = h
        i += 1
      }
    }

    if (n < k) {
      val parts = Array.tabulate(n)(tok)
      foldGram(UTF8String.concatWs(sep, parts: _*).getBytes)
    } else {
      var s = 0
      while (s + k <= n) {
        val parts = Array.tabulate(k)(j => tok(s + j))
        foldGram(UTF8String.concatWs(sep, parts: _*).getBytes)
        s += 1
      }
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): MinhashSig =
    copy(first = f, second = s, third = t)

  override def prettyName: String = "ww_minhash"
}
