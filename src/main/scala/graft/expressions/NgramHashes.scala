package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram md5 hashes of a token array computed PER ROW:
  * `ww_ngrams(tokens, n)` → array<string> (distinct, unordered set of
  * lowercase-hex md5 of each space-joined n-gram — identical values to
  * `md5(gram)` over [[graft.ops.Corpus.gramTable]]).
  *
  * The per-row form exists because higher-order-function gram construction
  * re-evaluates the tokenizer per element (the lambda body embeds the token
  * subtree), turning an O(tokens) scan into O(tokens × n) regex work; here
  * the token array is read once and grams assemble in a tight JVM loop.
  * Being a single scalar expression, it also runs on STREAMS, where the
  * window-based gram table cannot (used by streaming decontamination).
  *
  * Documents with fewer than n tokens produce an empty array (a doc without
  * an n-gram cannot share one), matching the batch gram table's
  * `size(toks) >= n` gate.
  *
  * CodegenFallback: same rationale as [[MinhashSig]] — the work is a tight
  * loop the JIT already sees.
  */
case class NgramHashes(first: Expression, second: Expression)
    extends BinaryExpression with CodegenFallback {

  private lazy val n: Int = second.eval().asInstanceOf[Int]
  private val sep = UTF8String.fromString(" ")

  override def left: Expression = first
  override def right: Expression = second

  override def checkInputDataTypes(): TypeCheckResult = first.dataType match {
    case ArrayType(StringType, _)
        if second.foldable && second.dataType == IntegerType =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, int literal)")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = first.nullable

  override def nullSafeEval(tokens: Any, nn: Any): Any = {
    val arr = tokens.asInstanceOf[ArrayData]
    val total = arr.numElements()
    if (total < n) return new GenericArrayData(Array.empty[Any])
    val md = MessageDigest.getInstance("MD5")
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var s = 0
    while (s + n <= total) {
      val parts = Array.tabulate(n)(j => arr.getUTF8String(s + j))
      val gram = UTF8String.concatWs(sep, parts: _*)
      md.reset()
      val digest = md.digest(gram.getBytes)
      val hex = new Array[Byte](32)
      var i = 0
      while (i < 16) {
        val b = digest(i) & 0xff
        hex(2 * i) = Character.forDigit(b >> 4, 16).toByte
        hex(2 * i + 1) = Character.forDigit(b & 0xf, 16).toByte
        i += 1
      }
      seen.add(UTF8String.fromBytes(hex))
      s += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): NgramHashes = copy(first = l, second = r)

  override def prettyName: String = "ww_ngrams"
}
