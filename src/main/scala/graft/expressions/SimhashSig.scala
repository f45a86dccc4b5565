package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** 60-bit SimHash of a token array computed PER ROW: `ww_simhash(tokens)` →
  * long. Bit-identical to the aggregation path in [[graft.ops.Dedup.simhash]]
  * (token hash = first 15 md5 hex chars as a 60-bit int; per-bit ±1 votes;
  * bit set when the vote is positive) — but with NO explode and NO shuffle:
  * a document's votes never leave its row. Engine-portable by construction
  * (md5 is universal).
  */
case class SimhashSig(child: Expression)
    extends UnaryExpression with CodegenFallback {

  import SimhashSig.Bits

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(tokens: Any): Any = {
    val arr = tokens.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](Bits)
    val md = SimhashSig.digest.get()
    var t = 0
    while (t < n) {
      val u = arr.getUTF8String(t)
      if (u != null) {
        md.reset()
        val hexBytes = md.digest(u.getBytes)
        // first 15 hex chars = the top 7.5 bytes of the digest
        var h = 0L
        var i = 0
        while (i < 7) { h = (h << 8) | (hexBytes(i) & 0xFFL); i += 1 }
        h = (h << 4) | ((hexBytes(7) & 0xF0L) >> 4)
        var b = 0
        while (b < Bits) {
          if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      t += 1
    }
    var sig = 0L
    var b = 0
    while (b < Bits) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): SimhashSig =
    copy(child = newChild)

  override def prettyName: String = "ww_simhash"
}

object SimhashSig {
  val Bits = 60
  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
}
