package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

/** Misra–Gries heavy-hitters summary state: at most `capacity` tracked
  * values with lower-bound counts, plus the total decrement applied so far
  * (the per-key over-/under-count bound).
  */
final class HeavyHittersState(
    val counts: mutable.HashMap[UTF8String, Long] = mutable.HashMap.empty,
    var decremented: Long = 0L)

/** `ww_heavy_hitters(value, capacity)` → array<struct<value, count_lo,
  * count_hi>> — bounded-memory frequent-items aggregate (Misra–Gries /
  * mergeable-summaries form, Agarwal et al. 2012 §3).
  *
  * Why a native [[TypedImperativeAggregate]]: exact top-k via
  * `groupBy(col).count` keeps one hash-map entry per DISTINCT value on the
  * aggregation side — at 100 TB a high-cardinality column (URLs, user ids,
  * shingles) makes that state the bottleneck, and the groupBy itself
  * shuffles every distinct key. This aggregate holds at most `capacity`
  * counters per partial buffer, combines map-side (partial aggregation
  * applies as with any Catalyst aggregate), and ships only
  * `capacity`-sized summaries through the shuffle — constant memory and
  * shuffle volume regardless of cardinality.
  *
  * Guarantees (standard Misra–Gries): every value with true frequency
  * > N/(capacity+1) is present; reported `count_lo` ≤ true count ≤
  * `count_hi` = count_lo + total decrements. When the column's distinct
  * count never exceeds `capacity` (in any partial buffer or merge), no
  * decrement ever fires and every count is EXACT with count_lo = count_hi —
  * the regime the DuckDB oracle pins. In the lossy regime counts depend on
  * arrival order (like any MG sketch); the bounds still hold.
  *
  * Output is sorted (count_lo desc, value asc) for deterministic
  * presentation.
  */
case class HeavyHitters(
    child: Expression,
    capacityExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[HeavyHittersState] {

  private lazy val capacity: Int = capacityExpr.eval().asInstanceOf[Int]

  override def children: Seq[Expression] = Seq(child, capacityExpr)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType
        if capacityExpr.foldable && capacityExpr.dataType == IntegerType =>
      val c = capacityExpr.eval()
      if (c != null && c.asInstanceOf[Int] > 0) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName capacity must be a positive int literal")
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, int literal), got ${child.dataType}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("value", StringType),
    StructField("count_lo", LongType, nullable = false),
    StructField("count_hi", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "ww_heavy_hitters"

  override def createAggregationBuffer(): HeavyHittersState = new HeavyHittersState()

  /** Misra–Gries trim: keep the `capacity` largest counters, subtracting
    * the (capacity+1)-th largest count from every survivor (the mergeable
    * form — one bulk decrement instead of repeated unit decrements).
    */
  private def trim(s: HeavyHittersState): Unit = {
    if (s.counts.size <= capacity) return
    val sorted = s.counts.toArray.sortInPlaceBy(-_._2)
    val cut = sorted(capacity)._2
    s.counts.clear()
    var i = 0
    while (i < capacity) {
      val (k, c) = sorted(i)
      if (c > cut) s.counts.update(k, c - cut)
      i += 1
    }
    s.decremented += cut
  }

  override def update(s: HeavyHittersState, input: InternalRow): HeavyHittersState = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String]
      s.counts.get(key) match {
        case Some(c) => s.counts.update(key, c + 1)
        case None =>
          // clone: unsafe-row-backed UTF8String buffers are reused per row
          s.counts.update(key.clone(), 1L)
          trim(s)
      }
    }
    s
  }

  override def merge(s: HeavyHittersState, other: HeavyHittersState): HeavyHittersState = {
    other.counts.foreach { case (k, c) =>
      s.counts.update(k, s.counts.getOrElse(k, 0L) + c)
    }
    s.decremented += other.decremented
    trim(s)
    s
  }

  override def eval(s: HeavyHittersState): Any = {
    val sorted = s.counts.toArray.sortInPlace()(Ordering.by {
      case (k, c) => (-c, k)
    })
    new GenericArrayData(sorted.map { case (k, c) =>
      InternalRow(k, c, c + s.decremented)
    })
  }

  override def serialize(s: HeavyHittersState): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(s.counts.size)
    s.counts.foreach { case (k, c) =>
      val b = k.getBytes
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.writeLong(s.decremented)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): HeavyHittersState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val s = new HeavyHittersState()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      s.counts.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    s.decremented = in.readLong()
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHitters =
    copy(child = newChildren(0), capacityExpr = newChildren(1))
}
