package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.CountMinSketch

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

/** `ww_cms_merge(sketch_binary)` → binary — union of Count–Min sketches
  * (Cormode & Muthukrishnan 2005) in the serialized format Spark's
  * built-in `count_min_sketch(col, eps, confidence, seed)` aggregate
  * emits, so batch profiles can carry a per-column frequency sketch and
  * later MERGE without rescanning any batch — the point-frequency
  * complement to `hll_union_agg` (distincts) and `kll_merge_agg_double`
  * (quantiles), which Spark ships union aggregates for while CMS has
  * none.
  *
  * CMS cells are counters, so union = cell-wise addition
  * (`CountMinSketch.mergeInPlace`); sketches must share (depth, width,
  * seed) — built with identical literal parameters, which the profile
  * API guarantees — or the underlying merge throws. Null inputs (an
  * empty batch's sketch column) are skipped. Memory per group is one
  * depth×width counter table regardless of the column's cardinality; the
  * shuffle carries one serialized sketch per (partition, group).
  */
case class CmsMerge(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Option[CountMinSketch]] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary count_min_sketch column, got $t")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "ww_cms_merge"

  override def createAggregationBuffer(): Option[CountMinSketch] = None

  private def read(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))

  private def combine(acc: Option[CountMinSketch],
                      cms: CountMinSketch): Option[CountMinSketch] =
    acc match {
      case Some(a) => a.mergeInPlace(cms); acc
      case None => Some(cms)
    }

  override def update(acc: Option[CountMinSketch],
                      input: InternalRow): Option[CountMinSketch] = {
    val v = child.eval(input)
    if (v == null) acc
    else combine(acc, read(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(acc: Option[CountMinSketch],
                     other: Option[CountMinSketch]): Option[CountMinSketch] =
    other.fold(acc)(combine(acc, _))

  override def eval(acc: Option[CountMinSketch]): Any =
    acc.map { cms =>
      val bos = new ByteArrayOutputStream()
      cms.writeTo(bos)
      bos.toByteArray
    }.orNull

  override def serialize(acc: Option[CountMinSketch]): Array[Byte] =
    eval(acc) match {
      case null => Array.emptyByteArray
      case b: Array[Byte] => b
    }

  override def deserialize(bytes: Array[Byte]): Option[CountMinSketch] =
    if (bytes.isEmpty) None else Some(read(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsMerge =
    copy(child = newChildren(0))
}
