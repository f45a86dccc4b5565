package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.{CmsMerge, HeavyHitters, MinhashSig, NgramHashes, NormalizeText, PqEncode, SimhashSig, VectorDot}

/** Engine extension entry point: register native expressions with a session
  * via `spark.sql.extensions=graft.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("ww_vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "ww_vector_dot"),
      (children: Seq[Expression]) => VectorDot(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("ww_minhash"),
      new ExpressionInfo(classOf[MinhashSig].getName, "ww_minhash"),
      (children: Seq[Expression]) =>
        MinhashSig(children.head, children(1), children(2))))
    ext.injectFunction((
      FunctionIdentifier("ww_simhash"),
      new ExpressionInfo(classOf[SimhashSig].getName, "ww_simhash"),
      (children: Seq[Expression]) => SimhashSig(children.head)))
    ext.injectFunction((
      FunctionIdentifier("ww_ngrams"),
      new ExpressionInfo(classOf[NgramHashes].getName, "ww_ngrams"),
      (children: Seq[Expression]) => NgramHashes(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("ww_normalize_text"),
      new ExpressionInfo(classOf[NormalizeText].getName, "ww_normalize_text"),
      (children: Seq[Expression]) =>
        NormalizeText(children.head, children(1), children(2))))
    ext.injectFunction((
      FunctionIdentifier("ww_pq_encode"),
      new ExpressionInfo(classOf[PqEncode].getName, "ww_pq_encode"),
      (children: Seq[Expression]) => PqEncode(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("ww_heavy_hitters"),
      new ExpressionInfo(classOf[HeavyHitters].getName, "ww_heavy_hitters"),
      (children: Seq[Expression]) =>
        HeavyHitters(children.head, children(1)).toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier("ww_cms_merge"),
      new ExpressionInfo(classOf[CmsMerge].getName, "ww_cms_merge"),
      (children: Seq[Expression]) =>
        CmsMerge(children.head).toAggregateExpression()))
  }
}
