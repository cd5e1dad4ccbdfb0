package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{FloatDot, FloatL2, FloatSq8, FrameSimhash, PerceptualHash, PolyHash, SimHashSig, TopKIds, TopKVals}

/** SparkSessionExtensions entry point — the idiomatic deployment path
  * for this engine's native expressions: users add
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * (or `.withExtensions(new GraftExtensions)`) and `poly_hash` /
  * `top_k_ids` are first-class functions in every session, SQL included
  * — no per-session registration call. Kept minimal on purpose: the
  * engine needs no custom Rule/Strategy (SURVEY.md §4 — every reference
  * operator maps to built-ins/ml stages), so the only injection is the
  * function library.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
      (children: Seq[Expression]) => PolyHash(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("top_k_ids"),
      new ExpressionInfo(classOf[TopKIds].getName, "top_k_ids"),
      (children: Seq[Expression]) => TopKIds.build(children)))
    ext.injectFunction((
      new FunctionIdentifier("top_k_vals"),
      new ExpressionInfo(classOf[TopKVals].getName, "top_k_vals"),
      (children: Seq[Expression]) => TopKVals.build(children)))
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatDot].getName, "vec_dot"),
      (children: Seq[Expression]) => FloatDot(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("vec_l2sq"),
      new ExpressionInfo(classOf[FloatL2].getName, "vec_l2sq"),
      (children: Seq[Expression]) => FloatL2(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("vec_sq8"),
      new ExpressionInfo(classOf[FloatSq8].getName, "vec_sq8"),
      (children: Seq[Expression]) => FloatSq8(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("simhash_sig"),
      new ExpressionInfo(classOf[SimHashSig].getName, "simhash_sig"),
      (children: Seq[Expression]) => SimHashSig.build(children)))
    ext.injectFunction((
      new FunctionIdentifier("frame_simhash32"),
      new ExpressionInfo(classOf[FrameSimhash].getName, "frame_simhash32"),
      (children: Seq[Expression]) => FrameSimhash(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("perceptual_hash120"),
      new ExpressionInfo(classOf[PerceptualHash].getName, "perceptual_hash120"),
      (children: Seq[Expression]) => PerceptualHash(children.head)))
  }
}
