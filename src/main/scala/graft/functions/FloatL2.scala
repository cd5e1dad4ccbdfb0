package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: the sequential SQUARED L2 distance of two
  * float/double arrays — bit-for-bit the same arithmetic as the
  * higher-order-function form it replaces,
  *
  *   aggregate(zip_with(a, b, (x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)),
  *             CAST(0 AS DOUBLE), (acc, v) -> acc + v)
  *
  * including its null semantics (length mismatch ⇒ NULL, any null element
  * ⇒ NULL), so swapping it under the IVF probe paths cannot move a cell
  * assignment by even an ulp: the accumulation is the identical
  * left-to-right IEEE double chain of (x−y)² terms.
  *
  * Why it exists (r7 verdict item #3): the centroid-assignment probe the
  * IVF family shares (ss04/ss05/ss09/ss10b/dd14) paid the CodegenFallback
  * zip_with/aggregate interpreter per row per centroid — the same HOF
  * pair the r5 A/B measured 5.6× slower than [[FloatDot]] on the cosine
  * family. This is the [[FloatDot]] sibling for the distance half: a leaf
  * of whole-stage codegen, one fused loop over the two UnsafeArrayData
  * buffers, no intermediate array, no closure dispatch.
  */
case class FloatL2(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemType(dt: DataType): Option[DataType] = dt match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left.dataType), elemType(right.dataType)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"vec_l2sq requires ARRAY<FLOAT|DOUBLE> args, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }

  @inline private def get(a: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType => a.getFloat(i).toDouble
    case _ => a.getDouble(i)
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val ta = elemType(left.dataType).get
    val tb = elemType(right.dataType).get
    var acc = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val dxy = get(a, i, ta) - get(b, i, tb)
      acc += dxy * dxy
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      def getter(arr: String, i: String, side: Expression): String =
        elemType(side.dataType).get match {
          case FloatType => s"(double) $arr.getFloat($i)"
          case _ => s"$arr.getDouble($i)"
        }
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val dxy = ctx.freshName("dxy")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $dxy = ${getter(a, i, left)} - ${getter(b, i, right)};
         |    $acc += $dxy * $dxy;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatL2 =
    copy(left = newLeft, right = newRight)
}

object FloatL2 {
  /** Register `vec_l2sq` in the session's function registry. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_l2sq", exprs => FloatL2(exprs(0), exprs(1)), "scala_udf")
}
