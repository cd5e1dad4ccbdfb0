package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: the sequential dot product of two
  * float/double arrays — bit-for-bit the same arithmetic as the
  * higher-order-function form it replaces,
  *
  *   aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
  *             CAST(0 AS DOUBLE), (acc, v) -> acc + v)
  *
  * including its null semantics (length mismatch pads with null, a null
  * element nulls the product, null + acc is null ⇒ result is NULL), so
  * swapping it under the DuckDB-oracled cosine queries cannot move a
  * single ulp: the accumulation is the identical left-to-right IEEE
  * double chain.
  *
  * Why it exists: zip_with/aggregate are CodegenFallback expressions —
  * every row allocates an intermediate array and walks two lambda
  * closures through the interpreter. This is a leaf of whole-stage
  * codegen instead: one fused loop over the two UnsafeArrayData
  * buffers, no intermediate array, no closure dispatch — the brute-force
  * scoring path (ss01/ss10/dd07 and every ADC/rerank) is exactly the
  * kind of per-row hot loop the build brief says to push into a native
  * Expression when built-ins can't express it efficiently.
  */
case class FloatDot(left: Expression, right: Expression) extends BinaryExpression {

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
        s"vec_dot requires ARRAY<FLOAT|DOUBLE> args, got " +
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
      acc += get(a, i, ta) * get(b, i, tb)
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
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ${getter(a, i, left)} * ${getter(b, i, right)};
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDot =
    copy(left = newLeft, right = newRight)
}

object FloatDot {
  /** Register `vec_dot` in the session's function registry (the
    * GraftExtensions injection makes it session-wide for library users;
    * this per-session hook keeps Verify/Bench self-contained). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => FloatDot(exprs(0), exprs(1)), "scala_udf")
}
