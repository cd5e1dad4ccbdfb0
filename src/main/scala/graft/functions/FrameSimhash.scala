package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared kernel for [[FrameSimhash]] — a static-call target so the
  * generated code pays one method call per FRAME (13 md5s dominate),
  * not 32 interpreted higher-order `aggregate()` lambdas per frame
  * (the composed form: Catalyst's higher-order functions never
  * whole-stage-codegen, and the lambda walk priced st21's index build
  * at ~4x the md5 cost). */
object FrameSimhashUtil {
  private val mdPool = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** mm08's per-frame 32-bit SimHash, fused: for each of the frame's 13
    * character 4-grams, the low 32 bits of the md5's first 8 hex chars
    * (= first 4 digest bytes, big-endian unsigned); bit j of the result
    * is set iff the ±1 majority of the 13 gram hashes' bit j is
    * positive. Bit-identical to the exploded SQL form it fuses:
    *   f   = CAST(conv(substring(md5(substring(frame, j+1, 4)),1,8),16,10) AS BIGINT)
    *   sb  = SUM(±1 over j = 0..12 per bit)   (groupBy doc, fi)
    *   ph  = Σ (sb_j > 0) << j
    * Grams past the frame's end mirror SQL substring semantics (the
    * available suffix, possibly empty) so short frames — which the
    * callers never produce (frames are exact 16-char windows) — still
    * agree with the oracle's formula. */
  def compute(frame: UTF8String): Long = {
    val s = frame.toString
    val md = mdPool.get()
    val counts = new Array[Int](32)
    var j = 0
    while (j < 13) {
      val from = math.min(j, s.length)
      val until = math.min(j + 4, s.length)
      md.reset()
      val d = md.digest(s.substring(from, until).getBytes("UTF-8"))
      var v = 0L
      var b = 0
      while (b < 4) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      var k = 0
      while (k < 32) {
        counts(k) += (if (((v >> k) & 1L) == 1L) 1 else -1)
        k += 1
      }
      j += 1
    }
    var ph = 0L
    var k = 0
    while (k < 32) { if (counts(k) > 0) ph |= 1L << k; k += 1 }
    ph
  }
}

/** Native codegen'd `frame_simhash32(frame)` — see
  * [[FrameSimhashUtil.compute]]. Exists for st21's map-only stream
  * signing: the composed higher-order-function form evaluated 32
  * interpreted `aggregate()` lambdas per frame. */
case class FrameSimhash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"frame_simhash32 requires a STRING arg, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    FrameSimhashUtil.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FrameSimhashUtil.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): FrameSimhash =
    copy(child = newChild)
}

object FrameSimhash {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "frame_simhash32", exprs => FrameSimhash(exprs.head), "scala_udf")
}
