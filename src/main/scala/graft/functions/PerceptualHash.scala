package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared kernel for [[PerceptualHash]] — a static-call target so the
  * generated code pays one call per DOCUMENT. Exists (r18) because the
  * composed perceptual-hash dataflow paid TWO corpus-wide exchanges
  * per build: explode tiles → `(doc_id, h) DISTINCT` (shuffle 1) →
  * per-doc groupBy with 60/120 bit-sum aggregates (shuffle 2). The
  * per-doc tile set is bounded by the payload size, so the whole
  * chain fuses into one map-side loop — mm07/dd17/sp12's hash build
  * becomes embarrassingly parallel with no exchange at all. */
object PerceptualHashUtil {
  private val mdPool = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val HexChars = "0123456789abcdef".toCharArray

  /** The 120-bit perceptual fingerprint of a payload as [ph, ph_hi] —
    * bit-identical to the exploded SQL form it fuses (mm07's
    * perceptualHashBanded):
    *
    *   tiles: substring(text, i*16+1, 16), i = 0 .. len div 16 − 1
    *   h   = conv(substring(md5(tile), 1, 15), 16, 10)   (60-bit), DISTINCT per doc
    *   md  = md5(CAST(h AS STRING))
    *   f   = conv(md[9..15], 16, 10) · 2^32 + conv(md[1..8], 16, 10)
    *   f2  = conv(md[24..30], 16, 10) · 2^32 + conv(md[16..23], 16, 10)
    *   ph  bit j (0..59)  = majority over distinct tiles of f  bit j
    *   ph_hi bit j        = majority over distinct tiles of f2 bit j
    *
    * Narrow-mode callers (r ≤ 15) simply ignore ph_hi — both words
    * come from the SAME md5 call, so computing the second is free
    * relative to the digest. A payload with no full 16-char tile
    * (callers pre-filter length ≥ 16, so this never fires in the
    * dataflow) yields an EMPTY array, not null — defineCodeGen's
    * generated code propagates only the child's nullness. */
  def compute(text: UTF8String): ArrayData = {
    val s = text.toString
    val n = s.length / 16
    if (n == 0) return new GenericArrayData(Array.empty[Long])
    val md = mdPool.get()
    val seen = new java.util.HashSet[java.lang.Long](math.max(8, n * 2))
    val counts = new Array[Int](120)
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(s.substring(i * 16, i * 16 + 16).getBytes("UTF-8"))
      var v = 0L
      var j = 0
      while (j < 8) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
      v = v >>> 4
      if (seen.add(v)) {
        md.reset()
        val d2 = md.digest(java.lang.Long.toString(v).getBytes("UTF-8"))
        val hex = new Array[Char](32)
        var b = 0
        while (b < 16) {
          hex(2 * b) = HexChars((d2(b) >> 4) & 0xf)
          hex(2 * b + 1) = HexChars(d2(b) & 0xf)
          b += 1
        }
        val hx = new String(hex)
        val f = java.lang.Long.parseLong(hx.substring(8, 15), 16) * 4294967296L +
          java.lang.Long.parseLong(hx.substring(0, 8), 16)
        val f2 = java.lang.Long.parseLong(hx.substring(23, 30), 16) * 4294967296L +
          java.lang.Long.parseLong(hx.substring(15, 23), 16)
        var k = 0
        while (k < 60) {
          counts(k) += (if (((f >> k) & 1L) == 1L) 1 else -1)
          k += 1
        }
        while (k < 120) {
          counts(k) += (if (((f2 >> (k - 60)) & 1L) == 1L) 1 else -1)
          k += 1
        }
      }
      i += 1
    }
    var ph = 0L
    var phHi = 0L
    var k = 0
    while (k < 60) { if (counts(k) > 0) ph |= 1L << k; k += 1 }
    while (k < 120) { if (counts(k) > 0) phHi |= 1L << (k - 60); k += 1 }
    new GenericArrayData(Array(ph, phHi))
  }
}

/** Native codegen'd `perceptual_hash120(text)` — see
  * [[PerceptualHashUtil.compute]]. */
case class PerceptualHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"perceptual_hash120 requires a STRING arg, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    PerceptualHashUtil.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PerceptualHashUtil.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): PerceptualHash =
    copy(child = newChild)
}

object PerceptualHash {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "perceptual_hash120", exprs => PerceptualHash(exprs.head), "scala_udf")
}
