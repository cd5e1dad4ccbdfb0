package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** The canonical md5-seeded ±1 hyperplane family shared by every
  * SimHash surface (dd07/dd07b bands, st19's streaming signature,
  * ss02/ss05's LSH buckets embed its prefixes as SQL literals): weight
  * of (plane p, dim d) is +1 when the first md5 byte of "p:d" is even,
  * −1 otherwise — deterministic, so DuckDB oracles re-derive every
  * signature bit from the same literals. Prefix-stable by
  * construction (the hash is per plane index): extending the table can
  * never move a plane an existing oracle embedded. */
object SimHashPlanes {
  val MaxPlanes = 120
  val Dims = 64

  val weights: Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(MaxPlanes, Dims) { (p, dim) =>
      val h = md.digest(s"$p:$dim".getBytes("UTF-8"))
      if ((h(0) & 1) == 0) 1.0 else -1.0
    }
  }

  /** The signature kernel — one tight JIT-able loop, called out-of-line
    * from generated code. Bit (p − from) = sign of the plane-p dot,
    * with the dot accumulated in EXACTLY the composed form's IEEE
    * order (left-to-right acc += w·x over dims), so swapping the
    * native expression under an oracle-pinned layout cannot move a
    * single sign. Mirrors the composed form's null semantics too:
    * `CASE WHEN vec_dot(x, plane) > 0 THEN bit ELSE 0` yields bit 0
    * when vec_dot is NULL (length ≠ 64 or a null element), uniformly
    * across planes — hence signature 0. */
  def compute(a: ArrayData, from: Int, until: Int, isFloat: Boolean): Long = {
    val n = a.numElements()
    if (n != Dims) return 0L
    val x = new Array[Double](Dims)
    var d = 0
    while (d < Dims) {
      if (a.isNullAt(d)) return 0L
      x(d) = if (isFloat) a.getFloat(d).toDouble else a.getDouble(d)
      d += 1
    }
    var sig = 0L
    var p = from
    while (p < until) {
      val w = weights(p)
      var acc = 0.0
      var i = 0
      while (i < Dims) { acc += w(i) * x(i); i += 1 }
      if (acc > 0) sig |= 1L << (p - from)
      p += 1
    }
    sig
  }
}

/** Native codegen'd `simhash_sig(vec, from, until)` — planes
  * [from, until) of [[SimHashPlanes]] signed into bits [0, until−from)
  * of one BIGINT. Bit-identical to the composed chain it fuses
  * (Σ_p CASE WHEN vec_dot(vec, plane_p) > 0 THEN 2^p ELSE 0 — the
  * [[graft.operators.Similarity]] sigSpark form, equality
  * property-tested in StorageSimilaritySpec): same plane family, same
  * left-to-right IEEE dot, same null-to-0 semantics (a NULL vector, a
  * null element, or a non-64 length all sign as 0, as the CASE chain
  * did). Why it exists: the composed form generates one method with
  * ~until−from inlined 64-step loops — past ~60 planes that method
  * exceeds the JIT's bytecode ceiling and runs INTERPRETED (measured
  * on the 700k-vector dial-crossing fixture: a single 120-plane
  * signing task burned 390 s of interpreter CPU). This expression is
  * a leaf of whole-stage codegen calling one out-of-line static loop —
  * the signature cost a wide-band layout needs to be viable at scale. */
case class SimHashSig(child: Expression, from: Int, until: Int)
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      if (from < 0 || until <= from || until > SimHashPlanes.MaxPlanes)
        TypeCheckResult.TypeCheckFailure(
          s"simhash_sig plane range [$from, $until) outside [0, ${SimHashPlanes.MaxPlanes})")
      else if (until - from > 60)
        TypeCheckResult.TypeCheckFailure(
          s"one signature word holds at most 60 planes, got ${until - from}")
      else TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_sig requires ARRAY<FLOAT|DOUBLE>, got ${other.catalogString}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L
    else SimHashPlanes.compute(v.asInstanceOf[ArrayData], from, until, isFloat)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        long ${ev.value} = ${c.isNull}
          ? 0L
          : graft.functions.SimHashPlanes.compute(${c.value}, $from, $until, $isFloat);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

object SimHashSig {
  def build(exprs: Seq[Expression]): SimHashSig = {
    if (exprs.length != 3)
      throw new IllegalArgumentException(
        s"simhash_sig(vec, from, until) takes exactly 3 arguments, got ${exprs.length}")
    def intLit(e: Expression, name: String): Int = e match {
      case l if l.foldable => l.eval() match {
        case n: java.lang.Integer => n.intValue()
        case other => throw new IllegalArgumentException(
          s"simhash_sig $name must be an INT literal, got $other")
      }
      case _ => throw new IllegalArgumentException(
        s"simhash_sig $name must be a foldable literal")
    }
    SimHashSig(exprs(0), intLit(exprs(1), "from"), intLit(exprs(2), "until"))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash_sig", build, "scala_udf")
}
