package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared kernel for [[ShingleHashes]] — a static-call target so the
  * generated code pays one method call per ROW (md5 dominates anyway),
  * not an interpreted higher-order lambda per shingle. */
object ShingleHashUtil {
  private val mdPool = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** All DISTINCT 3-token-shingle fingerprints of `text` in one pass.
    *
    * Bit-identical to the exploded SQL form it fuses (the dd02 shingle
    * index):
    *   conv(substring(md5(concat(t[i],' ',t[i+1],' ',t[i+2])),1,15),16,10)
    *     ::long  over  t = split(text, ' '),  then DISTINCT
    * The first 15 hex chars of an md5 are its first 60 bits, i.e. the
    * big-endian first-8-bytes value >>> 4 — no hex-string round trip.
    * split(" ", -1) keeps trailing empty tokens exactly like Spark's
    * regex split; fewer than 3 tokens → empty array (the size(t) >= 3
    * pre-filter becomes vacuous: nothing to explode). */
  def compute(text: UTF8String): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val n = toks.length - 2
    if (n <= 0) return new GenericArrayData(Array.empty[Long])
    val md = mdPool.get()
    val seen = new java.util.HashSet[java.lang.Long](math.max(8, n * 2))
    val out = new Array[Long](n)
    var m = 0
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(
        (toks(i) + " " + toks(i + 1) + " " + toks(i + 2)).getBytes("UTF-8"))
      var v = 0L
      var j = 0
      while (j < 8) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
      v = v >>> 4
      if (seen.add(v)) { out(m) = v; m += 1 }
      i += 1
    }
    new GenericArrayData(if (m == n) out else java.util.Arrays.copyOf(out, m))
  }

  /** Count of common elements of two SORTED arrays (one merge walk).
    * Equals size(array_intersect(a, b)) when both inputs are sorted and
    * duplicate-free — the dd02 verify shape (sort_array over per-doc
    * distinct fingerprints). Null elements sort first under sort_array
    * and match like a value (array_intersect keeps a null present on
    * both sides), so the walk treats "both null" as one common element. */
  def intersectCount(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb && (a.isNullAt(i) || b.isNullAt(j))) {
      // sorted null prefix: both-null is a match, else advance null side
      if (a.isNullAt(i) && b.isNullAt(j)) { c += 1; i += 1; j += 1 }
      else if (a.isNullAt(i)) i += 1
      else j += 1
    }
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

/** Native codegen'd `shingle_hashes(text)` — see [[ShingleHashUtil.compute]].
  *
  * Why it exists (r8 verdict item #3): the shingle-index build was the
  * dominant dd02 cold cost. The exploded form materializes ~55 shingle
  * ROWS per doc and then needs a full-width `(doc_id, h) DISTINCT` —
  * a corpus-sized shuffle whose keys are nearly unique, so map-side
  * partial aggregation removes nothing. Fusing tokenize → shingle →
  * md5-60-bit → DISTINCT into one per-doc loop keeps the dataflow at
  * one row per document and deletes that shuffle outright; the df-count
  * pass then explodes the (much smaller) per-doc distinct arrays. */
case class ShingleHashes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires a STRING arg, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashUtil.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHashUtil.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingle_hashes", exprs => ShingleHashes(exprs(0)), "scala_udf")
}

/** Native codegen'd `sorted_intersect_count(a, b)` — see
  * [[ShingleHashUtil.intersectCount]]. Replaces
  * `size(array_intersect(ha, hb))` in the dd02 verify step:
  * array_intersect builds a hash set PER candidate pair (tens of
  * millions of pairs at sf1), where the sorted merge walk is
  * allocation-free. Only valid on sorted inputs — the verify side
  * builds them with sort_array. */
case class SortedIntersectCount(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "sorted_intersect_count requires two ARRAY<BIGINT> args, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ShingleHashUtil.intersectCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ShingleHashUtil.intersectCount($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_intersect_count", exprs => SortedIntersectCount(exprs(0), exprs(1)), "scala_udf")
}
