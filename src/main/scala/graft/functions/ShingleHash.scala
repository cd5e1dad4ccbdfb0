package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared kernel for [[ShingleHashes]] — a static-call target so the
  * generated code pays one method call per ROW (md5 dominates anyway),
  * not an interpreted higher-order lambda per shingle. */
object ShingleHashUtil {
  private val mdPool = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** All DISTINCT n-token-shingle fingerprints of `text` in one pass
    * (n = 3 for the dd02 index, 8 for the dd09/dd11 span grams).
    *
    * Bit-identical to the exploded SQL form it fuses:
    *   conv(substring(md5(concat_ws(' ', t[i..i+n-1])),1,15),16,10)
    *     ::long  over  t = split(text, ' '),  then DISTINCT
    * The first 15 hex chars of an md5 are its first 60 bits, i.e. the
    * big-endian first-8-bytes value >>> 4 — no hex-string round trip.
    * split(" ", -1) keeps trailing empty tokens exactly like Spark's
    * regex split; fewer than n tokens → empty array (the size(t) >= n
    * pre-filter becomes vacuous: nothing to explode). */
  def compute(text: UTF8String, gram: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val n = toks.length - gram + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Long])
    val md = mdPool.get()
    val seen = new java.util.HashSet[java.lang.Long](math.max(8, n * 2))
    val out = new Array[Long](n)
    val sb = new java.lang.StringBuilder(gram * 12)
    var m = 0
    var i = 0
    while (i < n) {
      md.reset()
      sb.setLength(0)
      var k = 0
      while (k < gram) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      val d = md.digest(sb.toString.getBytes("UTF-8"))
      var v = 0L
      var j = 0
      while (j < 8) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
      v = v >>> 4
      if (seen.add(v)) { out(m) = v; m += 1 }
      i += 1
    }
    new GenericArrayData(if (m == n) out else java.util.Arrays.copyOf(out, m))
  }

  /** Per-doc n-gram postings for [[ShingleStats]]: one struct
    * (h, within-doc count, first position) per DISTINCT n-gram, in
    * first-occurrence order. */
  def computeStats(text: UTF8String, gram: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val n = toks.length - gram + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    val md = mdPool.get()
    // h -> index into the packed (cnt, pos) arrays, first-occurrence order
    val idx = new java.util.HashMap[java.lang.Long, Integer](math.max(8, n * 2))
    val hs = new Array[Long](n)
    val cnts = new Array[Long](n)
    val poss = new Array[Int](n)
    val sb = new java.lang.StringBuilder(gram * 12)
    var m = 0
    var i = 0
    while (i < n) {
      md.reset()
      sb.setLength(0)
      var k = 0
      while (k < gram) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      val d = md.digest(sb.toString.getBytes("UTF-8"))
      var v = 0L
      var j = 0
      while (j < 8) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
      v = v >>> 4
      val at = idx.get(v)
      if (at == null) {
        idx.put(v, m)
        hs(m) = v; cnts(m) = 1L; poss(m) = i
        m += 1
      } else cnts(at) += 1L
      i += 1
    }
    val out = new Array[Any](m)
    var r = 0
    while (r < m) {
      out(r) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](hs(r), cnts(r), poss(r)))
      r += 1
    }
    new GenericArrayData(out)
  }

  private val HexChars = "0123456789abcdef".toCharArray

  /** k MinHash signature components for [[MinHashSigs]]. */
  def minhashSigs(text: UTF8String, k: Int): ArrayData = {
    val hs = compute(text, 3)
    val n = hs.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val md = mdPool.get()
    val out = new Array[Any](k)
    var i = 0
    while (i < k) {
      val prefix = (i.toString + ":").getBytes("UTF-8")
      var best: Array[Byte] = null
      var j = 0
      while (j < n) {
        md.reset()
        md.update(prefix)
        md.update(java.lang.Long.toString(hs.getLong(j)).getBytes("UTF-8"))
        val d = md.digest()
        if (best == null || {
          // unsigned byte compare == lexicographic hex compare
          var c = 0
          var lt = false
          var done = false
          while (c < 16 && !done) {
            val a = d(c) & 0xff
            val b = best(c) & 0xff
            if (a != b) { lt = a < b; done = true }
            c += 1
          }
          done && lt
        }) best = d
        j += 1
      }
      val hex = new Array[Char](32)
      var b = 0
      while (b < 16) {
        hex(2 * b) = HexChars((best(b) >> 4) & 0xf)
        hex(2 * b + 1) = HexChars(best(b) & 0xf)
        b += 1
      }
      out(i) = UTF8String.fromString(new String(hex))
      i += 1
    }
    new GenericArrayData(out)
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
case class ShingleHashes(child: Expression, gram: Int = 3) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires a STRING arg, got ${child.dataType.catalogString}")
    else if (gram < 1) TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes gram size must be >= 1, got $gram")
    else TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashUtil.compute(input.asInstanceOf[UTF8String], gram)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHashUtil.compute($c, $gram)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  /** `shingle_hashes(text[, n])` — n must be a foldable integer literal
    * (it shapes the generated code), defaulting to the dd02 trigram. */
  def build(exprs: Seq[Expression]): ShingleHashes = {
    if (exprs.isEmpty || exprs.length > 2)
      throw new IllegalArgumentException(
        s"shingle_hashes(text[, n]) takes 1 or 2 arguments, got ${exprs.length}")
    val gram = if (exprs.length == 1) 3 else exprs(1) match {
      case e if e.foldable =>
        e.eval() match {
          case n: java.lang.Integer => n.intValue()
          case other => throw new IllegalArgumentException(
            s"shingle_hashes gram size must be an INT literal, got $other")
        }
      case _ => throw new IllegalArgumentException(
        "shingle_hashes gram size must be a foldable literal")
    }
    ShingleHashes(exprs(0), gram)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingle_hashes", build, "scala_udf")
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

/** Native codegen'd `shingle_stats(text, n)` — per-doc inverted-index
  * postings in one pass: for every DISTINCT n-gram of the doc, a
  * struct (h: the 60-bit md5 fingerprint, cnt: occurrences within the
  * doc, pos: first token position). Semantically identical to
  * exploding every span and aggregating GROUP BY (h, doc) — but that
  * level-1 aggregate is near-unique-keyed (grams rarely repeat within
  * a doc), so it shuffles the whole span table to remove almost
  * nothing; this kernel builds the postings in-map and leaves ONE
  * exchange (the per-h merge) in the plan. dd11's repeated-passage
  * detector is the consumer. */
case class ShingleStats(child: Expression, gram: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("h", LongType, nullable = false),
      StructField("cnt", LongType, nullable = false),
      StructField("pos", IntegerType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"shingle_stats requires a STRING arg, got ${child.dataType.catalogString}")
    else if (gram < 1) TypeCheckResult.TypeCheckFailure(
      s"shingle_stats gram size must be >= 1, got $gram")
    else TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashUtil.computeStats(input.asInstanceOf[UTF8String], gram)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHashUtil.computeStats($c, $gram)")

  override protected def withNewChildInternal(newChild: Expression): ShingleStats =
    copy(child = newChild)
}

object ShingleStats {
  def build(exprs: Seq[Expression]): ShingleStats = {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"shingle_stats(text, n) takes exactly 2 arguments, got ${exprs.length}")
    val gram = exprs(1) match {
      case e if e.foldable =>
        e.eval() match {
          case n: java.lang.Integer => n.intValue()
          case other => throw new IllegalArgumentException(
            s"shingle_stats gram size must be an INT literal, got $other")
        }
      case _ => throw new IllegalArgumentException(
        "shingle_stats gram size must be a foldable literal")
    }
    ShingleStats(exprs(0), gram)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingle_stats", build, "scala_udf")
}

/** Native codegen'd `minhash_sigs(text, k)` — the st14 signature kernel:
  * per-doc distinct 3-gram fingerprints (the [[ShingleHashUtil.compute]]
  * derivation) reduced to k MinHash components, component i being
  * MIN(md5(i ||':'|| h)) as a lowercase-hex STRING. Bit-identical to the
  * scalar HOF chain it fuses (array_distinct(transform(...md5...)) +
  * k × array_min(transform(shs, h -> md5(...)))) — which ran ~(k+1)·|shs|
  * INTERPRETED md5-on-string lambdas per document, the dominant st14
  * cost at sf1. Min over the 16 digest bytes compared unsigned is
  * exactly min over the hex strings (hex preserves unsigned byte
  * order). Empty shingle sets (under 3 tokens) return an empty array —
  * callers filter those docs out, as the HOF form did. */
case class MinHashSigs(child: Expression, k: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs requires a STRING arg, got ${child.dataType.catalogString}")
    else if (k < 1) TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs k must be >= 1, got $k")
    else TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashUtil.minhashSigs(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHashUtil.minhashSigs($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}

object MinHashSigs {
  def build(exprs: Seq[Expression]): MinHashSigs = {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"minhash_sigs(text, k) takes exactly 2 arguments, got ${exprs.length}")
    val k = exprs(1) match {
      case e if e.foldable =>
        e.eval() match {
          case n: java.lang.Integer => n.intValue()
          case other => throw new IllegalArgumentException(
            s"minhash_sigs k must be an INT literal, got $other")
        }
      case _ => throw new IllegalArgumentException(
        "minhash_sigs k must be a foldable literal")
    }
    MinHashSigs(exprs(0), k)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sigs", build, "scala_udf")
}
