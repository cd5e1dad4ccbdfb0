package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** [[TopKIds]]'s value-returning sibling: `top_k_vals(value, id, k)`
  * keeps the k largest (value, id) pairs per group and returns the
  * VALUES ordered by (value DESC, id ASC) — the id is the tie-break,
  * exactly like the window form `row_number() over (order by value
  * desc, id asc) <= k` projecting the value column.
  *
  * Why it exists (r8): the margin-mining normalizers (top-4 cosine
  * means per source / per target, Artetxe & Schwenk margin scoring)
  * were computed by ranking EVERY candidate pair with two row_number
  * windows — two full shuffles+sorts of the pair table, which at 30×
  * bench scale is ~10⁸ rows. As a map-side-partial aggregate each
  * partition sends at most k values per key into the shuffle, the
  * scale-correct shape whenever rows-per-key ≫ k.
  *
  * Determinism: insertion/eviction uses the same (value DESC, id ASC)
  * total order as the output, so results are partitioning-independent
  * and bit-identical to the window form's top-k slice.
  */
case class TopKVals(
    valueExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[(Double, Long)]] {

  type Buf = scala.collection.mutable.ArrayBuffer[(Double, Long)]

  override def children: Seq[Expression] = Seq(valueExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (valueExpr.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"top_k_vals value must be DOUBLE, got ${valueExpr.dataType.sql}")
    else if (idExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"top_k_vals id must be BIGINT, got ${idExpr.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): Buf =
    scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]

  /** true if a ranks before b in (value DESC, id ASC) order. Total even
    * under NaN (java.lang.Double.compare = Spark's sort semantics:
    * NaN greatest → NaN-first under DESC), so results stay
    * partitioning-independent when values are non-finite. */
  private def beats(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    c > 0 || (c == 0 && a._2 < b._2)
  }

  private def insert(buf: Buf, v: Double, id: Long): Buf = {
    val cand = (v, id)
    if (buf.length < k) buf += cand
    else {
      var worst = 0
      var i = 1
      while (i < buf.length) {
        if (beats(buf(worst), buf(i))) worst = i
        i += 1
      }
      if (beats(cand, buf(worst))) buf(worst) = cand
    }
    buf
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = valueExpr.eval(input)
    val id = idExpr.eval(input)
    if (v == null || id == null) buf
    else insert(buf, v.asInstanceOf[Double], id.asInstanceOf[Long])
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    other.foreach { case (v, id) => insert(buf, v, id) }
    buf
  }

  override def eval(buf: Buf): Any = {
    val sorted = buf.sortWith(beats).map(_._1).toArray
    new GenericArrayData(sorted)
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { case (v, id) => out.writeDouble(v); out.writeLong(id) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    (1 to n).foreach(_ => buf += ((in.readDouble(), in.readLong())))
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKVals =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKVals =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKVals =
    copy(valueExpr = newChildren(0), idExpr = newChildren(1))
}

object TopKVals {
  /** Builder mirroring [[TopKIds.build]]'s validation. */
  def build(exprs: Seq[Expression]): TopKVals = {
    import org.apache.spark.sql.catalyst.expressions.Cast
    if (exprs.length != 3)
      throw new IllegalArgumentException(
        s"top_k_vals(value, id, k) requires exactly 3 arguments, got ${exprs.length}")
    val k = exprs(2) match {
      case e if e.foldable =>
        e.eval() match {
          case n: java.lang.Integer => n.intValue()
          case n: java.lang.Short => n.intValue()
          case n: java.lang.Byte => n.intValue()
          case n: java.lang.Long if n.longValue() == n.intValue() => n.intValue()
          case other => throw new IllegalArgumentException(
            s"top_k_vals k must be an integer literal within Int range, got $other")
        }
      case _ => throw new IllegalArgumentException(
        "top_k_vals k must be a foldable literal integer")
    }
    if (k <= 0)
      throw new IllegalArgumentException(s"top_k_vals k must be positive, got $k")
    def castTo(e: Expression, t: DataType): Expression =
      if (e.dataType == t) e
      else if (Cast.canCast(e.dataType, t) &&
        e.dataType.isInstanceOf[NumericType]) Cast(e, t)
      else e
    TopKVals(castTo(exprs(0), DoubleType), castTo(exprs(1), LongType), k)
  }

  /** Register `top_k_vals(value, id, k)` (k must be a literal int). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "top_k_vals", build, "scala_udf")
}
