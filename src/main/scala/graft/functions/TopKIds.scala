package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native top-k-per-key aggregate (TypedImperativeAggregate — the
  * imperative-buffer Catalyst API used by Spark's own sketches):
  * `top_k_ids(value, id, k)` keeps a bounded buffer of the k largest
  * (value, id) pairs and returns the ids ordered by (value DESC,
  * id ASC).
  *
  * Why it exists: the window form (`row_number over (partition by key
  * order by value) <= k`) shuffles and sorts EVERY row of every key.
  * This aggregate does map-side partial top-k — each partition sends at
  * most k candidates per key into the shuffle — which is the
  * scale-correct shape when rows-per-key ≫ k (the usual 100 TB case).
  *
  * The k-smallest element is evicted on overflow using the same
  * (value DESC, id ASC) total order that the output uses, so results
  * are deterministic and partitioning-independent.
  */
case class TopKIds(
    valueExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[(Double, Long)]] {

  type Buf = scala.collection.mutable.ArrayBuffer[(Double, Long)]

  override def children: Seq[Expression] = Seq(valueExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // reject mistyped inputs at analysis time — update() casts blindly, so
  // without this a DECIMAL value column would ClassCastException mid-job
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (valueExpr.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"top_k_ids value must be DOUBLE, got ${valueExpr.dataType.sql}")
    else if (idExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"top_k_ids id must be BIGINT, got ${idExpr.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): Buf =
    scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]

  /** true if a ranks before b in (value DESC, id ASC) order. Total even
    * under NaN: java.lang.Double.compare is Spark's own sort-order
    * semantics (NaN greatest, so NaN-first under DESC, -0.0 < 0.0) —
    * primitive `>` would make NaN never beat and never be beaten,
    * leaving the result insertion-order dependent. */
  private def beats(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    c > 0 || (c == 0 && a._2 < b._2)
  }

  private def insert(buf: Buf, v: Double, id: Long): Buf = {
    val cand = (v, id)
    if (buf.length < k) buf += cand
    else {
      // replace the worst element if the candidate beats it
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
    val sorted = buf.sortWith(beats).map(_._2).toArray
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

  override def withNewMutableAggBufferOffset(offset: Int): TopKIds =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKIds =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKIds =
    copy(valueExpr = newChildren(0), idExpr = newChildren(1))
}

object TopKIds {
  /** Builder shared by [[register]] and [[graft.GraftExtensions]]:
    * numeric value/id inputs are widened with implicit casts so
    * `top_k_ids(decimal_col, int_col, 3)` works; non-numeric types still
    * fail analysis via checkInputDataTypes. */
  def build(exprs: Seq[Expression]): TopKIds = {
    import org.apache.spark.sql.catalyst.expressions.Cast
    // validate arity + the k literal up front: this builder runs at
    // analysis time for every SQL session (GraftExtensions), so a bad
    // call must fail with a clean message, not IndexOutOfBounds /
    // ClassCastException from exprs(2).eval().asInstanceOf[Int]
    if (exprs.length != 3)
      throw new IllegalArgumentException(
        s"top_k_ids(value, id, k) requires exactly 3 arguments, got ${exprs.length}")
    val k = exprs(2) match {
      case e if e.foldable =>
        // integral types only: a Double/Decimal literal silently
        // truncating via intValue() (2.9 -> 2), or a Long wrapping past
        // Int.MaxValue, would be a wrong k instead of a clean error
        e.eval() match {
          case n: java.lang.Integer => n.intValue()
          case n: java.lang.Short => n.intValue()
          case n: java.lang.Byte => n.intValue()
          case n: java.lang.Long if n.longValue() == n.intValue() => n.intValue()
          case other => throw new IllegalArgumentException(
            s"top_k_ids k must be an integer literal within Int range, got $other")
        }
      case _ => throw new IllegalArgumentException(
        "top_k_ids k must be a foldable literal integer")
    }
    if (k <= 0)
      throw new IllegalArgumentException(s"top_k_ids k must be positive, got $k")
    def castTo(e: Expression, t: DataType): Expression =
      if (e.dataType == t) e
      else if (Cast.canCast(e.dataType, t) &&
        e.dataType.isInstanceOf[NumericType]) Cast(e, t)
      else e // leave as-is → checkInputDataTypes reports it cleanly
    TopKIds(castTo(exprs(0), DoubleType), castTo(exprs(1), LongType), k)
  }

  /** Register `top_k_ids(value, id, k)` (k must be a literal int). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "top_k_ids", build, "scala_udf")
}
