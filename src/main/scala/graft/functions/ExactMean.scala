package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed UDAF (the `Aggregator[IN, BUF, OUT]` surface): exact
  * mean of a 2-decimal-clean double column via integer-cents
  * accumulation. The buffer merge is associative/commutative integer
  * arithmetic, so the result is identical under any partitioning —
  * the UDAF counterpart of ExactAgg's decimal-cast aggregates.
  */
object ExactMean extends Aggregator[java.lang.Double, (Long, Long), Double] {

  override def zero: (Long, Long) = (0L, 0L)

  /** Boxed input so nulls are visible and SKIPPED — matching SQL
    * AVG/COUNT(col) semantics (a primitive Double input would see null
    * as 0.0 and count it). */
  override def reduce(b: (Long, Long), a: java.lang.Double): (Long, Long) =
    if (a == null) b else (b._1 + math.round(a * 100), b._2 + 1)

  override def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) =
    (x._1 + y._1, x._2 + y._2)

  override def finish(b: (Long, Long)): Double =
    if (b._2 == 0) Double.NaN
    else (b._1.toDouble / 100) / b._2 // two roundings, fixed order

  override def bufferEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
