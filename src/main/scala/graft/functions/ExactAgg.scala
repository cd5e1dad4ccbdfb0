package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Deterministic floating-point aggregation.
  *
  * A plain `sum(DOUBLE)` depends on partition/merge order, so its last
  * bits differ run-to-run and engine-to-engine — unusable for a
  * hash-compared oracle, and a real reproducibility problem for any
  * pipeline diffing two runs at 100 TB. The fix: round each addend to a
  * fixed decimal scale (a well-defined function of the double), then sum
  * exactly in decimal, then cast the exact total back to double. The
  * result is bit-identical regardless of partitioning, parallelism, or
  * engine.
  *
  * Scale choice: the test data's money columns are 2-decimal clean, so
  * scale 2 is lossless; products of two / three such columns are 4- / 6-
  * decimal clean, so scales 6 and 8 keep them lossless with headroom.
  */
object ExactAgg {
  val D2: DecimalType = DecimalType(18, 2)

  /** Scale-4: lossless for products of two 2-decimal columns
    * (quantity × discount); smallest scale → widest exact-total range. */
  val D4: DecimalType = DecimalType(18, 4)

  /** Scale-6 variant for products of 2-decimal columns. Not scale 8: the
    * final decimal→double cast is only bit-identical across engines while
    * the scaled integer total fits in 2^53 (DuckDB converts via int128 →
    * double → /10^scale, which double-rounds beyond that; Java's
    * BigDecimal.doubleValue rounds correctly). Scale 6 keeps totals up to
    * ~9e9 exact — far above the sf0.01 correctness gate's magnitudes. */
  val D6: DecimalType = DecimalType(18, 6)

  /** Exact sum of a double column at the given decimal scale, as double. */
  def dsum(c: Column, dt: DecimalType = D2): Column =
    sum(c.cast(dt)).cast(DoubleType)

  /** [[dsum]] for totals past the plain cast's exactness envelope.
    *
    * `CAST(decimal AS DOUBLE)` is only bit-identical across engines
    * while the scaled integer total fits in 2^53 (≈9e15): beyond that
    * DuckDB's int128→double→/10^scale double-rounds while Java's
    * BigDecimal converts in one step — measured as a 1-ulp disagreement
    * on q01's global sum_charge at the local sf1 fixture (17
    * significant digits at scale 6). This variant pins the boundary to
    * a SINGLE well-defined conversion both engines share: scale the
    * exact decimal total to its integer form, cast through BIGINT
    * (exact), convert int64→double (correctly rounded everywhere), then
    * divide by 10^scale in double (one IEEE op). Bit-identical for any
    * total under 2^63/10^scale — 9.2e12 at scale 6, ~200× past the
    * plain envelope, with the decimal accumulation itself still exact.
    * Oracle-side shape:
    * `CAST(CAST(SUM(CAST(x AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS DOUBLE) / 1000000`.
    *
    * Use for sums whose GROUP COUNT does not scale with the data
    * (global or few-group money totals — q01/q05/q06); per-entity sums
    * (q03/q10's per-customer revenue) stay inside the plain envelope by
    * construction and keep the simpler form. */
  def dsumWide(c: Column, dt: DecimalType = D6): Column = {
    val scale = math.pow(10, dt.scale).toLong
    (sum(c.cast(dt)) * lit(scale)).cast(LongType).cast(DoubleType) /
      lit(scale.toDouble)
  }

  /** Deterministic average: exact decimal sum, one double division. */
  def davg(c: Column, dt: DecimalType = D2): Column =
    sum(c.cast(dt)).cast(DoubleType) / count(c)

  /** Per-row exact decimal value surfaced as double (for window sums). */
  def d2(c: Column): Column = c.cast(D2)

  /** Deterministic 64-bit-ish hash of a string via md5 (portable across
    * engines, unlike murmur): first 15 hex chars = 60 bits, fits a long. */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** 32-bit variant (first 8 hex chars). */
  def md5Int(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast(LongType)
}
