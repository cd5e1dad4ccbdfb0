package graft

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType
import org.apache.spark.storage.StorageLevel

/** Distributed prefix sum — the scale-correct replacement for
  * `SUM(x) OVER (ORDER BY … ROWS UNBOUNDED PRECEDING)` whose
  * unpartitioned window collapses the input to ONE partition.
  *
  * Shape (the classic two-pass scan): range-partitioned distributed
  * sort, one lightweight pass collecting per-partition sums (driver
  * sees numPartitions longs, never rows), then a map adding each
  * partition's prefix offset. Equals the single-partition window form
  * exactly whenever the sort key is a total order, so oracles keep
  * using SUM OVER. The sorted RDD is pinned (MEMORY_AND_DISK) between
  * the two passes so both see identical partitioning.
  */
object GlobalCumsum {
  def withRunningSum(df: DataFrame, order: Seq[Column], valueCol: String,
      name: String): DataFrame = {
    val sorted = df.orderBy(order: _*)
    val idx = sorted.schema.fieldIndex(valueCol)
    val rdd0 = sorted.rdd.persist(StorageLevel.MEMORY_AND_DISK)
    val partSums = rdd0
      .mapPartitionsWithIndex { (pid, it) =>
        var s = 0L
        it.foreach(r => s += r.getLong(idx))
        Iterator((pid, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _)
    val out = sorted.schema.add(name, LongType, nullable = false)
    val rdd = rdd0.mapPartitionsWithIndex { (pid, it) =>
      var acc = offsets(pid)
      it.map { r => acc += r.getLong(idx); Row.fromSeq(r.toSeq :+ acc) }
    }
    // materialize the result BEFORE releasing the pinned sort: the
    // offsets are only valid against rdd0's exact partitioning, so the
    // result must never recompute through an unpersisted (re-sampled)
    // range sort; the checkpoint also keeps repeated calls from
    // accumulating persisted copies of the sorted input for the rest
    // of the session
    val result = df.sparkSession.createDataFrame(rdd, out).localCheckpoint(true)
    rdd0.unpersist(false)
    result
  }
}
