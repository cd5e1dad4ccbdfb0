package org.apache.spark.mllib.clustering

/** Package bridge: `DistributedLDAModel.iterationTimes` is
  * `private[clustering]` in Spark 4, but it is the exact per-iteration
  * metric the reference's metadata reports (sum = BASELINE.md's EM
  * training seconds), so graft.BookBench needs read access to compare
  * like-for-like. Read-only accessor; no Spark internals are modified.
  */
object GraftLdaBridge {
  def iterationTimes(m: DistributedLDAModel): Array[Double] = m.iterationTimes
}
