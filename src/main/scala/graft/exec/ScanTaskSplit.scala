package graft.exec

import scala.collection.mutable

/** Deterministic LPT (longest-processing-time) split of weighted tasks into
  * n balanced groups — the reference's `split_n_vecs`
  * (iceberg_file_task_scan.rs:233-301), kept for plan-level parallelism
  * accounting. Spark itself splits files via
  * `spark.sql.files.maxPartitionBytes`; this is used when a plan needs an
  * explicit, stable assignment of files to executor slots.
  *
  * Determinism: min-heap keyed by (groupWeight, groupIndex) — ties always
  * go to the lowest index, so the same input yields the same split
  * (verified 10k-repeat stable in the reference's tests,
  * iceberg_file_task_scan.rs:764-797).
  */
object ScanTaskSplit {
  def splitNVecs[T](items: Seq[T], n: Int)(weight: T => Long): Seq[Seq[T]] = {
    require(n > 0, "n must be positive")
    val heap = mutable.PriorityQueue.empty[(Long, Int)](
      Ordering.by[(Long, Int), (Long, Int)](identity).reverse)
    (0 until n).foreach(i => heap.enqueue((0L, i)))
    val groups = Array.fill(n)(Vector.newBuilder[T])
    for (item <- items.sortBy(t => -weight(t))) {
      val (w, i) = heap.dequeue()
      groups(i) += item
      heap.enqueue((w + weight(item), i))
    }
    groups.map(_.result()).toSeq
  }
}
