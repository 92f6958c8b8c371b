package graft.selection

import scala.collection.mutable.ArrayBuffer

/** First-Fit-Decreasing bin packer with a bounded lookback window, the same
  * algorithm (and edge cases) as the reference's ListPacker
  * (core/src/file_selection/packer.rs:31-132), itself modeled on Iceberg's
  * util.BinPacking.ListPacker:
  *
  *  - items are sorted by weight descending (stable for equal weights);
  *  - each item is offered to the newest `lookback` bins only;
  *  - `targetWeight == 0` means "everything fits" -> a single bin.
  */
final class ListPacker(val targetWeight: Long, val lookback: Int = 1) {

  def pack[T](items: Seq[T])(weight: T => Long): Seq[Seq[T]] = {
    if (items.isEmpty) return Nil
    // stable sort, descending weight (FFD)
    val sorted = items.sortBy(t => -weight(t))
    final case class Bin(items: ArrayBuffer[T], var current: Long)
    val bins = ArrayBuffer.empty[Bin]
    def canAdd(b: Bin, w: Long): Boolean =
      targetWeight == 0L || b.current + w <= targetWeight
    for (item <- sorted) {
      val w = weight(item)
      // newest-to-oldest within the lookback window
      val slot = bins.view.reverse.take(lookback).find(canAdd(_, w))
      slot match {
        case Some(b) => b.items += item; b.current += w
        case None =>
          val b = Bin(ArrayBuffer(item), w)
          bins += b
      }
    }
    bins.map(_.items.toSeq).toSeq
  }
}
