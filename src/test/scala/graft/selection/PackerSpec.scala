package graft.selection

import org.scalatest.funsuite.AnyFunSuite

/** Table-driven packer cases mirroring the reference's
  * (core/src/file_selection/packer.rs:134-427). */
class PackerSpec extends AnyFunSuite {

  private def pack(target: Long, items: Seq[Long], lookback: Int = 1): Seq[Seq[Long]] =
    new ListPacker(target, lookback).pack(items)(identity)

  test("empty input -> no bins") {
    assert(pack(100, Nil) == Nil)
  }

  test("simple FFD packing with lookback=1") {
    // desc: 60,50,30,20. 60->bin0; 50 can't fit newest bin (60+50>100) ->
    // bin1; 30,20 both fit bin1 -> [[60],[50,30,20]]
    val bins = pack(100, Seq(60, 50, 30, 20))
    assert(bins == Seq(Seq(60L), Seq(50L, 30L, 20L)))
  }

  test("zero target -> single bin with all items") {
    val bins = pack(0, Seq(5, 500, 50))
    assert(bins.size == 1)
    assert(bins.head.toSet == Set(5L, 500L, 50L))
  }

  test("oversize item gets its own bin") {
    val bins = pack(100, Seq(250, 10))
    assert(bins.size == 2)
    assert(bins.head == Seq(250L))
    assert(bins(1) == Seq(10L))
  }

  test("exact fit fills the bin") {
    val bins = pack(100, Seq(50, 50, 100))
    assert(bins == Seq(Seq(100L), Seq(50L, 50L)))
  }

  test("lookback=1 only checks newest bin") {
    // desc: 90, 60, 40, 10. 90->bin0; 60->bin1; 40->bin2(60+40=100 fits!)
    val bins = pack(100, Seq(40, 60, 90, 10))
    assert(bins == Seq(Seq(90L, 10L).take(1), Seq(60L, 40L), Seq(10L)).filter(_.nonEmpty)
      || bins == Seq(Seq(90L), Seq(60L, 40L), Seq(10L)))
    // 10 cannot see bin0 (90+10=100 would fit) because lookback=1 only sees
    // the newest bin [60,40] which is full -> new bin
  }

  test("larger lookback improves packing") {
    val b1 = pack(100, Seq(40, 60, 90, 10), lookback = 1)
    val b3 = pack(100, Seq(40, 60, 90, 10), lookback = 3)
    assert(b3.size <= b1.size)
    assert(b3 == Seq(Seq(90L, 10L), Seq(60L, 40L)))
  }

  test("all items fit in one bin") {
    val bins = pack(1000, Seq(10, 20, 30))
    assert(bins.size == 1)
  }

  test("stable for equal weights") {
    val a = pack(100, Seq(10, 10, 10, 10, 10, 10))
    val b = pack(100, Seq(10, 10, 10, 10, 10, 10))
    assert(a == b)
  }

  test("stress: 10k items pack without loss") {
    val items = (1L to 10000L).map(i => (i % 97) + 1)
    val bins = pack(500, items)
    assert(bins.flatten.sorted == items.sorted)
    // every bin except possibly singletons respects the target
    bins.foreach { bin =>
      assert(bin.sum <= 500 || bin.size == 1)
    }
  }
}
