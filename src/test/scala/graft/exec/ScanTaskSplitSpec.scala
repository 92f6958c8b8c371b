package graft.exec

import org.scalatest.funsuite.AnyFunSuite

class ScanTaskSplitSpec extends AnyFunSuite {

  test("splits are balanced and lossless") {
    val items = (1L to 100L).toSeq
    val groups = ScanTaskSplit.splitNVecs(items, 4)(identity)
    assert(groups.size == 4)
    assert(groups.flatten.sorted == items)
    val sums = groups.map(_.sum)
    assert(sums.max - sums.min <= items.max)
  }

  test("deterministic across 1000 repeats (reference: 10k-stable)") {
    val items = Seq.tabulate(200)(i => (i * 2654435761L) % 10000)
    val first = ScanTaskSplit.splitNVecs(items, 7)(identity)
    (1 to 1000).foreach { _ =>
      assert(ScanTaskSplit.splitNVecs(items, 7)(identity) == first)
    }
  }

  test("more groups than items leaves empties") {
    val groups = ScanTaskSplit.splitNVecs(Seq(5L, 3L), 4)(identity)
    assert(groups.count(_.nonEmpty) == 2)
    assert(groups.flatten.toSet == Set(5L, 3L))
  }
}
