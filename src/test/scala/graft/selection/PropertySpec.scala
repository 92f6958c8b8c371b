package graft.selection

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.exec.ScanTaskSplit

/** Property-based invariants for the pure planning math (beyond the
  * reference's hand-picked cases): packing conservation, bin bounds,
  * parallelism monotonicity, split determinism — 100 deterministic
  * scalacheck samples per property (seeded, so never flaky). */
class PropertySpec extends AnyFunSuite {

  private def samples[T](gen: Gen[T], n: Int = 100): Seq[T] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val weights: Gen[List[Long]] = Gen.listOfN(60, Gen.chooseNum(1L, 1000L))
  private val GB = 1024L * 1024 * 1024

  test("packer conserves items and respects the target (or singleton bins)") {
    for ((ws, target) <- samples(Gen.zip(weights, Gen.chooseNum(50L, 2000L)))) {
      val bins = new ListPacker(target).pack(ws)(identity)
      assert(bins.flatten.sorted == ws.sorted)
      bins.foreach(b => assert(b.sum <= target || b.size == 1))
    }
  }

  test("packer with zero target yields exactly one bin for nonempty input") {
    for (ws <- samples(weights) if ws.nonEmpty) {
      assert(new ListPacker(0L).pack(ws)(identity).size == 1)
    }
  }

  test("expectedOutputFiles is monotone in input size and >= 1") {
    def f(in: Long) =
      FileGroup.expectedOutputFiles(in, GB, FileGroup.minFileSize(GB), FileGroup.maxFileSize(GB))
    for ((a, b) <- samples(Gen.zip(Gen.chooseNum(1L, 100L * GB), Gen.chooseNum(1L, 100L * GB)))) {
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      assert(f(lo) >= 1)
      assert(f(lo) <= f(hi), s"non-monotone at $lo -> $hi")
    }
  }

  test("inputSplitSize always lands in [target, writeMax]") {
    val writeMax = FileGroup.writeMaxFileSize(GB, FileGroup.maxFileSize(GB))
    for (in <- samples(Gen.chooseNum(1L, 200L * GB))) {
      val s = FileGroup.inputSplitSize(in, GB, FileGroup.minFileSize(GB), FileGroup.maxFileSize(GB))
      assert(s >= GB && s <= writeMax, s"split $s out of range for input $in")
    }
  }

  test("LPT split is lossless and deterministic for arbitrary weights") {
    for ((ws, n) <- samples(Gen.zip(weights, Gen.chooseNum(1, 16)))) {
      val a = ScanTaskSplit.splitNVecs(ws, n)(identity)
      val b = ScanTaskSplit.splitNVecs(ws, n)(identity)
      assert(a == b)
      assert(a.flatten.sorted == ws.sorted)
      assert(a.size == n)
    }
  }
}
