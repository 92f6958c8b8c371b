package graft.meta

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** The indexed scanTasks must be observationally identical to the naive
  * O(data x deletes) formulation it replaced — same applicable deletes,
  * same manifest order, for arbitrary partition/sequence mixes. */
class ScanTasksPropertySpec extends AnyFunSuite {

  private def samples[T](gen: Gen[T], n: Int = 100): Seq[T] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val partGen: Gen[Map[String, String]] =
    Gen.oneOf(Map.empty[String, String], Map("p" -> "1"), Map("p" -> "2"), Map("p" -> "3"))

  private val manifestGen: Gen[Seq[FileEntry]] = for {
    nData <- Gen.chooseNum(1, 12)
    nDel <- Gen.chooseNum(0, 12)
    dataParts <- Gen.listOfN(nData, partGen)
    dataSeqs <- Gen.listOfN(nData, Gen.chooseNum(1L, 6L))
    delParts <- Gen.listOfN(nDel, partGen)
    delSeqs <- Gen.listOfN(nDel, Gen.chooseNum(1L, 6L))
    delKinds <- Gen.listOfN(nDel, Gen.oneOf(FileContent.PositionDeletes, FileContent.EqualityDeletes))
  } yield {
    val data = dataParts.zip(dataSeqs).zipWithIndex.map { case ((p, s), i) =>
      FileEntry(s"/d$i", 100L, FileContent.Data, 10L, s, partitionValues = p)
    }
    val dels = delParts.lazyZip(delSeqs).lazyZip(delKinds).toList.zipWithIndex.map {
      case ((p, s, k), i) => FileEntry(s"/x$i", 10L, k, 1L, s, partitionValues = p)
    }
    data ++ dels
  }

  private def naive(snapshot: Snapshot): Seq[FileEntry] = {
    val deletes = snapshot.manifest.filter(_.content != FileContent.Data)
    snapshot.manifest.filter(_.content == FileContent.Data).map { d =>
      val applicable = deletes.filter { del =>
        (del.partitionValues.isEmpty || del.partitionValues == d.partitionValues) &&
        (del.content match {
          case FileContent.EqualityDeletes => del.sequenceNumber > d.sequenceNumber
          case _                           => del.sequenceNumber >= d.sequenceNumber
        })
      }
      d.copy(deletes = applicable.map(_.path))
    }
  }

  test("indexed scanTasks == naive formulation on random manifests") {
    for (manifest <- samples(manifestGen)) {
      val snap = Snapshot(1L, None, 7L, 0L, manifest)
      val meta = TableMetadata(name = "t", location = "/t", snapshots = Seq(snap))
      assert(meta.scanTasks(snap) == naive(snap), s"manifest=$manifest")
    }
  }
}
