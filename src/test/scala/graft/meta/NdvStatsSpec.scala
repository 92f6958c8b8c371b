package graft.meta

import java.nio.file.Files

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** NDV statistics: the theta sketch (exact below nominal, bounded-error
  * KMV estimation above, mergeable, compact-format serialization), the
  * one-pass distributed computation, and the Puffin
  * `apache-datasketches-theta-v1` export/import loop that hands external
  * CBOs cardinalities. */
class NdvStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("theta sketch: exact below nominal, bounded error above, mergeable") {
    val s = ThetaSketch.empty()
    (1 to 3000).foreach(i => s.updateLong(i.toLong))
    (1 to 3000).foreach(i => s.updateLong(i.toLong)) // duplicates ignored
    assert(s.estimate == 3000L, s"below nominal must be exact: ${s.estimate}")

    val big = ThetaSketch.empty()
    (1 to 100000).foreach(i => big.updateString(s"value-$i"))
    val err = math.abs(big.estimate - 100000L).toDouble / 100000L
    assert(err < 0.05, s"estimate ${big.estimate} off by ${err * 100}%")

    // union of disjoint halves ~= the whole
    val a = ThetaSketch.empty(); val b = ThetaSketch.empty()
    (1 to 50000).foreach(i => a.updateLong(i.toLong))
    (50001 to 100000).foreach(i => b.updateLong(i.toLong))
    val u = a.merge(b)
    val uerr = math.abs(u.estimate - 100000L).toDouble / 100000L
    assert(uerr < 0.05, s"merged estimate ${u.estimate} off by ${uerr * 100}%")
    // overlapping union does not double count
    val o = a.merge(a)
    assert(math.abs(o.estimate - a.estimate).toDouble / a.estimate < 0.01)
  }

  test("compact serialization round-trips empty, exact, and estimating sketches") {
    for (n <- Seq(0, 10, 4000, 50000)) {
      val s = ThetaSketch.empty()
      (1 to n).foreach(i => s.updateLong(i.toLong))
      val back = ThetaSketch.deserialize(s.serialize)
      assert(back.estimate == s.estimate && back.retainedCount == s.retainedCount,
        s"round trip broke at n=$n: ${back.estimate} != ${s.estimate}")
    }
    // preamble invariants of the documented compact layout
    val empty = ThetaSketch.empty().serialize
    assert(empty.length == 8 && empty(0) == 1 && empty(1) == 3 && empty(2) == 3)
    val exact = ThetaSketch.empty(); exact.updateLong(7L)
    val eb = exact.serialize
    assert(eb(0) == 2 && eb.length == 16 + 8)
  }

  test("NdvStats.compute: one pass, exact per-column distinct counts below nominal") {
    val cat = LocalCatalog(Files.createTempDirectory("ndv-wh").toString)
    val rows = (1L to 1000L).map(i => (i, s"g${i % 7}", (i % 13).toInt, i % 2 == 0))
      .toDF("id", "grp", "band", "flag")
    IceWrite.create(spark, cat, "t", rows.repartition(4))
    val sk = NdvStats.compute(spark, cat, "t")
    assert(sk("id").estimate == 1000L)
    assert(sk("grp").estimate == 7L)
    assert(sk("band").estimate == 13L)
    assert(sk("flag").estimate == 2L)
  }

  test("export writes theta blobs + statistics entry; import lands stats.*.ndv") {
    val cat = LocalCatalog(Files.createTempDirectory("ndv-exp-wh").toString)
    val rows = (1L to 500L).map(i => (i, s"n${i % 25}")).toDF("id", "name")
    IceWrite.create(spark, cat, "t", rows)
    val sketches = NdvStats.compute(spark, cat, "t")
    val jsonPath = IcebergExport.exportIcebergMetadata(cat, "t", ndvSketches = sketches)
    val j = JsonMethods.parse(MetaIO.readString(jsonPath))

    val stats = (j \ "statistics") match {
      case JArray(List(e)) => e
      case other => fail(s"expected one statistics entry, got $other")
    }
    val statsPath = (stats \ "statistics-path") match {
      case JString(p) => p; case _ => fail("no statistics-path")
    }
    val fileSize = (stats \ "file-size-in-bytes") match {
      case JInt(n) => n.toLong; case JLong(n) => n; case _ => fail("no file size")
    }
    assert(fileSize == MetaIO.readBytes(statsPath).length.toLong)

    // the Puffin footer carries one theta blob per column with the
    // authoritative ndv property; payloads decode to the same estimates
    val metas = Puffin.readFooter(statsPath)
    assert(metas.map(_.blobType).toSet == Set("apache-datasketches-theta-v1"))
    assert(metas.size == 2)
    val all = MetaIO.readBytes(statsPath)
    metas.foreach { m =>
      val payload = java.util.Arrays.copyOfRange(all, m.offset.toInt, (m.offset + m.length).toInt)
      assert(ThetaSketch.deserialize(payload).estimate.toString == m.properties("ndv"))
    }
    val ndvByBlob = metas.flatMap(m => m.fields.map(_ -> m.properties("ndv"))).toMap
    val meta = cat.loadTable("t")
    assert(ndvByBlob(meta.fieldByName("id").get.id) == "500")
    assert(ndvByBlob(meta.fieldByName("name").get.id) == "25")

    // import: cardinalities land as analyzeTable-scheme properties
    val dst = LocalCatalog(Files.createTempDirectory("ndv-imp-wh").toString)
    val back = IcebergImport.importIcebergMetadata(dst, "t2", jsonPath)
    assert(back.properties.get("stats.id.ndv").contains("500"))
    assert(back.properties.get("stats.name.ndv").contains("25"))
    assert(back.properties.get("stats.snapshot-id")
      .contains(back.currentSnapshotId.get.toString))
  }
}
