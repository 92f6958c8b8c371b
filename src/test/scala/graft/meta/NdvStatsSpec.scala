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

  test("aggregate path is bit-identical to a reference Row pass") {
    // the oracle: the encoding rules applied row-by-row on the driver
    val cat = LocalCatalog(Files.createTempDirectory("ndv-par-wh").toString)
    val rows = (1L to 800L).map(i => (i, s"s${i % 31}", (i % 11).toInt,
      BigDecimal(i).setScale(2) * 3, i % 2 == 1))
      .toDF("id", "name", "band", "amt", "flag")
    IceWrite.create(spark, cat, "t", rows.repartition(5))
    val got = NdvStats.compute(spark, cat, "t")

    val collected = IceRead.table(spark, cat, "t").collect()
    val want = Map(
      "id" -> { val s = ThetaSketch.empty()
        collected.foreach(r => s.updateLong(r.getAs[Long]("id"))); s },
      "name" -> { val s = ThetaSketch.empty()
        collected.foreach(r => s.updateString(r.getAs[String]("name"))); s },
      "band" -> { val s = ThetaSketch.empty()
        collected.foreach(r => s.updateLong(r.getAs[Int]("band").toLong)); s },
      "amt" -> { val s = ThetaSketch.empty()
        collected.foreach(r => s.updateBytes(
          r.getAs[java.math.BigDecimal]("amt").unscaledValue.toByteArray)); s },
      "flag" -> { val s = ThetaSketch.empty()
        collected.foreach(r => s.updateBytes(
          Array[Byte](if (r.getAs[Boolean]("flag")) 1 else 0))); s })
    want.foreach { case (c, w) =>
      assert(java.util.Arrays.equals(got(c).serialize, w.serialize),
        s"column $c: aggregate sketch bytes differ from the reference pass")
    }
  }

  test("analyze persists sketches; append-then-analyze scans ONLY the appended files") {
    val cat = LocalCatalog(Files.createTempDirectory("ndv-inc-wh").toString)
    val rows = (1L to 600L).map(i => (i, s"g${i % 9}")).toDF("id", "grp")
    IceWrite.create(spark, cat, "t", rows)

    // first ANALYZE: full pass, persisted sidecar + provenance
    val r1 = NdvStats.analyze(spark, cat, "t")
    assert(!r1.incremental && r1.sketches("id").estimate == 600L)
    val p1 = cat.loadTable("t").properties
    assert(p1.get("ndv.sketch.snapshot-id").contains("1"))
    assert(MetaIO.exists(r1.statsPath))

    // append 200 new ids -> the incremental pass must touch ONLY the
    // appended files and still agree BIT-IDENTICALLY with a full pass
    IceWrite.append(spark, cat, "t",
      (1000L to 1199L).map(i => (i, s"g${i % 9}")).toDF("id", "grp"))
    val oldPaths = cat.loadTable("t").snapshotById(1L).get.manifest.map(_.path).toSet
    val r2 = NdvStats.analyze(spark, cat, "t")
    assert(r2.incremental, "append-only diff must take the incremental path")
    assert(r2.scannedFiles.nonEmpty &&
      r2.scannedFiles.forall(p => !oldPaths.contains(p)),
      s"incremental analyze scanned pre-existing files: ${r2.scannedFiles}")
    assert(r2.sketches("id").estimate == 800L)
    val full = NdvStats.compute(spark, cat, "t")
    r2.sketches.foreach { case (c, s) =>
      assert(java.util.Arrays.equals(s.serialize, full(c).serialize),
        s"column $c: incremental sketch differs from a full recompute")
    }

    // an unchanged table re-analyzes with ZERO files scanned
    val r3 = NdvStats.analyze(spark, cat, "t")
    assert(r3.incremental && r3.scannedFiles.isEmpty)

    // a DELETE hides rows the stored sketches counted -> full recompute
    IceWrite.deleteWhere(spark, cat, "t", org.apache.spark.sql.functions.col("id") <= 100L)
    val r4 = NdvStats.analyze(spark, cat, "t")
    assert(!r4.incremental, "a delete must force the full pass")
    assert(r4.sketches("id").estimate == 700L)

    // a schema change also invalidates the provenance
    SchemaEvolution.addColumn(cat, "t", "tag", "STRING")
    IceWrite.append(spark, cat, "t",
      Seq((5000L, "g0", "x")).toDF("id", "grp", "tag"))
    assert(!NdvStats.analyze(spark, cat, "t").incremental)
  }

  test("persisted ANALYZE sketches bind into export statistics automatically") {
    val cat = LocalCatalog(Files.createTempDirectory("ndv-auto-wh").toString)
    IceWrite.create(spark, cat, "t",
      (1L to 300L).map(i => (i, s"n${i % 12}")).toDF("id", "name"))
    NdvStats.analyze(spark, cat, "t")
    // export WITHOUT explicit sketches: the persisted ones bind
    val jsonPath = IcebergExport.exportIcebergMetadata(cat, "t")
    val j = JsonMethods.parse(MetaIO.readString(jsonPath))
    assert((j \ "statistics") != JArray(Nil), "persisted sketches must export")
    // ...and the attach side reads them back as stats.<col>.ndv
    val dst = LocalCatalog(Files.createTempDirectory("ndv-auto-dst").toString)
    val back = IcebergImport.importIcebergMetadata(dst, "t2", jsonPath)
    assert(back.properties.get("stats.id.ndv").contains("300"))
    assert(back.properties.get("stats.name.ndv").contains("12"))
    // stale persisted sketches (table moved past them) do NOT bind
    IceWrite.append(spark, cat, "t", Seq((9999L, "late")).toDF("id", "name"))
    val j2 = JsonMethods.parse(MetaIO.readString(
      IcebergExport.exportIcebergMetadata(cat, "t")))
    assert((j2 \ "statistics") == JArray(Nil),
      "sketches for an older snapshot must not bind to the current one")
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
