package graft.meta

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.SparkTestBase

/** Round-trips the Iceberg-v2 export against the published spec layout:
  * the metadata JSON carries every required v2 field; the manifest list
  * and manifest files are real Avro with the spec's field names and
  * file-metadata keys; the referenced data files, record counts, and
  * sequence numbers reconstruct the snapshot exactly; and the referenced
  * parquet is readable in place. */
class IcebergExportSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.001"

  private def build(): (LocalCatalog, TableMetadata) = {
    val catalog = LocalCatalog(Files.createTempDirectory("ice-exp-wh").toString)
    val src = spark.read.parquet(s"$sf/customer.parquet")
    IceWrite.create(spark, catalog, "t_exp", src)
    IceWrite.append(spark, catalog, "t_exp",
      src.withColumn("c_custkey", col("c_custkey") + 1000))
    IceWrite.appendEqualityDeletes(spark, catalog, "t_exp",
      src.filter(col("c_custkey") < 5).select(col("c_custkey")), Seq("c_custkey"))
    (catalog, catalog.loadTable("t_exp"))
  }

  test("exported metadata JSON has the required v2 fields and spec shapes") {
    val (catalog, meta) = build()
    val jsonPath = IcebergExport.exportIcebergMetadata(catalog, "t_exp")
    val j = JsonMethods.parse(MetaIO.readString(jsonPath))

    assert((j \ "format-version") == JInt(2))
    for (k <- Seq("table-uuid", "location", "last-sequence-number", "last-updated-ms",
        "last-column-id", "current-schema-id", "schemas", "default-spec-id",
        "partition-specs", "last-partition-id", "default-sort-order-id", "sort-orders",
        "current-snapshot-id", "refs", "snapshots", "snapshot-log"))
      assert((j \ k) != JNothing, s"missing required metadata field $k")

    // schema: struct with id/name/required/type per column, ids preserved
    val fields = (j \ "schemas")(0) \ "fields" match { case JArray(xs) => xs; case _ => Nil }
    assert(fields.size == meta.schema.size)
    meta.schema.zip(fields).foreach { case (f, jf) =>
      assert((jf \ "id") == JInt(f.id) && (jf \ "name") == JString(f.name))
    }
    // refs: main as a branch ref pointing at the current snapshot
    assert((j \ "refs" \ "main" \ "type") == JString("branch"))
    assert((j \ "refs" \ "main" \ "snapshot-id") ==
      JInt(BigInt(meta.currentSnapshotId.get)))
    // one snapshot entry per graft snapshot, chained by parent ids
    val snaps = (j \ "snapshots") match { case JArray(xs) => xs; case _ => Nil }
    assert(snaps.size == meta.snapshots.size)
  }

  test("manifest list + manifests reconstruct the snapshot; parquet readable in place") {
    val (catalog, meta) = build()
    val jsonPath = IcebergExport.exportIcebergMetadata(catalog, "t_exp")
    val j = JsonMethods.parse(MetaIO.readString(jsonPath))
    val head = meta.currentSnapshot.get

    val snapJ = (j \ "snapshots") match {
      case JArray(xs) => xs.find(s =>
        (s \ "snapshot-id") == JInt(BigInt(head.snapshotId))).get
      case _ => fail("no snapshots")
    }
    val listPath = (snapJ \ "manifest-list") match { case JString(p) => p; case _ => fail() }
    val (listEntries, listMeta) = IcebergExport.readAvro(listPath)
    assert(listMeta("format-version") == "2")
    assert(listEntries.nonEmpty)

    // follow every manifest: collect (path, content, records, seq)
    val entries = listEntries.flatMap { le =>
      val mPath = le.get("manifest_path").toString
      assert(MetaIO.size(mPath) == le.get("manifest_length").asInstanceOf[Long])
      val (recs, mMeta) = IcebergExport.readAvro(mPath)
      assert(mMeta("format-version") == "2")
      assert(Set("data", "deletes").contains(mMeta("content")))
      assert(JsonMethods.parse(mMeta("schema")) \ "type" == JString("struct"))
      recs.map { r =>
        val df = r.get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord]
        (df.get("file_path").toString,
          df.get("content").asInstanceOf[Int],
          df.get("record_count").asInstanceOf[Long],
          r.get("sequence_number").asInstanceOf[Long],
          r.get("status").asInstanceOf[Int])
      }
    }
    // exact reconstruction of the graft snapshot's manifest
    val want = head.manifest.map(f => (f.path,
      f.content match {
        case FileContent.Data => 0
        case FileContent.PositionDeletes => 1
        case FileContent.EqualityDeletes => 2
      }, f.recordCount, f.sequenceNumber)).toSet
    assert(entries.map(t => (t._1, t._2, t._3, t._4)).toSet == want)
    // ADDED exactly for this snapshot's sequence, EXISTING (explicit seq) otherwise
    entries.foreach { case (_, _, _, seq, status) =>
      assert(status == (if (seq == head.sequenceNumber) 1 else 0))
    }
    // the equality-delete manifest carries the equality field ids
    val eqIds = listEntries.filter(_.get("content").asInstanceOf[Int] == 1).flatMap { le =>
      val (recs, _) = IcebergExport.readAvro(le.get("manifest_path").toString)
      recs.flatMap { r =>
        val df = r.get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord]
        Option(df.get("equality_ids")).toSeq.flatMap(
          _.asInstanceOf[java.util.List[Integer]].toArray.toSeq)
      }
    }
    assert(eqIds.nonEmpty, "equality delete files must carry equality_ids")

    // referenced data files are readable in place, rows sum to the manifest counts
    val dataPaths = entries.filter(_._2 == 0).map(_._1)
    val rows = spark.read.parquet(dataPaths: _*).count()
    assert(rows == entries.filter(_._2 == 0).map(_._3).sum)
  }

  private def decodeLeLong(b: java.nio.ByteBuffer): Long = {
    val d = b.duplicate().order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(d.remaining() == 8, s"expected 8-byte bound, got ${d.remaining()}")
    d.getLong
  }

  private def kvMap(df: org.apache.avro.generic.GenericRecord,
      field: String): Map[Int, AnyRef] =
    Option(df.get(field)).map { arr =>
      import scala.jdk.CollectionConverters._
      arr.asInstanceOf[java.util.Collection[AnyRef]].asScala.map { e =>
        val r = e.asInstanceOf[org.apache.avro.generic.GenericRecord]
        r.get("key").asInstanceOf[Int] -> r.get("value")
      }.toMap
    }.getOrElse(Map.empty)

  test("exported data files carry prunable per-file stats (bounds + counts)") {
    val (catalog, meta) = build()
    val jsonPath = IcebergExport.exportIcebergMetadata(catalog, "t_exp")
    val j = JsonMethods.parse(MetaIO.readString(jsonPath))
    val head = meta.currentSnapshot.get
    val custId = meta.fieldByName("c_custkey").get.id

    val snapJ = (j \ "snapshots") match {
      case JArray(xs) => xs.find(s =>
        (s \ "snapshot-id") == JInt(BigInt(head.snapshotId))).get
      case _ => fail("no snapshots")
    }
    val listPath = (snapJ \ "manifest-list") match { case JString(p) => p; case _ => fail() }
    val (listEntries, _) = IcebergExport.readAvro(listPath)
    val dataFiles = listEntries.filter(_.get("content").asInstanceOf[Int] == 0).flatMap { le =>
      IcebergExport.readAvro(le.get("manifest_path").toString)._1.map(
        _.get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord])
    }
    assert(dataFiles.nonEmpty)

    // per file: decoded c_custkey bounds == the file's true min/max, counts exact
    val fileBounds = dataFiles.map { df =>
      val path = df.get("file_path").toString
      val records = df.get("record_count").asInstanceOf[Long]
      val lower = kvMap(df, "lower_bounds")
      val upper = kvMap(df, "upper_bounds")
      val vals = kvMap(df, "value_counts")
      val nulls = kvMap(df, "null_value_counts")
      assert(lower.contains(custId) && upper.contains(custId),
        s"$path missing c_custkey bounds")
      val lo = decodeLeLong(lower(custId).asInstanceOf[java.nio.ByteBuffer])
      val hi = decodeLeLong(upper(custId).asInstanceOf[java.nio.ByteBuffer])
      val actual = spark.read.parquet(path).agg(
        min(col("c_custkey")), max(col("c_custkey")), count(lit(1))).head()
      assert(lo == actual.getLong(0) && hi == actual.getLong(1),
        s"$path bounds ($lo,$hi) != actual (${actual.getLong(0)},${actual.getLong(1)})")
      assert(vals.get(custId).contains(java.lang.Long.valueOf(records)),
        s"$path value_count for c_custkey must equal record_count")
      assert(nulls.get(custId).contains(java.lang.Long.valueOf(0L)),
        s"$path c_custkey has no nulls — null_value_count must be 0")
      (path, lo, hi)
    }
    // prunability: the two appends write disjoint c_custkey ranges (+1000
    // shift), so a point lookup must skip at least one file — and skipped
    // files must truly not contain the key (bounds are sound)
    val key = fileBounds.map(_._2).min // smallest lower bound, only in one range
    val (kept, pruned) = fileBounds.partition { case (_, lo, hi) => lo <= key && key <= hi }
    assert(pruned.nonEmpty, "expected at least one file pruned by bounds")
    pruned.foreach { case (p, _, _) =>
      assert(spark.read.parquet(p).filter(col("c_custkey") === key).count() == 0,
        s"pruned file $p actually contains $key — bounds unsound")
    }
    assert(kept.exists { case (p, _, _) =>
      spark.read.parquet(p).filter(col("c_custkey") === key).count() > 0 })
  }

  test("unstamped pos-delete: current snapshot refused, history auto-dropped") {
    import graft.compaction.Maintenance
    val wh = Files.createTempDirectory("ice-exp-unst")
    val catalog = LocalCatalog(wh.toString)
    val src = spark.read.parquet(s"$sf/region.parquet")
    IceWrite.create(spark, catalog, "t_unst", src)
    val m0 = catalog.loadTable("t_unst")
    val s0 = m0.currentSnapshot.get
    val dataPath = s0.manifest.head.path

    // craft an UNSTAMPED pos-delete parquet (plain Spark write — no
    // reserved field ids in the footer) and hand-commit it, simulating a
    // pre-stamping-era table
    import spark.implicits._
    val (posPath, posSize, posRows, _) = graft.testkit.FileGenerator.writeSingleParquet(
      spark, Seq((dataPath, 0L)).toDF("file_path", "pos"),
      wh.resolve("unstamped-pos.parquet"))
    val seq1 = m0.lastSequenceNumber + 1
    val s1 = Snapshot(s0.snapshotId + 1000, Some(s0.snapshotId), seq1,
      System.currentTimeMillis(),
      s0.manifest :+ FileEntry(posPath, posSize, FileContent.PositionDeletes,
        posRows, seq1),
      Map("operation" -> "delete"))
    catalog.commit(m0, m0.copy(
      snapshots = m0.snapshots :+ s1,
      currentSnapshotId = Some(s1.snapshotId),
      refs = m0.refs + ("main" -> s1.snapshotId),
      lastSequenceNumber = seq1))

    // current snapshot references the unstamped file: refused, with the
    // fix-it path in the message
    val e = intercept[IllegalArgumentException](
      IcebergExport.exportIcebergMetadata(catalog, "t_unst"))
    assert(e.getMessage.contains("rewritePositionDeletes"))

    // follow the remediation: the live snapshot's tombstones get rewritten
    // with ids stamped; the unstamped file is now HISTORY-only
    Maintenance.rewritePositionDeletes(spark, catalog, "t_unst")
    val jsonPath = IcebergExport.exportIcebergMetadata(catalog, "t_unst")
    val j = JsonMethods.parse(MetaIO.readString(jsonPath))
    val snapIds = (j \ "snapshots") match {
      case JArray(xs) => xs.map(s => (s \ "snapshot-id") match {
        case JInt(x) => x.toLong; case other => fail(s"bad id $other")
      }).toSet
      case _ => fail("no snapshots")
    }
    assert(!snapIds.contains(s1.snapshotId),
      "history snapshot referencing the unstamped file must be dropped")
    val cur = catalog.loadTable("t_unst").currentSnapshotId.get
    assert(snapIds.contains(cur))
    // MOR semantics preserved through the remediation (one row deleted)
    assert(IceRead.table(spark, catalog, "t_unst").count() == src.count() - 1)
  }

  test("v3 table with deletion vectors exports as format-version 3") {
    val catalog = LocalCatalog(Files.createTempDirectory("ice-exp-dv").toString)
    val src = spark.read.parquet(s"$sf/region.parquet")
    IceWrite.create(spark, catalog, "t_dv", src)
    IceWrite.deleteWhereDv(spark, catalog, "t_dv", col("r_regionkey") === 0L)
    val jsonPath = IcebergExport.exportIcebergMetadata(catalog, "t_dv")
    val j = JsonMethods.parse(MetaIO.readString(jsonPath))
    assert((j \ "format-version") == JInt(3))
    // the DV rides the deletes manifest as a content=1 PUFFIN entry with
    // blob coordinates
    val listPath = (j \ "snapshots") match {
      case JArray(ss) => ss.map(s => (s \ "manifest-list") match {
        case JString(p) => p; case o => fail(s"bad manifest-list $o")
      }).last
      case o => fail(s"bad snapshots $o")
    }
    val (listEntries, _) = IcebergExport.readAvro(listPath)
    val deletes = listEntries.filter(_.get("content").asInstanceOf[Int] == 1)
    assert(deletes.nonEmpty, "expected a deletes manifest")
    val (recs, _) = IcebergExport.readAvro(deletes.head.get("manifest_path").toString)
    val dvs = recs.map(_.get("data_file").asInstanceOf[
      org.apache.avro.generic.GenericRecord])
      .filter(d => d.get("referenced_data_file") != null)
    assert(dvs.nonEmpty, "expected DV entries")
    dvs.foreach { d =>
      assert(d.get("file_format").toString == "PUFFIN")
      assert(d.get("content").asInstanceOf[Int] == 1)
      assert(d.get("content_offset") != null && d.get("content_size_in_bytes") != null)
      // the named blob decodes as a spec deletion-vector-v1 payload
      val blob = Puffin.readBlob(d.get("file_path").toString,
        d.get("content_offset").asInstanceOf[Long],
        d.get("content_size_in_bytes").asInstanceOf[Long])
      assert(Puffin.decodeDvBlob(blob).cardinality ==
        d.get("record_count").asInstanceOf[Long])
    }
    // row lineage: next-row-id present, data files carry first_row_id
    assert((j \ "next-row-id") != JNothing)
  }

  test("v3 writes produce DVs; export refuses stray parquet tombstones with remediation") {
    import graft.compaction.Maintenance
    val catalog = LocalCatalog(Files.createTempDirectory("ice-exp-v3pos").toString)
    val src = spark.read.parquet(s"$sf/nation.parquet")
    IceWrite.create(spark, catalog, "t_v3p", src, formatVersion = 3)
    // the ROW-LEVEL write paths stay v3-faithful by construction: UPDATE
    // commits deletion vectors + rewritten copies in ONE snapshot
    IceWrite.updateWhere(spark, catalog, "t_v3p",
      Map("n_name" -> org.apache.spark.sql.functions.upper(col("n_name"))),
      col("n_nationkey") < 3)
    val afterUpdate = catalog.loadTable("t_v3p").currentSnapshot.get
    assert(afterUpdate.summary("operation") == "overwrite")
    assert(afterUpdate.manifest.filter(_.content == FileContent.PositionDeletes)
      .forall(_.isDeletionVector), "v3 UPDATE must tombstone via deletion vectors")
    val got = IceRead.table(spark, catalog, "t_v3p")
    assert(got.count() == src.count())
    assert(got.filter(col("n_nationkey") < 3)
      .collect().forall(r => r.getAs[String]("n_name") == r.getAs[String]("n_name").toUpperCase))
    IcebergExport.exportIcebergMetadata(catalog, "t_v3p") // clean v3, no conversion

    // a STRAY parquet tombstone (low-level appendPositionDeletes) is the
    // one thing a v3 export must refuse, naming the fix
    val victim = catalog.loadTable("t_v3p").currentSnapshot.get.manifest
      .filter(_.content == FileContent.Data).maxBy(_.recordCount)
    import spark.implicits._
    IceWrite.appendPositionDeletes(spark, catalog, "t_v3p",
      Seq((victim.path, 0L)).toDF("file_path", "pos"))
    val before = IceRead.table(spark, catalog, "t_v3p").collect().toSet
    val e = intercept[IllegalArgumentException](
      IcebergExport.exportIcebergMetadata(catalog, "t_v3p"))
    assert(e.getMessage.contains("convertPositionDeletesToDVs"))
    Maintenance.convertPositionDeletesToDVs(spark, catalog, "t_v3p")
    val jsonPath = IcebergExport.exportIcebergMetadata(catalog, "t_v3p")
    assert((JsonMethods.parse(MetaIO.readString(jsonPath)) \ "format-version") == JInt(3))
    assert(IceRead.table(spark, catalog, "t_v3p").collect().toSet == before)
  }

  test("v3 table with DVs round-trips through the convert-then-export path") {
    import graft.compaction.Maintenance
    val catalog = LocalCatalog(Files.createTempDirectory("ice-exp-dv2").toString)
    val src = spark.read.parquet(s"$sf/nation.parquet")
    IceWrite.create(spark, catalog, "t_dv2", src)
    IceWrite.deleteWhereDv(spark, catalog, "t_dv2", col("n_nationkey") < 5)
    assert(catalog.loadTable("t_dv2").currentSnapshot.get.manifest.exists(_.isDeletionVector))

    val jsonPath = Maintenance.exportIcebergV2(spark, catalog, "t_dv2")

    // the conversion kept MOR semantics in graft's own view
    assert(IceRead.table(spark, catalog, "t_dv2").count() == 20)
    // the converted tombstones carry the reserved ids (export enforces it)
    val converted = catalog.loadTable("t_dv2").currentSnapshot.get.manifest
      .filter(f => f.content == FileContent.PositionDeletes)
    assert(converted.nonEmpty && converted.forall(!_.isDeletionVector))

    val j = JsonMethods.parse(MetaIO.readString(jsonPath))
    assert((j \ "format-version") == JInt(2))
    // every exported snapshot is DV-free; refs point only at exported ones
    val snaps = (j \ "snapshots") match { case JArray(xs) => xs; case _ => Nil }
    val snapIds = snaps.map(s => (s \ "snapshot-id") match {
      case JInt(x) => x.toLong; case other => fail(s"bad id $other")
    }).toSet
    (j \ "refs" \ "main" \ "snapshot-id") match {
      case JInt(x) => assert(snapIds.contains(x.toLong))
      case other => fail(s"bad main ref $other")
    }

    // replay the CURRENT snapshot from the exported avro alone: data
    // files anti-joined with the exported pos-delete parquet == MOR view
    val currentId = (j \ "current-snapshot-id") match {
      case JInt(x) => x.toLong; case other => fail(s"bad current $other")
    }
    val snapJ = snaps.find(s => (s \ "snapshot-id") == JInt(BigInt(currentId))).get
    val listPath = (snapJ \ "manifest-list") match { case JString(p) => p; case _ => fail() }
    val (listEntries, _) = IcebergExport.readAvro(listPath)
    val entries = listEntries.flatMap { le =>
      val (recs, _) = IcebergExport.readAvro(le.get("manifest_path").toString)
      recs.map { r =>
        val df = r.get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord]
        (df.get("file_path").toString, df.get("content").asInstanceOf[Int])
      }
    }
    val dataPaths = entries.filter(_._2 == 0).map(_._1)
    val posPaths = entries.filter(_._2 == 1).map(_._1)
    assert(dataPaths.nonEmpty && posPaths.nonEmpty)
    val data = spark.read.parquet(dataPaths: _*)
    val dead = spark.read.parquet(posPaths: _*)
    assert(data.count() == 25 && dead.count() == 5)
    // v2 MOR replay: (path, pos) anti join, the exported representation
    val tagged = data.withColumn("__fp",
      graft.exec.Mor.normalizePath(col("_metadata.file_path")))
      .withColumn("__pos", col("_metadata.row_index"))
    val alive = tagged.join(dead,
      tagged("__fp") === dead("file_path") && tagged("__pos") === dead("pos"),
      "left_anti")
    assert(alive.count() == 20)
  }

  test("exporting a current snapshot that still carries DVs is refused in allowV3 mode") {
    val catalog = LocalCatalog(Files.createTempDirectory("ice-exp-dv3").toString)
    val src = spark.read.parquet(s"$sf/region.parquet")
    IceWrite.create(spark, catalog, "t_dv3", src)
    IceWrite.deleteWhereDv(spark, catalog, "t_dv3", col("r_regionkey") === 0L)
    val e = intercept[IllegalArgumentException](
      IcebergExport.exportIcebergMetadata(catalog, "t_dv3", allowV3 = true))
    assert(e.getMessage.contains("convertDeletionVectorsToPositionDeletes"))
  }
}
