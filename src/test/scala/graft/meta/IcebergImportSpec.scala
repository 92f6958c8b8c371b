package graft.meta

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The interop loop closed: a graft table exported to Iceberg-v2
  * metadata imports back into a FRESH catalog and reads identically —
  * MOR semantics (equality deletes + sequence rules), time travel,
  * partition pruning, refs. Data files are referenced in place; the
  * import costs metadata only. */
class IcebergImportSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.001"

  test("export -> import round trip: same MOR view, snapshots, refs") {
    val srcCat = LocalCatalog(Files.createTempDirectory("ice-rt-src").toString)
    val src = spark.read.parquet(s"$sf/customer.parquet")
    IceWrite.create(spark, srcCat, "t_rt", src)
    IceWrite.append(spark, srcCat, "t_rt",
      src.withColumn("c_custkey", col("c_custkey") + 1000))
    IceWrite.appendEqualityDeletes(spark, srcCat, "t_rt",
      src.filter(col("c_custkey") < 7).select(col("c_custkey")), Seq("c_custkey"))
    IceWrite.createTag(srcCat, "t_rt", "v1", 1L)
    val orig = srcCat.loadTable("t_rt")

    val jsonPath = IcebergExport.exportIcebergMetadata(srcCat, "t_rt")

    val dstCat = LocalCatalog(Files.createTempDirectory("ice-rt-dst").toString)
    val back = IcebergImport.importIcebergMetadata(dstCat, "t_back", jsonPath)

    // schema ids/names/types survive
    assert(back.schema == orig.schema)
    assert(back.tags == orig.tags)
    assert(back.currentSnapshotId == orig.currentSnapshotId)
    assert(back.snapshots.map(_.snapshotId) == orig.snapshots.map(_.snapshotId))
    assert(back.snapshots.map(_.sequenceNumber) == orig.snapshots.map(_.sequenceNumber))

    // the MOR view through the imported metadata equals the original
    val a = IceRead.table(spark, srcCat, "t_rt")
    val b = IceRead.table(spark, dstCat, "t_back")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    assert(b.count() == 2 * src.count() - 7) // keys 0..6 deleted

    // zone maps survive the trip: exported bounds decode back into
    // manifest columnStats, so the imported table prunes files WITHOUT
    // footer reads
    val origStats = orig.currentSnapshot.get.manifest
      .filter(_.content == FileContent.Data).map(f => f.path -> f.columnStats).toMap
    back.currentSnapshot.get.manifest.filter(_.content == FileContent.Data)
      .foreach { f =>
        val want = origStats(f.path)
        assert(want.keySet.contains("c_custkey") && f.columnStats.contains("c_custkey"),
          s"${f.path}: imported entry lost its c_custkey zone map")
        want.foreach { case (colName, (mn, mx)) =>
          f.columnStats.get(colName).foreach { case (bmn, bmx) =>
            // numeric bounds compare as numbers; string bounds (since the
            // footer collector records UTF8 stats) compare verbatim
            val same = scala.util.Try(
              BigDecimal(bmn) == BigDecimal(mn) && BigDecimal(bmx) == BigDecimal(mx))
              .getOrElse(bmn == mn && bmx == mx)
            assert(same, s"${f.path}/$colName: bounds drift ($bmn,$bmx) != ($mn,$mx)")
          }
        }
        assert(f.nullCounts.get("c_custkey").contains(0L))
      }

    // time travel through the imported history
    val atV1 = IceRead.tableAt(spark, dstCat, "t_back", 1L)
    assert(atV1.count() == src.count())
  }

  test("partitioned export/import keeps partition values and pruning") {
    val srcCat = LocalCatalog(Files.createTempDirectory("ice-rt-p-src").toString)
    val src = spark.read.parquet(s"$sf/nation.parquet")
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    IceWrite.create(spark, srcCat, "t_p", src,
      partitionSpec = Seq(PartitionField("n_regionkey")))
    val jsonPath = IcebergExport.exportIcebergMetadata(srcCat, "t_p")
    val dstCat = LocalCatalog(Files.createTempDirectory("ice-rt-p-dst").toString)
    val back = IcebergImport.importIcebergMetadata(dstCat, "t_pb", jsonPath)
    assert(back.partitionSpec == Seq(PartitionField("n_regionkey")))
    val entries = back.currentSnapshot.get.manifest
    assert(entries.forall(_.partitionValues.contains("n_regionkey")))
    val a = IceRead.table(spark, srcCat, "t_p")
    val b = IceRead.table(spark, dstCat, "t_pb")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("DATE-partitioned export encodes int days (spec partition data); import round-trips") {
    val s = spark
    import s.implicits._
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val srcCat = LocalCatalog(Files.createTempDirectory("ice-date-src").toString)
    val src = Seq((1L, "2026-01-01"), (2L, "2026-01-02"), (3L, "2026-01-01"))
      .toDF("id", "d").withColumn("d", to_date(col("d")))
    IceWrite.create(spark, srcCat, "t_date", src,
      partitionSpec = Seq(PartitionField("d")))
    val jsonPath = IcebergExport.exportIcebergMetadata(srcCat, "t_date")

    // RAW avro: conforming readers see int days since epoch, not a string
    val j = JsonMethods.parse(MetaIO.readString(jsonPath))
    val listPath = (j \ "snapshots")(0) \ "manifest-list" match {
      case JString(p) => p; case _ => fail("no manifest list")
    }
    val (listEntries, _) = IcebergExport.readAvro(listPath)
    val days = listEntries.flatMap { le =>
      IcebergExport.readAvro(le.get("manifest_path").toString)._1.map { r =>
        r.get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord]
          .get("partition").asInstanceOf[org.apache.avro.generic.GenericRecord]
          .get("d")
      }
    }
    assert(days.nonEmpty && days.forall(_.isInstanceOf[Integer]),
      s"date partition values must be avro ints, got ${days.map(_.getClass)}")
    val wantDays = Set(java.time.LocalDate.parse("2026-01-01").toEpochDay.toInt,
      java.time.LocalDate.parse("2026-01-02").toEpochDay.toInt)
    assert(days.map(_.asInstanceOf[Integer].intValue).toSet == wantDays)

    // import converts back to the literal day string; pruning exact
    val dstCat = LocalCatalog(Files.createTempDirectory("ice-date-dst").toString)
    val back = IcebergImport.importIcebergMetadata(dstCat, "t_date_b", jsonPath)
    assert(back.currentSnapshot.get.manifest.forall(
      _.partitionValues.get("d").exists(v => v == "2026-01-01" || v == "2026-01-02")))
    val day1 = IceRead.tablePartition(spark, dstCat, "t_date_b", Map("d" -> "2026-01-01"))
    assert(day1.count() == 2)
    assert(IceRead.table(spark, dstCat, "t_date_b").count() == 3)
  }

  /** A FOREIGN two-spec fixture, hand-built to the published spec layout
    * (no graft writer involved): the table began under spec 0 =
    * identity(n_regionkey) and evolved to spec 1 = identity(n_regionkey)
    * + bucket[4](n_nationkey) (the default). One data file and one
    * PARTITION-SCOPED equality delete were written under spec 0; one data
    * file under spec 1. Import must decode each manifest with ITS spec,
    * record per-file spec markers, and keep the scoped delete from
    * leaking across specs in the MOR view. */
  test("foreign two-spec table (identity -> identity+bucket) imports per-file specs") {
    import org.apache.avro.Schema
    import org.apache.avro.generic.GenericData
    import org.json4s._
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods

    val dir = Files.createTempDirectory("ice-2spec")
    val schemaFields = Seq(
      SchemaField(1, "n_nationkey", "BIGINT", nullable = false),
      SchemaField(2, "n_name", "STRING"),
      SchemaField(3, "n_regionkey", "BIGINT", nullable = false))

    // --- data + delete parquet (field ids stamped, like any Iceberg writer)
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    val nat = spark.read.parquet(s"$sf/nation.parquet")
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    // file A (spec 0): region-0 rows except nationkey 5
    val dfA = IceWrite.withFieldIds(
      nat.filter(col("n_regionkey") === 0 && col("n_nationkey") =!= 5), schemaFields)
    val (pA, szA, rowsA, _) =
      graft.testkit.FileGenerator.writeSingleParquet(spark, dfA, dir.resolve("a.parquet"))
    // file B (spec 1): exactly nationkey 5 (region 0), one bucket ordinal
    val dfB = IceWrite.withFieldIds(nat.filter(col("n_nationkey") === 5), schemaFields)
    val (pB, szB, rowsB, _) =
      graft.testkit.FileGenerator.writeSingleParquet(spark, dfB, dir.resolve("b.parquet"))
    assert(rowsB == 1L)
    val bucketOf5 = graft.functions.IcebergBucketUtil.bucketLong(5L, 4)
    // scoped eq-delete (spec 0, partition n_regionkey=0): keys 0 AND 5.
    // Key 0 lives in file A (same spec+partition -> deleted); key 5 lives
    // in file B (DIFFERENT spec) — scoped deletes must not cross specs,
    // so nation 5 must survive.
    val delDf = IceWrite.withFieldIds(
      nat.filter(col("n_nationkey").isin(0, 5)).select(col("n_nationkey")),
      schemaFields.filter(_.name == "n_nationkey"))
    val (pD, szD, rowsD, _) =
      graft.testkit.FileGenerator.writeSingleParquet(spark, delDf, dir.resolve("d.parquet"))

    // --- manifests, one per (spec, content), via the spec's avro layout
    val metaSpec0 = TableMetadata("fx", dir.toString, schema = schemaFields,
      partitionSpec = Seq(PartitionField("n_regionkey")))
    val metaSpec1 = metaSpec0.copy(partitionSpec = Seq(
      PartitionField("n_regionkey"), PartitionField("n_nationkey", "bucket[4]")))
    val mSchema0 = new Schema.Parser().parse(IcebergExport.manifestSchemaJson(metaSpec0))
    val mSchema1 = new Schema.Parser().parse(IcebergExport.manifestSchemaJson(metaSpec1))

    def entry(mSchema: Schema, path: String, size: Long, rows: Long, seq: Long,
        content: Int, part: Map[String, AnyRef], eqIds: Seq[Int]): GenericData.Record = {
      val dfSchema = mSchema.getField("data_file").schema()
      val partRec = new GenericData.Record(dfSchema.getField("partition").schema())
      part.foreach { case (k, v) => partRec.put(k, v) }
      val df = new GenericData.Record(dfSchema)
      df.put("content", Integer.valueOf(content))
      df.put("file_path", path)
      df.put("file_format", "PARQUET")
      df.put("partition", partRec)
      df.put("record_count", java.lang.Long.valueOf(rows))
      df.put("file_size_in_bytes", java.lang.Long.valueOf(size))
      if (eqIds.nonEmpty) {
        val l = new java.util.ArrayList[Integer]()
        eqIds.foreach(i => l.add(Integer.valueOf(i)))
        df.put("equality_ids", l)
      }
      val e = new GenericData.Record(mSchema)
      e.put("status", Integer.valueOf(1)) // ADDED
      e.put("snapshot_id", java.lang.Long.valueOf(99L))
      e.put("sequence_number", java.lang.Long.valueOf(seq))
      e.put("file_sequence_number", java.lang.Long.valueOf(seq))
      df.put("sort_order_id", null)
      e.put("data_file", df)
      e
    }

    val mA = MetaIO.join(dir.toString, "mA.avro") // spec 0 data
    val mB = MetaIO.join(dir.toString, "mB.avro") // spec 1 data
    val mD = MetaIO.join(dir.toString, "mD.avro") // spec 0 scoped eq-delete
    val lenA = IcebergExport.avroWrite(mA, mSchema0,
      Map("format-version" -> "2", "content" -> "data"),
      Seq(entry(mSchema0, pA, szA, rowsA, 1L, 0,
        Map("n_regionkey" -> java.lang.Long.valueOf(0L)), Nil)))
    val lenB = IcebergExport.avroWrite(mB, mSchema1,
      Map("format-version" -> "2", "content" -> "data"),
      Seq(entry(mSchema1, pB, szB, rowsB, 2L, 0,
        Map("n_regionkey" -> java.lang.Long.valueOf(0L),
          "n_nationkey_bucket" -> Integer.valueOf(bucketOf5)), Nil)))
    val lenD = IcebergExport.avroWrite(mD, mSchema0,
      Map("format-version" -> "2", "content" -> "deletes"),
      Seq(entry(mSchema0, pD, szD, rowsD, 3L, 2,
        Map("n_regionkey" -> java.lang.Long.valueOf(0L)), Seq(1)))) // id 1 = n_nationkey

    // --- manifest list
    val listSchema = new Schema.Parser().parse(IcebergExport.manifestListSchemaJson)
    def listEntry(path: String, len: Long, specId: Int, content: Int,
        seq: Long, rows: Long): GenericData.Record = {
      val le = new GenericData.Record(listSchema)
      le.put("manifest_path", path)
      le.put("manifest_length", java.lang.Long.valueOf(len))
      le.put("partition_spec_id", Integer.valueOf(specId))
      le.put("content", Integer.valueOf(content))
      le.put("sequence_number", java.lang.Long.valueOf(seq))
      le.put("min_sequence_number", java.lang.Long.valueOf(seq))
      le.put("added_snapshot_id", java.lang.Long.valueOf(99L))
      le.put("added_files_count", Integer.valueOf(1))
      le.put("existing_files_count", Integer.valueOf(0))
      le.put("deleted_files_count", Integer.valueOf(0))
      le.put("added_rows_count", java.lang.Long.valueOf(rows))
      le.put("existing_rows_count", java.lang.Long.valueOf(0L))
      le.put("deleted_rows_count", java.lang.Long.valueOf(0L))
      le
    }
    val listPath = MetaIO.join(dir.toString, "snap-99.avro")
    IcebergExport.avroWrite(listPath, listSchema, Map("format-version" -> "2"),
      Seq(listEntry(mA, lenA, 0, 0, 1L, rowsA),
        listEntry(mB, lenB, 1, 0, 2L, rowsB),
        listEntry(mD, lenD, 0, 1, 3L, rowsD)))

    // --- table metadata JSON: spec 1 is the default; spec 0 is history
    def specFieldJ(name: String, transform: String, sourceId: Int, fid: Int): JValue =
      ("name" -> name) ~ ("transform" -> transform) ~
        ("source-id" -> sourceId) ~ ("field-id" -> fid)
    val metadataJ: JValue =
      ("format-version" -> 2) ~
        ("table-uuid" -> "00000000-0000-0000-0000-000000000002") ~
        ("location" -> dir.toString) ~
        ("last-sequence-number" -> 3) ~
        ("last-updated-ms" -> 1L) ~
        ("last-column-id" -> 3) ~
        ("current-schema-id" -> 0) ~
        ("schemas" -> List(
          ("type" -> "struct") ~ ("schema-id" -> 0) ~ ("fields" -> List(
            ("id" -> 1) ~ ("name" -> "n_nationkey") ~ ("required" -> true) ~ ("type" -> "long"),
            ("id" -> 2) ~ ("name" -> "n_name") ~ ("required" -> false) ~ ("type" -> "string"),
            ("id" -> 3) ~ ("name" -> "n_regionkey") ~ ("required" -> true) ~ ("type" -> "long"))))) ~
        ("default-spec-id" -> 1) ~
        ("partition-specs" -> List(
          ("spec-id" -> 0) ~ ("fields" -> List(
            specFieldJ("n_regionkey", "identity", 3, 1000))),
          ("spec-id" -> 1) ~ ("fields" -> List(
            specFieldJ("n_regionkey", "identity", 3, 1000),
            specFieldJ("n_nationkey_bucket", "bucket[4]", 1, 1001))))) ~
        ("last-partition-id" -> 1001) ~
        ("default-sort-order-id" -> 0) ~
        ("sort-orders" -> List(("order-id" -> 0) ~ ("fields" -> JArray(Nil)))) ~
        ("current-snapshot-id" -> 99L) ~
        ("refs" -> ("main" -> (("snapshot-id" -> 99L) ~ ("type" -> "branch")))) ~
        ("snapshots" -> List(
          ("snapshot-id" -> 99L) ~ ("sequence-number" -> 3) ~
            ("timestamp-ms" -> 1L) ~ ("manifest-list" -> listPath) ~
            ("summary" -> ("operation" -> "append")) ~ ("schema-id" -> 0))) ~
        ("snapshot-log" -> JArray(Nil)) ~ ("metadata-log" -> JArray(Nil))
    val jsonPath = MetaIO.join(dir.toString, "00000-fx.metadata.json")
    MetaIO.writeString(jsonPath, JsonMethods.pretty(JsonMethods.render(metadataJ)))

    // --- import and verify
    val cat = LocalCatalog(Files.createTempDirectory("ice-2spec-cat").toString)
    val back = IcebergImport.importIcebergMetadata(cat, "t_2spec", jsonPath)

    // table spec = the DEFAULT (evolved) spec
    assert(back.partitionSpec == Seq(
      PartitionField("n_regionkey"), PartitionField("n_nationkey", "bucket[4]")))
    val manifest = back.currentSnapshot.get.manifest
    val entryA = manifest.find(_.path == pA).get
    val entryB = manifest.find(_.path == pB).get
    val entryD = manifest.find(_.path == pD).get
    // per-file spec markers: default spec -> 0, historical spec 0 -> 0+1
    assert(entryA.specId == 1 && entryD.specId == 1 && entryB.specId == 0)
    // per-file partition values decoded with the file's OWN spec
    assert(entryA.partitionValues == Map("n_regionkey" -> "0"))
    assert(entryB.partitionValues == Map(
      "n_regionkey" -> "0", "n_nationkey" -> bucketOf5.toString))

    // scoped-delete attachment respects the spec boundary
    val tasks = back.scanTasks(back.currentSnapshot.get)
    assert(tasks.find(_.path == pA).get.deletes == Seq(pD))
    assert(tasks.find(_.path == pB).get.deletes.isEmpty,
      "spec-0-scoped delete must not attach to the spec-1 data file")

    // MOR view: nation 0 deleted (file A, same spec+partition); nation 5
    // SURVIVES (file B, different spec)
    val got = IceRead.table(spark, cat, "t_2spec")
    assert(got.count() == rowsA - 1 + 1)
    assert(got.filter(col("n_nationkey") === 5).count() == 1)
    assert(got.filter(col("n_nationkey") === 0).count() == 0)

    // the import recorded the historical spec's DEFINITION, so re-export
    // is spec-faithful: both specs emitted, per-manifest spec ids, and a
    // second import round-trips the MOR view exactly
    val reJson = IcebergExport.exportIcebergMetadata(cat, "t_2spec")
    val rj = JsonMethods.parse(MetaIO.readString(reJson))
    val reSpecs = (rj \ "partition-specs") match { case JArray(xs) => xs; case _ => Nil }
    assert(reSpecs.size == 2, "re-export must emit the historical spec too")
    val cat2 = LocalCatalog(Files.createTempDirectory("ice-2spec-cat2").toString)
    val back2 = IcebergImport.importIcebergMetadata(cat2, "t_2spec_rt", reJson)
    assert(back2.historicalSpecs.values.toSeq.contains(Seq(PartitionField("n_regionkey"))))
    val rt = IceRead.table(spark, cat2, "t_2spec_rt")
    assert(rt.count() == got.count())
    assert(rt.exceptAll(got).isEmpty && got.exceptAll(rt).isEmpty)
  }

  /** A FOREIGN format-v3 table, hand-built the way a v3 writer lays it
    * out: a Puffin deletion vector addressed by a content=1 manifest
    * entry (referenced_data_file + blob byte range), row lineage via
    * manifest-level first_row_id INHERITANCE (data files carry null), a
    * schema initial-default on a column the data file predates, and
    * metadata next-row-id. Import must reconstruct MOR semantics, row
    * ids, and the default fill — then re-export as v3 and round-trip. */
  test("foreign v3 table: DV + row-lineage inheritance + initial-default import") {
    import org.apache.avro.Schema
    import org.apache.avro.generic.GenericData
    import org.json4s._
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods

    val dir = Files.createTempDirectory("ice-v3fx")
    val schemaFields = Seq(
      SchemaField(1, "n_nationkey", "BIGINT", nullable = false),
      SchemaField(2, "n_name", "STRING"),
      SchemaField(3, "n_regionkey", "BIGINT", nullable = false))

    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    val nat = spark.read.parquet(s"$sf/nation.parquet")
      .select(col("n_nationkey").cast("bigint").as("n_nationkey"), col("n_name"),
        col("n_regionkey").cast("bigint").as("n_regionkey"))
      .orderBy(col("n_nationkey"))
    val dfData = IceWrite.withFieldIds(nat, schemaFields)
    val (pData, szData, rowsData, _) =
      graft.testkit.FileGenerator.writeSingleParquet(spark, dfData, dir.resolve("d.parquet"))
    assert(rowsData == 25L)
    // which keys sit at file positions 0/3/7 (the DV tombstones)
    val keysInOrder = spark.read.parquet(pData).select("n_nationkey")
      .collect().map(_.getLong(0)).toSeq
    val deletedKeys = Seq(0, 3, 7).map(keysInOrder)

    // --- the deletion vector: a spec deletion-vector-v1 blob in a Puffin
    // container, addressed by byte range
    val dvPath = MetaIO.join(dir.toString, "del.puffin")
    val bm = Puffin.PositionBitmap.of(Seq(0L, 3L, 7L))
    val blobMeta = Puffin.write(dvPath,
      Seq(Puffin.Blob(Puffin.DvBlobType, Puffin.encodeDvBlob(bm), 99L, 2L))).head

    // --- v3 manifests (unpartitioned)
    val metaFx = TableMetadata("fx3", dir.toString, schema = schemaFields)
    val mSchema = new Schema.Parser().parse(
      IcebergExport.manifestSchemaJsonFor(metaFx, Nil, _ => 1000, fv = 3))
    def entry(path: String, fmt: String, size: Long, rows: Long, seq: Long,
        content: Int, dv: Option[Puffin.BlobMeta]): GenericData.Record = {
      val dfSchema = mSchema.getField("data_file").schema()
      val df = new GenericData.Record(dfSchema)
      df.put("content", Integer.valueOf(content))
      df.put("file_path", path)
      df.put("file_format", fmt)
      df.put("partition", new GenericData.Record(dfSchema.getField("partition").schema()))
      df.put("record_count", java.lang.Long.valueOf(rows))
      df.put("file_size_in_bytes", java.lang.Long.valueOf(size))
      dv.foreach { m =>
        df.put("referenced_data_file", pData)
        df.put("content_offset", java.lang.Long.valueOf(m.offset))
        df.put("content_size_in_bytes", java.lang.Long.valueOf(m.length))
      }
      // first_row_id stays NULL: the importer must assign it from the
      // manifest's first_row_id (spec inheritance)
      val e = new GenericData.Record(mSchema)
      e.put("status", Integer.valueOf(1))
      e.put("snapshot_id", java.lang.Long.valueOf(99L))
      e.put("sequence_number", java.lang.Long.valueOf(seq))
      e.put("file_sequence_number", java.lang.Long.valueOf(seq))
      e.put("data_file", df)
      e
    }
    val mData = MetaIO.join(dir.toString, "m-data.avro")
    val mDel = MetaIO.join(dir.toString, "m-del.avro")
    val lenData = IcebergExport.avroWrite(mData, mSchema,
      Map("format-version" -> "3", "content" -> "data"),
      Seq(entry(pData, "PARQUET", szData, rowsData, 1L, 0, None)))
    val lenDel = IcebergExport.avroWrite(mDel, mSchema,
      Map("format-version" -> "3", "content" -> "deletes"),
      Seq(entry(dvPath, "PUFFIN", MetaIO.size(dvPath), bm.cardinality, 2L, 1,
        Some(blobMeta))))

    // --- manifest list (v3: carries first_row_id for lineage inheritance)
    val listSchema = new Schema.Parser().parse(IcebergExport.manifestListSchemaJsonV(3))
    def listEntry(path: String, len: Long, content: Int, seq: Long, rows: Long,
        firstRowId: Option[Long]): GenericData.Record = {
      val le = new GenericData.Record(listSchema)
      le.put("manifest_path", path)
      le.put("manifest_length", java.lang.Long.valueOf(len))
      le.put("partition_spec_id", Integer.valueOf(0))
      le.put("content", Integer.valueOf(content))
      le.put("sequence_number", java.lang.Long.valueOf(seq))
      le.put("min_sequence_number", java.lang.Long.valueOf(seq))
      le.put("added_snapshot_id", java.lang.Long.valueOf(99L))
      le.put("added_files_count", Integer.valueOf(1))
      le.put("existing_files_count", Integer.valueOf(0))
      le.put("deleted_files_count", Integer.valueOf(0))
      le.put("added_rows_count", java.lang.Long.valueOf(rows))
      le.put("existing_rows_count", java.lang.Long.valueOf(0L))
      le.put("deleted_rows_count", java.lang.Long.valueOf(0L))
      firstRowId.foreach(r => le.put("first_row_id", java.lang.Long.valueOf(r)))
      le
    }
    val listPath = MetaIO.join(dir.toString, "snap-99.avro")
    IcebergExport.avroWrite(listPath, listSchema, Map("format-version" -> "3"),
      Seq(listEntry(mData, lenData, 0, 1L, rowsData, Some(100L)),
        listEntry(mDel, lenDel, 1, 2L, bm.cardinality, None)))

    // --- v3 table metadata: next-row-id, and a column the data file
    // PREDATES whose initial-default fills file-absent reads
    val metadataJ: JValue =
      ("format-version" -> 3) ~
        ("table-uuid" -> "00000000-0000-0000-0000-000000000003") ~
        ("location" -> dir.toString) ~
        ("last-sequence-number" -> 2) ~
        ("last-updated-ms" -> 1L) ~
        ("last-column-id" -> 4) ~
        ("next-row-id" -> 125L) ~
        ("current-schema-id" -> 0) ~
        ("schemas" -> List(
          ("type" -> "struct") ~ ("schema-id" -> 0) ~ ("fields" -> List(
            ("id" -> 1) ~ ("name" -> "n_nationkey") ~ ("required" -> true) ~ ("type" -> "long"),
            ("id" -> 2) ~ ("name" -> "n_name") ~ ("required" -> false) ~ ("type" -> "string"),
            ("id" -> 3) ~ ("name" -> "n_regionkey") ~ ("required" -> true) ~ ("type" -> "long"),
            ("id" -> 4) ~ ("name" -> "tier") ~ ("required" -> false) ~ ("type" -> "string") ~
              ("initial-default" -> "bronze") ~ ("write-default" -> "bronze"))))) ~
        ("default-spec-id" -> 0) ~
        ("partition-specs" -> List(("spec-id" -> 0) ~ ("fields" -> JArray(Nil)))) ~
        ("last-partition-id" -> 999) ~
        ("default-sort-order-id" -> 0) ~
        ("sort-orders" -> List(("order-id" -> 0) ~ ("fields" -> JArray(Nil)))) ~
        ("current-snapshot-id" -> 99L) ~
        ("refs" -> ("main" -> (("snapshot-id" -> 99L) ~ ("type" -> "branch")))) ~
        ("snapshots" -> List(
          ("snapshot-id" -> 99L) ~ ("sequence-number" -> 2) ~
            ("timestamp-ms" -> 1L) ~ ("manifest-list" -> listPath) ~
            ("first-row-id" -> 100L) ~
            ("summary" -> ("operation" -> "overwrite")) ~ ("schema-id" -> 0))) ~
        ("snapshot-log" -> JArray(Nil)) ~ ("metadata-log" -> JArray(Nil))
    val jsonPath = MetaIO.join(dir.toString, "00000-fx3.metadata.json")
    MetaIO.writeString(jsonPath, JsonMethods.pretty(JsonMethods.render(metadataJ)))

    // --- import and verify
    val cat = LocalCatalog(Files.createTempDirectory("ice-v3fx-cat").toString)
    val back = IcebergImport.importIcebergMetadata(cat, "t_v3", jsonPath)
    assert(back.formatVersion == 3)
    assert(back.nextRowId == 125L)
    val manifest = back.currentSnapshot.get.manifest
    val dvEntry = manifest.find(_.isDeletionVector).get
    assert(dvEntry.referencedDataFile.contains(pData))
    assert(dvEntry.contentOffset.contains(blobMeta.offset) &&
      dvEntry.contentSizeInBytes.contains(blobMeta.length))
    // lineage inheritance assigned the manifest's first_row_id
    assert(manifest.find(_.path == pData).get.firstRowId.contains(100L))
    // the initial-default landed as a graft SQL literal
    assert(back.schema.find(_.name == "tier").get.initialDefault.contains("'bronze'"))

    // MOR view: exactly the DV-tombstoned positions are gone; the
    // file-absent column reads its default
    val got = IceRead.table(spark, cat, "t_v3")
    assert(got.count() == rowsData - 3)
    deletedKeys.foreach(k =>
      assert(got.filter(col("n_nationkey") === k).count() == 0, s"key $k must be deleted"))
    assert(got.filter(col("tier") === "bronze").count() == rowsData - 3)
    // row ids: firstRowId + position, with tombstoned positions absent
    val ids = IceRead.tableWithRowIds(spark, cat, "t_v3")
      .select("_row_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == (100L until 125L).filterNot(Seq(100L, 103L, 107L).contains))

    // --- v3 re-export round-trips (DV coordinates, lineage, defaults)
    val reJson = IcebergExport.exportIcebergMetadata(cat, "t_v3")
    assert((JsonMethods.parse(MetaIO.readString(reJson)) \ "format-version") == JInt(3))
    val cat2 = LocalCatalog(Files.createTempDirectory("ice-v3fx-cat2").toString)
    val back2 = IcebergImport.importIcebergMetadata(cat2, "t_v3rt", reJson)
    assert(back2.nextRowId == 125L)
    val rt = IceRead.table(spark, cat2, "t_v3rt")
    assert(rt.exceptAll(got).isEmpty && got.exceptAll(rt).isEmpty)
    val rtIds = IceRead.tableWithRowIds(spark, cat2, "t_v3rt")
      .select("_row_id").collect().map(_.getLong(0)).sorted
    assert(rtIds.toSeq == ids.toSeq, "row lineage must survive the round trip")
  }

  test("attach by HadoopCatalog table directory: version-hint resolution") {
    // a foreign HadoopCatalog layout: <table>/metadata/v<N>.metadata.json
    // + version-hint.text naming the current N
    val srcCat = LocalCatalog(Files.createTempDirectory("ice-hint-src").toString)
    val src = spark.read.parquet(s"$sf/region.parquet")
    IceWrite.create(spark, srcCat, "t_h", src)
    val exported = IcebergExport.exportIcebergMetadata(srcCat, "t_h")
    val tableDir = Files.createTempDirectory("ice-hint-tbl").toString
    MetaIO.mkdirs(MetaIO.join(tableDir, "metadata"))
    MetaIO.writeString(MetaIO.join(tableDir, "metadata", "v1.metadata.json"),
      """{"format-version": 4}""") // stale version: must NOT be picked
    MetaIO.writeString(MetaIO.join(tableDir, "metadata", "v3.metadata.json"),
      MetaIO.readString(exported))
    MetaIO.writeString(MetaIO.join(tableDir, "metadata", "version-hint.text"), "3\n")

    val dst = LocalCatalog(Files.createTempDirectory("ice-hint-dst").toString)
    val back = IcebergImport.importIcebergMetadata(dst, "t_hb", tableDir)
    assert(IceRead.table(spark, dst, "t_hb").count() == src.count())

    // without the hint, the newest *.metadata.json wins
    val dir2 = Files.createTempDirectory("ice-hint2").toString
    MetaIO.mkdirs(MetaIO.join(dir2, "metadata"))
    MetaIO.writeString(MetaIO.join(dir2, "metadata", "00000-a.metadata.json"),
      """{"format-version": 4}""")
    MetaIO.writeString(MetaIO.join(dir2, "metadata", "00001-b.metadata.json"),
      MetaIO.readString(exported))
    val back2 = IcebergImport.importIcebergMetadata(dst, "t_hb2", dir2)
    assert(back2.currentSnapshotId == back.currentSnapshotId)
    // no hint + UNPADDED HadoopCatalog names: v10 must beat v9
    // NUMERICALLY ("v10" < "v9" lexicographically — a 10+-version table
    // would silently attach a stale snapshot history otherwise)
    val dir3 = Files.createTempDirectory("ice-hint10").toString
    MetaIO.mkdirs(MetaIO.join(dir3, "metadata"))
    MetaIO.writeString(MetaIO.join(dir3, "metadata", "v9.metadata.json"),
      """{"format-version": 4}""") // stale: lexicographically LAST
    MetaIO.writeString(MetaIO.join(dir3, "metadata", "v10.metadata.json"),
      MetaIO.readString(exported))
    val back3 = IcebergImport.importIcebergMetadata(dst, "t_hb3", dir3)
    assert(back3.currentSnapshotId == back.currentSnapshotId)
    // a directory with no metadata at all refuses with a clear error
    val e = intercept[IllegalArgumentException](IcebergImport.importIcebergMetadata(
      dst, "t_none", Files.createTempDirectory("ice-hint3").toString))
    assert(e.getMessage.contains("metadata"))
  }

  test("unknown format versions are refused") {
    val dir = Files.createTempDirectory("ice-rt-bad").toString
    val p = MetaIO.join(dir, "bad.metadata.json")
    MetaIO.writeString(p, """{"format-version": 4}""")
    val cat = LocalCatalog(Files.createTempDirectory("ice-rt-bad-c").toString)
    val e = intercept[IllegalArgumentException](
      IcebergImport.importIcebergMetadata(cat, "t_bad", p))
    assert(e.getMessage.contains("format-version"))
  }
}
