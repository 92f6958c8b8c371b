package graft.meta

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.compaction.Compaction
import graft.selection.{FullCompactionConfig, PlanningParams}

/** Field-id schema evolution end-to-end: rename / add / drop are metadata-
  * only commits, and the MOR read stays correct because files are matched
  * by parquet field id, not name (the reference's `field_by_id` addressing,
  * datafusion_processor.rs:693,741,835-841).
  */
class SchemaEvolutionSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def newCatalog(): LocalCatalog =
    LocalCatalog(Files.createTempDirectory("graft-wh").toString)

  private def df(rows: Seq[(Long, String, Long)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "name", "qty")
  }

  test("rename: files written under the old name resolve by field id") {
    val catalog = newCatalog()
    IceWrite.create(spark, catalog, "t_ren",
      df(Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))))

    val meta = SchemaEvolution.renameColumn(catalog, "t_ren", "qty", "quantity")
    assert(meta.schemaColumns == Seq("id", "name", "quantity"))
    // same field id, new name — no data file was touched
    assert(meta.fieldByName("quantity").get.id == 3)

    // append AFTER the rename: new files store the column as "quantity"
    val s = spark
    import s.implicits._
    IceWrite.append(spark, catalog, "t_ren",
      Seq((4L, "d", 40L)).toDF("id", "name", "quantity"))

    val out = IceRead.table(spark, catalog, "t_ren")
      .select("id", "quantity").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)))
  }

  test("field-id reads never mutate the caller session's conf") {
    val catalog = newCatalog()
    IceWrite.create(spark, catalog, "t_conf", df(Seq((1L, "a", 10L), (2L, "b", 20L))))
    SchemaEvolution.renameColumn(catalog, "t_conf", "name", "label")
    val key = "spark.sql.parquet.fieldId.read.enabled"
    val before = spark.conf.getOption(key)
    // a typed MOR read resolves the renamed column BY ID — through a
    // scoped (cloned-session) reader, not a session-conf flip
    val out = IceRead.table(spark, catalog, "t_conf")
    assert(out.select("label").collect().map(_.getString(0)).toSet == Set("a", "b"))
    assert(spark.conf.getOption(key) == before, "read leaked a session conf change")
    IceWrite.deleteWhere(spark, catalog, "t_conf", col("id") === 1L)
    assert(IceRead.table(spark, catalog, "t_conf").count() == 1)
    assert(spark.conf.getOption(key) == before, "deleteWhere leaked a session conf change")
  }

  test("rename of an equality-delete key column keeps deletes applied") {
    val catalog = newCatalog()
    IceWrite.create(spark, catalog, "t_eqren",
      df(Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))))
    val s = spark
    import s.implicits._
    // delete id=2 by equality key, under the ORIGINAL column name
    IceWrite.appendEqualityDeletes(spark, catalog, "t_eqren",
      Seq(Tuple1(2L)).toDF("id"), Seq("id"))
    // rename the key column; the manifest's equalityFieldIds make the
    // delete resolve to the new name, and the delete file reads by id
    SchemaEvolution.renameColumn(catalog, "t_eqren", "id", "ident")

    val out = IceRead.table(spark, catalog, "t_eqren")
      .select("ident").collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 3L))
  }

  test("rename survives compaction: rewritten files keep field ids") {
    val catalog = newCatalog()
    IceWrite.create(spark, catalog, "t_rencomp",
      df((1L to 50L).map(i => (i, s"n$i", i * 10))), targetFileSizeBytes = 2048)
    SchemaEvolution.renameColumn(catalog, "t_rencomp", "qty", "quantity")

    val c = new Compaction(catalog, "t_rencomp", spark,
      config = FullCompactionConfig(PlanningParams(
        targetFileSizeBytes = 512L * 1024 * 1024,
        maxInputParallelism = 4, maxOutputParallelism = 2)),
      enableValidate = true)
    val res = c.compact()
    assert(res.addedFiles.nonEmpty)

    val out = IceRead.table(spark, catalog, "t_rencomp")
    assert(out.columns.toSeq == Seq("id", "name", "quantity"))
    assert(out.agg(sum("quantity")).head.getLong(0) == (1L to 50L).map(_ * 10).sum)

    // and a rename AFTER compaction still resolves the rewritten files
    SchemaEvolution.renameColumn(catalog, "t_rencomp", "quantity", "qty2")
    assert(IceRead.table(spark, catalog, "t_rencomp")
      .agg(sum("qty2")).head.getLong(0) == (1L to 50L).map(_ * 10).sum)
  }

  test("add column: pre-existing files read NULL, new files carry values") {
    val catalog = newCatalog()
    IceWrite.create(spark, catalog, "t_add", df(Seq((1L, "a", 10L), (2L, "b", 20L))))
    val meta = SchemaEvolution.addColumn(catalog, "t_add", "score", "BIGINT")
    assert(meta.fieldByName("score").get.id == 4)
    assert(meta.lastColumnId == 4)

    val s = spark
    import s.implicits._
    IceWrite.append(spark, catalog, "t_add",
      Seq((3L, "c", 30L, 99L)).toDF("id", "name", "qty", "score"))

    val rows = IceRead.table(spark, catalog, "t_add")
      .select("id", "score").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(rows == Set((1L, -1L), (2L, -1L), (3L, 99L)))
  }

  test("add column with initial-default: old files read the default, explicit nulls survive") {
    val catalog = newCatalog()
    IceWrite.create(spark, catalog, "t_dflt", df(Seq((1L, "a", 10L), (2L, "b", 20L))))
    SchemaEvolution.addColumn(catalog, "t_dflt", "lang", "STRING", Some("'unknown'"))

    val s = spark
    import s.implicits._
    // a post-add file carrying a real value AND an explicit null
    IceWrite.append(spark, catalog, "t_dflt",
      Seq((3L, "c", 30L, Option("en")), (4L, "d", 40L, Option.empty[String]))
        .toDF("id", "name", "qty", "lang"))

    def langs = IceRead.table(spark, catalog, "t_dflt")
      .select("id", "lang").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    val before = langs
    assert(before == Map(1L -> Some("unknown"), 2L -> Some("unknown"),
      3L -> Some("en"), 4L -> None),
      s"per-file default semantics broken: $before")

    // compaction materializes the default into rewritten files; reads
    // are unchanged
    new graft.compaction.Compaction(catalog, "t_dflt", spark,
      config = graft.selection.FullCompactionConfig(
        graft.selection.PlanningParams(maxOutputParallelism = 1))).compact()
    assert(langs == before, "compaction changed default-column reads")

    // a non-literal default fails the commit eagerly
    intercept[IllegalArgumentException] {
      SchemaEvolution.addColumn(catalog, "t_dflt", "bad", "BIGINT", Some("id + 1"))
    }
    // so does a literal that does not CAST to the column type — it would
    // otherwise break the first read of every pre-existing file
    intercept[IllegalArgumentException] {
      SchemaEvolution.addColumn(catalog, "t_dflt", "bad2", "BIGINT", Some("'unknown'"))
    }
  }

  test("drop column, then re-add same name: old data does NOT resurrect") {
    val catalog = newCatalog()
    IceWrite.create(spark, catalog, "t_drop", df(Seq((1L, "a", 10L), (2L, "b", 20L))))
    SchemaEvolution.dropColumn(catalog, "t_drop", "qty")
    assert(IceRead.table(spark, catalog, "t_drop").columns.toSeq == Seq("id", "name"))

    // re-added name gets a FRESH id (4, not the dropped 3): the old files'
    // qty data stays invisible
    val meta = SchemaEvolution.addColumn(catalog, "t_drop", "qty", "BIGINT")
    assert(meta.fieldByName("qty").get.id == 4)
    val rows = IceRead.table(spark, catalog, "t_drop")
      .select("id", "qty").collect()
      .map(r => (r.getLong(0), r.isNullAt(1))).toSet
    assert(rows == Set((1L, true), (2L, true)))
  }

  test("widen column type: old int32/float files read as BIGINT/DOUBLE") {
    val catalog = newCatalog()
    val s = spark
    import s.implicits._
    IceWrite.create(spark, catalog, "t_widen",
      Seq((1, 1.5f), (2, 2.5f)).toDF("a", "b"))
    assert(catalog.loadTable("t_widen").schema.map(_.dataType) == Seq("INT", "FLOAT"))

    SchemaEvolution.widenColumnType(catalog, "t_widen", "a", "BIGINT")
    SchemaEvolution.widenColumnType(catalog, "t_widen", "b", "DOUBLE")
    // append already-wide values; old narrow files up-convert on read
    IceWrite.append(spark, catalog, "t_widen", Seq((3L, 3.5d)).toDF("a", "b"))

    val out = IceRead.table(spark, catalog, "t_widen")
    assert(out.schema.map(_.dataType.sql) == Seq("BIGINT", "DOUBLE"))
    val rows = out.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(rows == Set((1L, 1.5), (2L, 2.5), (3L, 3.5)))

    // compaction rewrites the narrow files at the wide type; read stays right
    val c = new Compaction(catalog, "t_widen", spark,
      config = FullCompactionConfig(PlanningParams(
        targetFileSizeBytes = 512L * 1024 * 1024,
        maxInputParallelism = 2, maxOutputParallelism = 1)),
      enableValidate = true)
    c.compact()
    val after = IceRead.table(spark, catalog, "t_widen")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(after == rows)

    // narrowing and cross-family changes are rejected
    intercept[IllegalArgumentException] {
      SchemaEvolution.widenColumnType(catalog, "t_widen", "a", "INT")
    }
    intercept[IllegalArgumentException] {
      SchemaEvolution.widenColumnType(catalog, "t_widen", "b", "STRING")
    }
  }

  test("upsert after renaming the key column: old rows still replaced by id") {
    val catalog = newCatalog()
    IceWrite.create(spark, catalog, "t_renup",
      df(Seq((1L, "a", 10L), (2L, "b", 20L))))
    SchemaEvolution.renameColumn(catalog, "t_renup", "id", "ident")

    val s = spark
    import s.implicits._
    IceWrite.upsert(spark, catalog, "t_renup",
      Seq((2L, "B2", 200L), (3L, "c", 30L)).toDF("ident", "name", "qty"),
      keys = Seq("ident"))

    val out = IceRead.table(spark, catalog, "t_renup")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // the pre-rename row for key 2 (written under column name "id") is
    // replaced: the delete file keys by field id, not by name
    assert(out == Set((1L, "a", 10L), (2L, "B2", 200L), (3L, "c", 30L)))
  }

  test("guards: partition-column rename and bad adds are rejected") {
    val catalog = newCatalog()
    val s = spark
    import s.implicits._
    IceWrite.create(spark, catalog, "t_guard",
      Seq((1L, "x", 10L)).toDF("id", "name", "qty"),
      partitionSpec = Seq(PartitionField("name")))
    intercept[IllegalArgumentException] {
      SchemaEvolution.renameColumn(catalog, "t_guard", "name", "nm")
    }
    intercept[IllegalArgumentException] {
      SchemaEvolution.addColumn(catalog, "t_guard", "id", "BIGINT") // duplicate
    }
    intercept[Exception] {
      SchemaEvolution.addColumn(catalog, "t_guard", "bad", "NOT_A_TYPE")
    }
    intercept[IllegalArgumentException] {
      SchemaEvolution.renameColumn(catalog, "t_guard", "ghost", "g2")
    }
  }

  test("partition-spec evolution: mixed layouts read exactly; compaction migrates") {
    val catalog = newCatalog()
    val s = spark
    import s.implicits._
    val src = (1L to 40L).map(i => (i, i % 4, i % 5, s"v$i")).toDF("id", "a", "b", "v")
    IceWrite.create(spark, catalog, "t_pev", src,
      partitionSpec = Seq(PartitionField("a")), targetFileSizeBytes = 1L << 20)

    // evolve a->b; new appends land under b, old files keep their a values
    SchemaEvolution.updatePartitionSpec(catalog, "t_pev", Seq(PartitionField("b")))
    val extra = (41L to 60L).map(i => (i, i % 4, i % 5, s"v$i")).toDF("id", "a", "b", "v")
    IceWrite.append(spark, catalog, "t_pev", extra)

    val all = src.unionAll(extra)
    // partition read on the NEW spec: exact despite old-layout files
    val b2 = IceRead.tablePartition(spark, catalog, "t_pev", Map("b" -> "2"))
    val expected = all.filter($"b" === 2)
    assert(b2.count() == expected.count())
    assert(b2.exceptAll(expected).isEmpty && expected.exceptAll(b2).isEmpty)

    // compaction rewrites everything into the new layout
    val c = new Compaction(catalog, "t_pev", spark,
      config = FullCompactionConfig(PlanningParams(
        targetFileSizeBytes = 512L * 1024 * 1024,
        maxInputParallelism = 4, maxOutputParallelism = 1,
        fileGroupScope = graft.selection.FileGroupScope.Table)))
    c.compact()
    val meta = catalog.loadTable("t_pev")
    val dataFiles = meta.currentSnapshot.get.manifest.filter(_.content == FileContent.Data)
    assert(dataFiles.forall(_.partitionValues.keySet == Set("b")))
    val after = IceRead.tablePartition(spark, catalog, "t_pev", Map("b" -> "2"))
    assert(after.count() == expected.count())
    assert(after.exceptAll(expected).isEmpty)

    // guard: unknown column rejected
    intercept[IllegalArgumentException] {
      SchemaEvolution.updatePartitionSpec(catalog, "t_pev", Seq(PartitionField("nope")))
    }

    // guard: a partition filter on a key OUTSIDE the current spec is
    // rejected (no current transform -> no sound residual; old files kept
    // conservatively would leak rows) — filter the plain read instead
    intercept[IllegalArgumentException] {
      IceRead.tablePartition(spark, catalog, "t_pev", Map("a" -> "1"))
    }
    val viaPlainRead = IceRead.table(spark, catalog, "t_pev").filter($"a" === 1)
    assert(viaPlainRead.count() == all.filter($"a" === 1).count())
  }

  test("transform evolution (bucket growth): marked files stay exact, compaction heals") {
    val catalog = newCatalog()
    val s = spark
    import s.implicits._
    val src = (1L to 60L).map(i => (i, s"v$i")).toDF("id", "v")
    IceWrite.create(spark, catalog, "t_bkt", src.filter($"id" <= 30),
      partitionSpec = Seq(PartitionField("id", "bucket[2]")),
      targetFileSizeBytes = 1L << 20)
    IceWrite.append(spark, catalog, "t_bkt", src.filter($"id" > 30 && $"id" <= 40))

    // the canonical 100 TB evolution: buckets outgrow, bucket[2] -> bucket[4]
    SchemaEvolution.updatePartitionSpec(catalog, "t_bkt",
      Seq(PartitionField("id", "bucket[4]")))
    val meta1 = catalog.loadTable("t_bkt")
    assert(meta1.partitionSpec == Seq(PartitionField("id", "bucket[4]")))
    // one metadata-only snapshot re-marked every old-domain file
    val head1 = meta1.currentSnapshot.get
    assert(head1.summary.get("spec-evolution").contains("id"))
    val marked = head1.manifest.filter(_.content == FileContent.Data)
    assert(marked.nonEmpty && marked.forall(_.specId != 0),
      "old bucket[2] files must carry a non-current-spec marker")
    // idempotent: evolving to the SAME spec again changes nothing
    val again = SchemaEvolution.updatePartitionSpec(catalog, "t_bkt",
      Seq(PartitionField("id", "bucket[4]")))
    assert(again.currentSnapshotId == meta1.currentSnapshotId)

    // new appends land under bucket[4] with the current-spec marker
    IceWrite.append(spark, catalog, "t_bkt", src.filter($"id" > 40))
    val mixed = catalog.loadTable("t_bkt").currentSnapshot.get.manifest
      .filter(_.content == FileContent.Data)
    assert(mixed.exists(_.specId != 0) && mixed.exists(_.specId == 0))

    // partition read on the NEW transform: old-domain files are exempt
    // from value pruning (kept conservatively) and the residual filter
    // keeps the result exact
    val expected3 = IceRead.table(spark, catalog, "t_bkt")
      .filter(graft.exec.SparkExecutor.partitionExpr(
        PartitionField("id", "bucket[4]")).cast("string") === "3")
    val got3 = IceRead.tablePartition(spark, catalog, "t_bkt", Map("id" -> "3"))
    assert(got3.count() > 0 && got3.count() == expected3.count())
    assert(got3.exceptAll(expected3).isEmpty && expected3.exceptAll(got3).isEmpty)

    // value-keyed partition ops refuse while old-domain files are live.
    // Here the current spec is bucket (refused by the identity-only guard);
    // the specId-undecidability guard needs an IDENTITY current spec over
    // marked files — produced by an evolution round trip below
    intercept[IllegalArgumentException] {
      IceWrite.dropPartitions(catalog, "t_bkt", Map("id" -> "3"))
    }
    val catalog2 = newCatalog()
    IceWrite.create(spark, catalog2, "t_rt", src,
      partitionSpec = Seq(PartitionField("id")))
    SchemaEvolution.updatePartitionSpec(catalog2, "t_rt",
      Seq(PartitionField("id", "bucket[2]"))) // marks the identity-era files
    SchemaEvolution.updatePartitionSpec(catalog2, "t_rt",
      Seq(PartitionField("id"))) // back to identity; marks persist
    val eDrop = intercept[IllegalArgumentException] {
      IceWrite.dropPartitions(catalog2, "t_rt", Map("id" -> "3"))
    }
    assert(eDrop.getMessage.contains("compact"),
      s"marked files must make value-keyed drops undecidable: ${eDrop.getMessage}")

    // full read is exact across the mixed layouts
    assert(IceRead.table(spark, catalog, "t_bkt").count() == 60)

    // compaction migrates every file to the new spec, clearing the marks
    new Compaction(catalog, "t_bkt", spark,
      config = FullCompactionConfig(PlanningParams(
        targetFileSizeBytes = 512L * 1024 * 1024,
        maxInputParallelism = 4, maxOutputParallelism = 2,
        fileGroupScope = graft.selection.FileGroupScope.Table))).compact()
    val healed = catalog.loadTable("t_bkt").currentSnapshot.get.manifest
      .filter(_.content == FileContent.Data)
    assert(healed.forall(_.specId == 0), "compaction output is current-spec")
    assert(healed.forall(f => f.partitionValues.contains("id")))
    val afterHeal = IceRead.tablePartition(spark, catalog, "t_bkt", Map("id" -> "3"))
    assert(afterHeal.count() == expected3.count())
    assert(IceRead.table(spark, catalog, "t_bkt").count() == 60)

    // healed table exports cleanly — and with the superseded spec's
    // definition recorded, marked HISTORY exports faithfully too
    assert(catalog.loadTable("t_bkt").historicalSpecs.values.toSeq
      .contains(Seq(PartitionField("id", "bucket[2]"))))
    IcebergExport.exportIcebergMetadata(catalog, "t_bkt"): Unit

    // snapshot expiry retires the last marker-bearing history and prunes
    // the now-unreferenced historical spec definition with it
    graft.compaction.Maintenance.expireSnapshots(catalog, "t_bkt", keepLast = 1)
    assert(catalog.loadTable("t_bkt").historicalSpecs.isEmpty,
      "expiry must drop historical specs no surviving manifest references")
  }

  test("transform evolution refused while non-main branches exist") {
    val catalog = newCatalog()
    val s = spark
    import s.implicits._
    val src = (1L to 10L).map(i => (i, s"v$i")).toDF("id", "v")
    IceWrite.create(spark, catalog, "t_bkt_br", src,
      partitionSpec = Seq(PartitionField("id", "bucket[2]")))
    IceWrite.createBranch(catalog, "t_bkt_br", "audit")
    val e = intercept[IllegalArgumentException] {
      SchemaEvolution.updatePartitionSpec(catalog, "t_bkt_br",
        Seq(PartitionField("id", "bucket[4]")))
    }
    assert(e.getMessage.contains("branches"))
    // pure ADD/DROP evolution (no transform change) stays allowed with branches
    SchemaEvolution.updatePartitionSpec(catalog, "t_bkt_br", Nil): Unit
  }

  test("metadata JSON round-trips the typed schema and field ids") {
    val catalog = newCatalog()
    IceWrite.create(spark, catalog, "t_json", df(Seq((1L, "a", 10L))))
    val s = spark
    import s.implicits._
    IceWrite.appendEqualityDeletes(spark, catalog, "t_json",
      Seq(Tuple1(1L)).toDF("id"), Seq("id"))
    val meta = catalog.loadTable("t_json")
    val back = MetadataJson.read(MetadataJson.write(meta))
    assert(back == meta)
    assert(back.schema.map(f => (f.id, f.name, f.dataType)) ==
      Seq((1, "id", "BIGINT"), (2, "name", "STRING"), (3, "qty", "BIGINT")))
    val eq = back.currentSnapshot.get.manifest.find(_.content == FileContent.EqualityDeletes).get
    assert(eq.equalityFieldIds == Seq(1))
  }

  test("legacy schema-columns metadata still loads (name-addressed)") {
    val legacy =
      """{"name":"old","location":"/tmp/x","format-version":2,
        |"schema-columns":["a","b"],"partition-spec":[],"sort-order":[],
        |"current-snapshot-id":null,"refs":{},"snapshots":[],
        |"last-sequence-number":0,"version":1}""".stripMargin
    val meta = MetadataJson.read(legacy)
    assert(meta.schemaColumns == Seq("a", "b"))
    assert(meta.schema.forall(!_.isTyped))
    assert(meta.typedStruct.isEmpty)
  }
}
