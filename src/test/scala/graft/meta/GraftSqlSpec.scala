package graft.meta

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** SQL front door ([[GraftSql]]): relation resolution, late binding,
  * time travel / metadata suffixes, INSERT INTO/OVERWRITE, pushdown
  * through the injected plans. The session under test is built with
  * GraftExtensions (SparkTestBase), i.e. exactly the deployment shape. */
class GraftSqlSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.001"

  private def freshCatalog(name: String): Catalog = {
    val c = LocalCatalog(Files.createTempDirectory(s"graft-sql-$name").toString)
    GraftSql.register(name, c)
    c
  }

  test("SELECT resolves the MOR view and binds LATE (appends visible per statement)") {
    val cat = freshCatalog("g1")
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    IceWrite.create(spark, cat, "nation", nation)

    val viaSql = spark.sql("SELECT n_name, n_regionkey FROM g1.nation WHERE n_regionkey = 2")
    val viaApi = IceRead.table(spark, cat, "nation")
      .where(col("n_regionkey") === 2).select("n_name", "n_regionkey")
    assert(viaSql.exceptAll(viaApi).isEmpty && viaApi.exceptAll(viaSql).isEmpty)

    val before = spark.sql("SELECT count(*) AS c FROM g1.nation").head.getLong(0)
    IceWrite.append(spark, cat, "nation", nation.limit(3))
    val after = spark.sql("SELECT count(*) AS c FROM g1.nation").head.getLong(0)
    assert(after == before + 3, "a new statement must see the commit (no view pinning)")
  }

  test("filters and projection push into the parquet scan through the front door") {
    val cat = freshCatalog("g2")
    IceWrite.create(spark, cat, "orders", spark.read.parquet(s"$sf/orders.parquet"))
    val plan = spark.sql(
      "SELECT o_orderkey FROM g2.orders WHERE o_orderkey = 42")
      .queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(o_orderkey,42)") && plan.contains("PushedFilters"),
      s"expected pushed filters in:\n$plan")
    assert(plan.contains("ReadSchema: struct<o_orderkey:bigint>"),
      s"expected pruned read schema in:\n$plan")
  }

  test("aggregates, joins and graft SQL functions compose over front-door relations") {
    val cat = freshCatalog("g3")
    IceWrite.create(spark, cat, "nation", spark.read.parquet(s"$sf/nation.parquet"))
    IceWrite.create(spark, cat, "region", spark.read.parquet(s"$sf/region.parquet"))
    val joined = spark.sql(
      """SELECT r.r_name, count(*) AS nations
        |FROM g3.nation n JOIN g3.region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY r.r_name ORDER BY r.r_name""".stripMargin).collect()
    assert(joined.length == 5 && joined.map(_.getLong(1)).sum == 25)
    // native function + front door in one statement
    val d = spark.sql(
      "SELECT vec_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d FROM g3.region LIMIT 1")
      .head.getDouble(0)
    assert(math.abs(d - 11.0) < 1e-9)
  }

  test("time travel suffixes: snapshot_id / tag / branch / at_timestamp") {
    val cat = freshCatalog("g4")
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    IceWrite.create(spark, cat, "n", nation) // snapshot 1, 25 rows
    val s1 = cat.loadTable("n").currentSnapshot.get
    IceWrite.createTag(cat, "n", "v1", s1.snapshotId)
    IceWrite.createBranch(cat, "n", "dev")
    IceWrite.append(spark, cat, "n", nation.limit(5)) // main -> 30 rows

    assert(spark.sql("SELECT count(*) AS c FROM g4.n").head.getLong(0) == 30)
    assert(spark.sql(s"SELECT count(*) AS c FROM g4.n.snapshot_id_${s1.snapshotId}")
      .head.getLong(0) == 25)
    assert(spark.sql("SELECT count(*) AS c FROM g4.n.tag_v1").head.getLong(0) == 25)
    assert(spark.sql("SELECT count(*) AS c FROM g4.n.branch_dev").head.getLong(0) == 25)
    assert(spark.sql(s"SELECT count(*) AS c FROM g4.n.at_timestamp_${s1.timestampMs}")
      .head.getLong(0) == 25)
    // standard syntax forms are equivalent to the suffixes
    assert(spark.sql(s"SELECT count(*) AS c FROM g4.n VERSION AS OF ${s1.snapshotId}")
      .head.getLong(0) == 25)
    assert(spark.sql(s"SELECT count(*) AS c FROM g4.n TIMESTAMP AS OF ${s1.timestampMs}")
      .head.getLong(0) == 25)
  }

  test("metadata tables are addressable as suffixes") {
    val cat = freshCatalog("g5")
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    IceWrite.create(spark, cat, "n", nation)
    IceWrite.append(spark, cat, "n", nation.limit(5))

    assert(spark.sql("SELECT * FROM g5.n.snapshots").count() == 2)
    assert(spark.sql("SELECT * FROM g5.n.history").count() == 2)
    assert(spark.sql("SELECT file_path FROM g5.n.files").count() >= 2)
    assert(spark.sql("SELECT * FROM g5.n.refs WHERE name = 'main'").count() == 1)
    assert(spark.sql("SELECT * FROM g5.n.partitions").count() == 1)
    assert(spark.sql(
      "SELECT max(sequence_number) AS s FROM g5.n.all_files").head.getLong(0) == 2L)
  }

  test("INSERT INTO appends: positional, column list, BY NAME, NULL fill") {
    val cat = freshCatalog("g6")
    IceWrite.create(spark, cat, "t", // NULL literals -> nullable columns
      spark.range(0).select(lit(null).cast("bigint").as("a"),
        lit(null).cast("string").as("b"), lit(null).cast("double").as("c")))

    spark.sql("INSERT INTO g6.t VALUES (1, 'one', 1.0), (2, 'two', 2.0)")
    spark.sql("INSERT INTO g6.t (b, a) VALUES ('three', 3)") // c fills NULL
    spark.sql("INSERT INTO g6.t BY NAME SELECT 4.0 AS c, 4 AS a, 'four' AS b")
    val rows = spark.sql("SELECT a, b, c FROM g6.t ORDER BY a").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(rows.map(_.getString(1)).toSeq == Seq("one", "two", "three", "four"))
    assert(rows(2).isNullAt(2) && rows(3).getDouble(2) == 4.0)
    // INSERT's source query may itself read through the front door
    spark.sql("INSERT INTO g6.t SELECT a + 10, b, c FROM g6.t WHERE a = 1")
    assert(spark.sql("SELECT count(*) AS c FROM g6.t WHERE a = 11").head.getLong(0) == 1)
  }

  test("INSERT OVERWRITE: full replace (unpartitioned), dynamic overwrite (partitioned)") {
    val cat = freshCatalog("g7")
    IceWrite.create(spark, cat, "u",
      spark.range(5).select(col("id").as("a")))
    spark.sql("INSERT OVERWRITE g7.u SELECT CAST(99 AS BIGINT) AS a")
    assert(spark.sql("SELECT * FROM g7.u").collect().map(_.getLong(0)).toSeq == Seq(99L))
    assert(cat.loadTable("u").snapshots.length == 2, "replace is ONE atomic snapshot")

    val src = spark.range(6).select(
      (col("id") % 3).cast("int").as("p"), col("id").as("v"))
    IceWrite.create(spark, cat, "pt", src, partitionSpec = Seq(PartitionField("p")))
    // replace only partition p=0 (dynamic: partitions present in the source)
    spark.sql("INSERT OVERWRITE g7.pt SELECT CAST(0 AS INT) AS p, CAST(100 AS BIGINT) AS v")
    val after = spark.sql("SELECT p, v FROM g7.pt ORDER BY p, v").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(after == Seq((0, 100L), (1, 1L), (1, 4L), (2, 2L), (2, 5L)))
    // static PARTITION value becomes a literal column
    spark.sql("INSERT OVERWRITE g7.pt PARTITION (p = 1) SELECT CAST(200 AS BIGINT) AS v")
    assert(spark.sql("SELECT v FROM g7.pt WHERE p = 1").collect()
      .map(_.getLong(0)).toSeq == Seq(200L))
  }

  test("conf-declared warehouse: spark.graft.catalog.<name> resolves without register()") {
    val wh = Files.createTempDirectory("graft-sql-conf").toString
    val cat = LocalCatalog(wh)
    IceWrite.create(spark, cat, "n", spark.read.parquet(s"$sf/nation.parquet"))
    spark.conf.set("spark.graft.catalog.confcat", wh)
    try assert(spark.sql("SELECT count(*) AS c FROM confcat.n").head.getLong(0) == 25)
    finally spark.conf.unset("spark.graft.catalog.confcat")
  }

  test("DELETE FROM tombstones via MOR; alias-qualified predicates resolve") {
    val cat = freshCatalog("g9")
    IceWrite.create(spark, cat, "n", spark.read.parquet(s"$sf/nation.parquet"))
    spark.sql("DELETE FROM g9.n WHERE n_regionkey = 2")
    assert(spark.sql("SELECT count(*) AS c FROM g9.n WHERE n_regionkey = 2")
      .head.getLong(0) == 0)
    spark.sql("DELETE FROM g9.n AS x WHERE x.n_nationkey < 3")
    val left = spark.sql("SELECT count(*) AS c FROM g9.n").head.getLong(0)
    assert(left == 25 - 5 - 3 + 1) // region 2 has 5 nations; keys 0,1 remain-deleted, 2 already gone
    // no data file was rewritten: both deletes are tombstone appends
    val files = cat.loadTable("n").currentSnapshot.get.manifest
    assert(files.count(_.content == FileContent.Data) ==
      cat.loadTable("n").snapshots.head.manifest.count(_.content == FileContent.Data))
  }

  test("UPDATE is ONE snapshot and never resurrects tombstoned rows") {
    val cat = freshCatalog("g10")
    IceWrite.create(spark, cat, "n", spark.read.parquet(s"$sf/nation.parquet"))
    // tombstone one row that WOULD match the update predicate
    spark.sql("DELETE FROM g10.n WHERE n_nationkey = 4") // region 4's IRAN? key 4 in region 4
    val snapsBefore = cat.loadTable("n").snapshots.length
    spark.sql("UPDATE g10.n SET n_name = lower(n_name) WHERE n_regionkey = 4")
    assert(cat.loadTable("n").snapshots.length == snapsBefore + 1,
      "UPDATE must commit tombstones + updated copies in ONE snapshot")
    val rows = spark.sql(
      "SELECT n_nationkey, n_name FROM g10.n WHERE n_regionkey = 4").collect()
    assert(rows.nonEmpty && rows.forall(r =>
      r.getString(1) == r.getString(1).toLowerCase))
    assert(!rows.exists(_.getInt(0) == 4), "deleted row must NOT be resurrected")
    // rows outside the predicate untouched (uppercase names intact)
    val others = spark.sql(
      "SELECT n_name FROM g10.n WHERE n_regionkey <> 4").collect()
    assert(others.nonEmpty && others.forall(r => r.getString(0) == r.getString(0).toUpperCase))
    assert(rows.length + others.length == 24) // 25 nations minus the deleted key 4
  }

  test("MERGE INTO: conditional update, delete, insert, not-matched-by-source") {
    val cat = freshCatalog("g11")
    IceWrite.create(spark, cat, "t",
      spark.range(6).select(col("id").as("k"), (col("id") * 10).as("v")))
    spark.range(4, 9).select(col("id").as("k"), (col("id") * 100).as("v"))
      .createOrReplaceTempView("merge_src")
    spark.sql(
      """MERGE INTO g11.t AS tgt USING merge_src AS src ON tgt.k = src.k
        |WHEN MATCHED AND src.k = 5 THEN DELETE
        |WHEN MATCHED THEN UPDATE SET v = src.v + tgt.v
        |WHEN NOT MATCHED AND src.k < 8 THEN INSERT (k, v) VALUES (src.k, src.v)
        |WHEN NOT MATCHED BY SOURCE AND tgt.k = 0 THEN DELETE""".stripMargin)
    val out = spark.sql("SELECT k, v FROM g11.t ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // 0 deleted (by-source), 1-3 kept, 4 updated 40+400, 5 deleted, 6/7 inserted, 8 filtered
    assert(out == Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 440L), (6L, 600L), (7L, 700L)),
      s"got $out")
    // single snapshot for the whole MERGE
    assert(cat.loadTable("t").snapshots.length == 2)
  }

  test("CREATE TABLE / CTAS / SHOW TABLES / TRUNCATE / DROP") {
    val cat = freshCatalog("g12")
    spark.sql(
      """CREATE TABLE g12.evts (k BIGINT, day DATE, v STRING)
        |PARTITIONED BY (days(day), bucket(4, k))
        |TBLPROPERTIES ('write.parquet.compression-codec' = 'snappy',
        |               'format-version' = '3')""".stripMargin)
    val meta = cat.loadTable("evts")
    assert(meta.schema.map(_.name) == Seq("k", "day", "v"))
    assert(meta.partitionSpec == Seq(PartitionField("day", "day"), PartitionField("k", "bucket[4]")))
    assert(meta.formatVersion == 3)
    assert(meta.properties("write.parquet.compression-codec") == "snappy")
    spark.sql("CREATE TABLE IF NOT EXISTS g12.evts (other INT)") // no-op
    assert(cat.loadTable("evts").schema.map(_.name) == Seq("k", "day", "v"))

    spark.sql("INSERT INTO g12.evts VALUES (1, DATE'2024-03-01', 'a'), (2, DATE'2024-03-02', 'b')")
    assert(spark.sql("SELECT count(*) AS c FROM g12.evts").head.getLong(0) == 2)

    spark.sql("CREATE TABLE g12.evts2 AS SELECT k, v FROM g12.evts WHERE k = 1")
    assert(spark.sql("SELECT k, v FROM g12.evts2").collect().map(_.getLong(0)).toSeq == Seq(1L))

    val shown = spark.sql("SHOW TABLES IN g12").collect().map(_.getString(1)).toSeq
    assert(shown == Seq("evts", "evts2"))

    spark.sql("TRUNCATE TABLE g12.evts")
    assert(spark.sql("SELECT count(*) AS c FROM g12.evts").head.getLong(0) == 0)
    assert(cat.loadTable("evts").snapshots.length == 3, "truncate is one snapshot")

    spark.sql("DROP TABLE g12.evts2")
    assert(!cat.tableExists("evts2"))
    spark.sql("DROP TABLE IF EXISTS g12.nope") // no-op
    val e = intercept[Exception](spark.sql("DROP TABLE g12.nope"))
    assert(e.getMessage.contains("does not exist"))
  }

  test("CALL maintenance procedures: rewrite_data_files, expire, orphans, rollback") {
    val cat = freshCatalog("g13")
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    IceWrite.create(spark, cat, "n", nation)
    (1 to 3).foreach(_ => IceWrite.append(spark, cat, "n", nation.limit(2)))

    // compaction folds the 4 small files into 1; result row carries counts
    val rw = spark.sql("CALL g13.system.rewrite_data_files('n')").head
    assert(rw.getInt(0) == 4 && rw.getInt(1) == 1)
    assert(cat.loadTable("n").currentSnapshot.get.manifest
      .count(_.content == FileContent.Data) == 1)
    assert(spark.sql("SELECT count(*) AS c FROM g13.n").head.getLong(0) == 31)

    // expire everything but the compaction head, orphaning the 4 inputs
    val ex = spark.sql(
      "CALL g13.system.expire_snapshots(table => 'n', retain_last => 1)").head
    assert(ex.getLong(0) == 4 && ex.getLong(1) == 1)
    val orphans = spark.sql(
      "CALL g13.system.remove_orphan_files(table => 'n', older_than => 0)")
      .collect().map(_.getString(0))
    assert(orphans.length >= 4, s"expired inputs must orphan, got ${orphans.length}")
    assert(spark.sql("SELECT count(*) AS c FROM g13.n").head.getLong(0) == 31)

    // rollback on a fresh table: the append snapshot is abandoned
    IceWrite.create(spark, cat, "r", nation)
    val s1 = cat.loadTable("r").currentSnapshotId.get
    IceWrite.append(spark, cat, "r", nation.limit(5))
    val rb = spark.sql(s"CALL g13.system.rollback_to_snapshot('r', $s1)").head
    assert(rb.getLong(1) == s1)
    assert(spark.sql("SELECT count(*) AS c FROM g13.r").head.getLong(0) == 25)

    val e = intercept[Exception](spark.sql("CALL g13.system.nope('n')"))
    assert(e.getMessage.contains("unknown procedure"))
  }

  test("ALTER TABLE: add/drop/rename/widen columns, properties; DESCRIBE") {
    val cat = freshCatalog("g14")
    spark.sql("CREATE TABLE g14.t (k INT, v STRING)")
    spark.sql("INSERT INTO g14.t VALUES (1, 'a')")

    spark.sql("ALTER TABLE g14.t ADD COLUMNS (score DOUBLE, tag STRING DEFAULT 'none')")
    val r1 = spark.sql("SELECT k, v, score, tag FROM g14.t").head
    assert(r1.isNullAt(2) && r1.getString(3) == "none",
      "pre-existing rows read NULL / the DEFAULT for new columns")

    spark.sql("ALTER TABLE g14.t ALTER COLUMN k TYPE BIGINT")
    spark.sql("INSERT INTO g14.t VALUES (3000000000, 'big', 1.5, 'x')")
    assert(spark.sql("SELECT max(k) AS m FROM g14.t").head.getLong(0) == 3000000000L)

    spark.sql("ALTER TABLE g14.t RENAME COLUMN v TO label")
    assert(spark.sql("SELECT label FROM g14.t WHERE k = 1").head.getString(0) == "a")

    spark.sql("ALTER TABLE g14.t DROP COLUMN score")
    assert(!spark.sql("SELECT * FROM g14.t").columns.contains("score"))

    spark.sql("ALTER TABLE g14.t SET TBLPROPERTIES ('team' = 'ops', 'x' = '1')")
    spark.sql("ALTER TABLE g14.t UNSET TBLPROPERTIES ('x')")
    val props = cat.loadTable("t").properties
    assert(props("team") == "ops" && !props.contains("x"))

    // reserved graft.* keys refuse through the SQL property door: the
    // rename above retired 'v' in graft.stats.retired-names — unsetting
    // it would re-arm stale zone maps and read silently wrong rows
    assert(cat.loadTable("t").statsRetiredNames.nonEmpty)
    val eReserved = intercept[Exception](spark.sql(
      "ALTER TABLE g14.t UNSET TBLPROPERTIES ('graft.stats.retired-names')"))
    assert(eReserved.getMessage.contains("reserved"), eReserved.getMessage)
    val eReserved2 = intercept[Exception](spark.sql(
      "ALTER TABLE g14.t SET TBLPROPERTIES ('graft.table-uuid' = 'forged')"))
    assert(eReserved2.getMessage.contains("reserved"), eReserved2.getMessage)
    assert(cat.loadTable("t").statsRetiredNames.nonEmpty)

    val desc = spark.sql("DESCRIBE g14.t").collect().map(r => r.getString(0) -> r.getString(1))
    assert(desc.toSeq == Seq("k" -> "bigint", "label" -> "string", "tag" -> "string"))
    val ext = spark.sql("DESCRIBE EXTENDED g14.t").collect()
      .map(_.getString(0))
    assert(ext.contains("Format version") && ext.contains("Location"))

    // a non-nullable add without DEFAULT must refuse
    val e = intercept[Exception](
      spark.sql("ALTER TABLE g14.t ADD COLUMNS (strict INT NOT NULL)"))
    assert(e.getMessage.contains("nullable") || e.getMessage.contains("DEFAULT"))
  }

  test("SQL partition-spec evolution: bucket outgrowth, ADD/DROP PARTITION FIELD") {
    val cat = freshCatalog("g20")
    spark.sql("CREATE TABLE g20.t (id BIGINT, name STRING, ts TIMESTAMP) " +
      "PARTITIONED BY (bucket(2, id))")
    spark.sql("INSERT INTO g20.t SELECT id, concat('n', id) AS name, " +
      "TIMESTAMP'2024-01-01 00:00:00' + make_interval(0,0,0,CAST(id AS INT)) AS ts " +
      "FROM range(20)")
    assert(cat.loadTable("t").partitionSpec == Seq(PartitionField("id", "bucket[2]")))

    // the canonical bucket-outgrowth path, purely via SQL
    spark.sql("ALTER TABLE g20.t REPLACE PARTITION FIELD bucket(2, id) WITH bucket(4, id)")
    val meta1 = cat.loadTable("t")
    assert(meta1.partitionSpec == Seq(PartitionField("id", "bucket[4]")))
    // pre-evolution files carry historical-spec markers (old bucket domain)
    assert(meta1.currentSnapshot.get.manifest.forall(_.specId != 0))
    assert(meta1.historicalSpecs.values.toSeq.contains(Seq(PartitionField("id", "bucket[2]"))))

    // new writes land under the new spec; reads span both correctly
    spark.sql("INSERT INTO g20.t SELECT id, concat('n', id) AS name, " +
      "TIMESTAMP'2024-02-01 00:00:00' AS ts FROM range(20, 30)")
    assert(spark.sql("SELECT count(*) AS n FROM g20.t").head.getLong(0) == 30L)
    assert(spark.sql("SELECT count(*) AS n FROM g20.t WHERE id = 7").head.getLong(0) == 1L)

    // compaction heals the markers; the healed table prunes on bucket[4]
    spark.sql("CALL g20.system.rewrite_data_files('t')")
    val healed = cat.loadTable("t")
    assert(healed.currentSnapshot.get.manifest
      .filter(_.content == FileContent.Data).forall(_.specId == 0))
    assert(spark.sql("SELECT count(*) AS n FROM g20.t").head.getLong(0) == 30L)

    // ADD a second field (time transform, plural alias), then DROP it
    spark.sql("ALTER TABLE g20.t ADD PARTITION FIELD days(ts)")
    assert(cat.loadTable("t").partitionSpec ==
      Seq(PartitionField("id", "bucket[4]"), PartitionField("ts", "day")))
    spark.sql("ALTER TABLE g20.t DROP PARTITION FIELD days(ts)")
    assert(cat.loadTable("t").partitionSpec == Seq(PartitionField("id", "bucket[4]")))

    // adding over an existing source column must point at REPLACE
    val e = intercept[Exception](spark.sql("ALTER TABLE g20.t ADD PARTITION FIELD bucket(8, id)"))
    assert(e.getMessage.contains("REPLACE PARTITION FIELD"))
    // dropping a non-field is a clear error
    val e2 = intercept[Exception](spark.sql("ALTER TABLE g20.t DROP PARTITION FIELD name"))
    assert(e2.getMessage.contains("not a partition field"))
    // statements on unregistered catalogs fall through to Spark's parser
    intercept[Exception](spark.sql("ALTER TABLE nosuch.t ADD PARTITION FIELD days(ts)"))
  }

  test("SQL WRITE ORDERED BY / WRITE UNORDERED replace the table sort order") {
    val cat = freshCatalog("g21")
    spark.sql("CREATE TABLE g21.t (id BIGINT, category STRING, v DOUBLE)")
    spark.sql("INSERT INTO g21.t SELECT id, concat('c', id % 3) AS category, " +
      "CAST(id AS DOUBLE) AS v FROM range(100)")

    spark.sql("ALTER TABLE g21.t WRITE ORDERED BY category DESC NULLS LAST, id")
    assert(cat.loadTable("t").sortOrder == Seq(
      SortField("category", ascending = false, nullsFirst = false),
      SortField("id", ascending = true, nullsFirst = true)))

    // case-insensitive column resolution onto declared casing
    spark.sql("ALTER TABLE g21.t WRITE ORDERED BY CATEGORY ASC")
    assert(cat.loadTable("t").sortOrder == Seq(SortField("category")))

    // the order drives the next rewrite: compacted files are clustered
    spark.sql("ALTER TABLE g21.t WRITE ORDERED BY id DESC")
    spark.sql("CALL g21.system.rewrite_data_files('t')")
    assert(spark.sql("SELECT count(*) AS n FROM g21.t").head.getLong(0) == 100L)

    spark.sql("ALTER TABLE g21.t WRITE UNORDERED")
    assert(cat.loadTable("t").sortOrder.isEmpty)

    // unknown sort column is refused
    val e = intercept[Exception](spark.sql("ALTER TABLE g21.t WRITE ORDERED BY nope"))
    assert(e.getMessage.toLowerCase.contains("nope"))
  }

  test("write-audit-publish through SQL: wap.id staging, cherrypick, fast_forward, set_current_snapshot") {
    val cat = freshCatalog("g22")
    spark.sql("CREATE TABLE g22.t (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('write.wap.enabled' = 'true')")
    spark.sql("INSERT INTO g22.t VALUES (1, 'base'), (2, 'base')")
    val published = cat.loadTable("t").currentSnapshotId.get

    // ---- stage: spark.wap.id makes the INSERT commit UNPUBLISHED ----
    spark.conf.set("spark.wap.id", "job1")
    try {
      spark.sql("INSERT INTO g22.t VALUES (3, 'staged')")
      // main readers see nothing of the staged snapshot
      assert(spark.sql("SELECT count(*) AS n FROM g22.t").head.getLong(0) == 2L)
      assert(cat.loadTable("t").currentSnapshotId.contains(published))
      // audit: the staged snapshot is addressable via the snapshots
      // metadata table (summary carries wap.id) + snapshot_id suffix
      val stagedId = spark.sql(
        "SELECT snapshot_id FROM g22.t.snapshots WHERE summary['wap.id'] = 'job1'")
        .head.getLong(0)
      assert(spark.sql(s"SELECT count(*) AS n FROM g22.t.snapshot_id_$stagedId")
        .head.getLong(0) == 3L)

      // ---- publish: cherrypick fast-forwards (parent IS the head) ----
      val r = spark.sql(s"CALL g22.system.cherrypick_snapshot('t', $stagedId)").head
      assert(r.getLong(0) == stagedId && r.getLong(1) == stagedId,
        "parent-is-head cherry-pick must fast-forward to the staged snapshot")
      assert(spark.sql("SELECT count(*) AS n FROM g22.t").head.getLong(0) == 3L)

      // ---- re-apply arm: main moves between staging and publish ----
      spark.sql("INSERT INTO g22.t VALUES (4, 'staged2')") // staged (wap.id still set)
      val staged2 = spark.sql(
        "SELECT max(snapshot_id) AS s FROM g22.t.snapshots WHERE summary['wap.id'] = 'job1'")
        .head.getLong(0)
      spark.conf.unset("spark.wap.id")
      spark.sql("INSERT INTO g22.t VALUES (5, 'concurrent')") // published append
      spark.sql(s"CALL g22.system.cherrypick_snapshot('t', $staged2)")
      assert(spark.sql("SELECT id FROM g22.t ORDER BY id").collect().map(_.getLong(0)).toSeq ==
        Seq(1L, 2L, 3L, 4L, 5L), "re-applied cherry-pick must keep the concurrent append")
      val head = cat.loadTable("t").currentSnapshot.get
      assert(head.summary.get("published-wap-id").contains("job1"))

      // double cherry-pick refuses (files already in the current state)
      val dup = intercept[Exception](
        spark.sql(s"CALL g22.system.cherrypick_snapshot('t', $staged2)"))
      assert(dup.getMessage.contains("already"))
    } finally spark.conf.unset("spark.wap.id")

    // ---- branch staging + fast_forward ----
    spark.sql("CALL g22.system.rewrite_data_files('t')") // compact for a clean base
    IceWrite.createBranch(cat, "t", "audit")
    spark.conf.set("spark.wap.branch", "audit")
    try {
      spark.sql("INSERT INTO g22.t VALUES (6, 'branch-staged')")
    } finally spark.conf.unset("spark.wap.branch")
    assert(spark.sql("SELECT count(*) AS n FROM g22.t").head.getLong(0) == 5L)
    assert(spark.sql("SELECT count(*) AS n FROM g22.t.branch_audit").head.getLong(0) == 6L)
    val ff = spark.sql("CALL g22.system.fast_forward('t', 'main', 'audit')").head
    assert(ff.getString(0) == "main" && ff.getLong(2) == cat.loadTable("t").refs("audit"))
    assert(spark.sql("SELECT count(*) AS n FROM g22.t").head.getLong(0) == 6L)

    // ---- set_current_snapshot jumps anywhere, including forward ----
    val cur = cat.loadTable("t").currentSnapshotId.get
    val sc = spark.sql(s"CALL g22.system.set_current_snapshot('t', $published)").head
    assert(sc.getLong(0) == cur && sc.getLong(1) == published)
    assert(spark.sql("SELECT count(*) AS n FROM g22.t").head.getLong(0) == 2L)
    // jump forward again — the non-rollback direction rollbackTo refuses
    spark.sql(s"CALL g22.system.set_current_snapshot('t', $cur)")
    assert(spark.sql("SELECT count(*) AS n FROM g22.t").head.getLong(0) == 6L)

    // ---- genuinely diverged refs refuse the fast-forward ----
    spark.sql("INSERT INTO g22.t VALUES (7, 'main-only')")
    spark.conf.set("spark.wap.branch", "audit")
    try spark.sql("INSERT INTO g22.t VALUES (8, 'audit-only')")
    finally spark.conf.unset("spark.wap.branch")
    val div = intercept[Exception](
      spark.sql("CALL g22.system.fast_forward('t', 'main', 'audit')"))
    assert(div.getMessage.contains("not a fast-forward"))
  }

  test("WAP row-level ops: branch staging for DELETE/UPDATE/MERGE, wap.id refusal") {
    val cat = freshCatalog("g23")
    spark.sql("CREATE TABLE g23.t (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('write.wap.enabled' = 'true')")
    spark.sql("INSERT INTO g23.t SELECT id, concat('v', id) AS v FROM range(10)")
    IceWrite.createBranch(cat, "t", "audit")

    // DELETE/UPDATE/MERGE staged on the branch leave main untouched
    spark.conf.set("spark.wap.branch", "audit")
    try {
      spark.sql("DELETE FROM g23.t WHERE id >= 8")
      spark.sql("UPDATE g23.t SET v = upper(v) WHERE id < 2")
      spark.sql("SELECT CAST(5 AS BIGINT) AS id, 'merged' AS v")
        .createOrReplaceTempView("g23_src")
      spark.sql("""MERGE INTO g23.t AS t USING g23_src AS s ON t.id = s.id
                  |WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin)
    } finally spark.conf.unset("spark.wap.branch")
    assert(spark.sql("SELECT count(*) AS n FROM g23.t").head.getLong(0) == 10L)
    assert(spark.sql("SELECT v FROM g23.t WHERE id = 0").head.getString(0) == "v0")
    val audit = spark.sql("SELECT id, v FROM g23.t.branch_audit ORDER BY id").collect()
    assert(audit.length == 8)
    assert(audit(0).getString(1) == "V0" && audit(5).getString(1) == "merged")
    // publish and read the staged state from main
    spark.sql("CALL g23.system.fast_forward('t', 'main', 'audit')")
    assert(spark.sql("SELECT count(*) AS n FROM g23.t").head.getLong(0) == 8L)
    assert(spark.sql("SELECT v FROM g23.t WHERE id = 5").head.getString(0) == "merged")

    // wap.id staging is append-only: row-level ops refuse loudly instead
    // of silently publishing
    spark.conf.set("spark.wap.id", "job9")
    try {
      val e1 = intercept[Exception](spark.sql("DELETE FROM g23.t WHERE id = 1"))
      assert(e1.getMessage.contains("spark.wap.branch"))
      val e2 = intercept[Exception](spark.sql("UPDATE g23.t SET v = 'x' WHERE id = 1"))
      assert(e2.getMessage.contains("spark.wap.branch"))
      val e3 = intercept[Exception](spark.sql("TRUNCATE TABLE g23.t"))
      assert(e3.getMessage.toLowerCase.contains("staged"))
    } finally spark.conf.unset("spark.wap.id")
    assert(spark.sql("SELECT count(*) AS n FROM g23.t").head.getLong(0) == 8L)
  }

  test("CALL create_changelog_view: SQL-only CDC consumption") {
    val cat = freshCatalog("g27")
    spark.sql("CREATE TABLE g27.t (id BIGINT, v STRING)")
    spark.sql("INSERT INTO g27.t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    val v1 = cat.loadTable("t").currentSnapshotId.get
    spark.sql("DELETE FROM g27.t WHERE id = 2")
    spark.sql("INSERT INTO g27.t VALUES (4, 'd')")

    // full history: 3 inserts, 1 delete, 1 insert
    val view = spark.sql("CALL g27.system.create_changelog_view('t')").head.getString(0)
    assert(view == "t_changes")
    assert(spark.catalog.tableExists("t_changes"),
      "temp view not registered in the calling session")
    val all = spark.sql(s"SELECT _change_type, id FROM $view ORDER BY id, _change_type")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(all == Seq(("insert", 1L), ("delete", 2L), ("insert", 2L),
      ("insert", 3L), ("insert", 4L)), s"unexpected changelog: $all")

    // windowed: only the changes after v1
    spark.sql("CALL g27.system.create_changelog_view('t', " +
      s"start_snapshot_id => $v1, changelog_view => 'recent')")
    val recent = spark.sql("SELECT _change_type, id FROM recent ORDER BY id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(recent == Seq(("delete", 2L), ("insert", 4L)), s"unexpected window: $recent")

    // compaction emits nothing into a fresh view over the same window
    spark.sql("CALL g27.system.rewrite_data_files('t')")
    spark.sql("CALL g27.system.create_changelog_view('t', " +
      s"start_snapshot_id => $v1, changelog_view => 'recent2')")
    assert(spark.sql("SELECT count(*) AS n FROM recent2").head.getLong(0) == 2L,
      "compaction must be invisible to changelog consumers")
  }

  test("branch/tag lifecycle DDL: CREATE/DROP BRANCH and TAG, AS OF VERSION") {
    val cat = freshCatalog("g26")
    spark.sql("CREATE TABLE g26.t (id BIGINT, v STRING)")
    spark.sql("INSERT INTO g26.t VALUES (1, 'a')")
    val v1 = cat.loadTable("t").currentSnapshotId.get
    spark.sql("INSERT INTO g26.t VALUES (2, 'b')")

    // tag the FIRST version, branch from the head, branch at an explicit version
    spark.sql(s"ALTER TABLE g26.t CREATE TAG v1_release AS OF VERSION $v1")
    spark.sql("ALTER TABLE g26.t CREATE BRANCH audit")
    spark.sql(s"ALTER TABLE g26.t CREATE BRANCH hotfix AS OF VERSION $v1")
    val meta = cat.loadTable("t")
    assert(meta.tags.get("v1_release").contains(v1))
    assert(meta.refs.get("hotfix").contains(v1))
    assert(meta.refs("audit") == meta.currentSnapshotId.get)
    assert(spark.sql("SELECT count(*) AS n FROM g26.t.branch_hotfix").head.getLong(0) == 1L)
    assert(spark.sql("SELECT count(*) AS n FROM g26.t.tag_v1_release").head.getLong(0) == 1L)

    // IF NOT EXISTS no-ops on an existing ref; plain re-create of a TAG refuses
    spark.sql("ALTER TABLE g26.t CREATE BRANCH IF NOT EXISTS audit")
    intercept[Exception](spark.sql("ALTER TABLE g26.t CREATE TAG v1_release"))
    // plain re-create of a BRANCH refuses too — and must NOT silently
    // reset the branch to main's head (createBranch is create-or-reset
    // underneath; the DDL front door guards it)
    intercept[Exception](spark.sql("ALTER TABLE g26.t CREATE BRANCH hotfix"))
    intercept[Exception](
      spark.sql(s"ALTER TABLE g26.t CREATE BRANCH hotfix AS OF VERSION $v1"))
    assert(cat.loadTable("t").refs.get("hotfix").contains(v1),
      "a refused CREATE BRANCH must leave the branch position untouched")

    // the SQL-only WAP loop end to end: stage on the branch, publish, drop
    spark.conf.set("spark.wap.branch", "audit")
    try spark.sql("INSERT INTO g26.t VALUES (3, 'staged')")
    finally spark.conf.unset("spark.wap.branch")
    assert(spark.sql("SELECT count(*) AS n FROM g26.t").head.getLong(0) == 2L)
    spark.sql("CALL g26.system.fast_forward('t', 'main', 'audit')")
    assert(spark.sql("SELECT count(*) AS n FROM g26.t").head.getLong(0) == 3L)
    spark.sql("ALTER TABLE g26.t DROP BRANCH audit")
    spark.sql("ALTER TABLE g26.t DROP BRANCH IF EXISTS audit") // tolerated
    intercept[Exception](spark.sql("ALTER TABLE g26.t DROP BRANCH audit"))
    intercept[Exception](spark.sql("ALTER TABLE g26.t DROP BRANCH main"))
    spark.sql("ALTER TABLE g26.t DROP TAG v1_release")
    assert(cat.loadTable("t").tags.isEmpty)
    assert(!cat.loadTable("t").refs.contains("audit"))
  }

  test("WAP staging preserves v3 row-lineage uniqueness across cherry-pick") {
    val cat = freshCatalog("g24")
    spark.sql("CREATE TABLE g24.t (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('write.wap.enabled' = 'true', 'format-version' = '3')")
    spark.sql("INSERT INTO g24.t SELECT id, concat('b', id) AS v FROM range(10)")
    spark.conf.set("spark.wap.id", "jx")
    try spark.sql("INSERT INTO g24.t SELECT id, concat('s', id) AS v FROM range(10, 20)")
    finally spark.conf.unset("spark.wap.id")
    // a concurrent published append between staging and publish: its
    // row-id range was claimed through the same cursor, so re-applied
    // staged files cannot collide with it
    spark.sql("INSERT INTO g24.t SELECT id, concat('c', id) AS v FROM range(20, 30)")
    val stagedId = spark.sql(
      "SELECT snapshot_id FROM g24.t.snapshots WHERE summary['wap.id'] = 'jx'")
      .head.getLong(0)
    spark.sql(s"CALL g24.system.cherrypick_snapshot('t', $stagedId)")

    val withIds = IceRead.tableWithRowIds(spark, cat, "t")
      .select("id", "_row_id").collect()
    assert(withIds.length == 30)
    val ids = withIds.map(_.getLong(1))
    assert(ids.distinct.length == 30,
      s"row-id collision after cherry-pick: ${ids.sorted.mkString(",")}")
  }

  test("SHOW CREATE TABLE emits runnable DDL; ANALYZE persists stats properties") {
    val cat = freshCatalog("g25")
    spark.sql("CREATE TABLE g25.t (id BIGINT NOT NULL, name STRING, ts TIMESTAMP, " +
      "tag STRING DEFAULT 'none') " +
      "PARTITIONED BY (bucket(4, id), truncate(2, name), days(ts)) " +
      "TBLPROPERTIES ('team' = 'ops')")
    val ddl = spark.sql("SHOW CREATE TABLE g25.t").head.getString(0)
    assert(ddl.contains("id BIGINT NOT NULL") && ddl.contains("DEFAULT 'none'"))
    assert(ddl.contains("bucket(4, id)") && ddl.contains("truncate(2, name)") &&
      ddl.contains("days(ts)"))
    assert(ddl.contains("'team' = 'ops'"))
    // the DDL is RUNNABLE: re-executing it in a fresh catalog reproduces
    // schema + spec (swap the catalog name in the statement)
    val cat2 = freshCatalog("g25b")
    spark.sql(ddl.replace("CREATE TABLE g25.t", "CREATE TABLE g25b.t"))
    val (a, b) = (cat.loadTable("t"), cat2.loadTable("t"))
    assert(a.schema.map(f => (f.name, f.dataType, f.nullable, f.initialDefault)) ==
      b.schema.map(f => (f.name, f.dataType, f.nullable, f.initialDefault)))
    assert(a.partitionSpec == b.partitionSpec)
    assert(b.properties.get("team").contains("ops"))

    // SHOW TBLPROPERTIES: full map + single-key form
    val sp = spark.sql("SHOW TBLPROPERTIES g25.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(sp.get("team").contains("ops") && sp.get("format-version").contains("2"))
    assert(spark.sql("SHOW TBLPROPERTIES g25.t ('team')").head.getString(1) == "ops")

    // a column-list INSERT omitting the DEFAULT column fills the default,
    // not NULL (CREATE-time defaults now flow into initial-default)
    spark.sql("INSERT INTO g25.t (id, name, ts) SELECT id, concat('n', id % 7) AS name, " +
      "TIMESTAMP'2024-03-01 00:00:00' AS ts FROM range(50)")
    assert(spark.sql("SELECT count(*) AS n FROM g25.t WHERE tag = 'none'")
      .head.getLong(0) == 50L)

    // ANALYZE: NOSCAN records rows only; full + FOR COLUMNS record ndv/min/max
    spark.sql("ANALYZE TABLE g25.t COMPUTE STATISTICS NOSCAN")
    val p1 = cat.loadTable("t").properties
    assert(p1.get("stats.rows").contains("50") && p1.contains("stats.snapshot-id"))
    assert(!p1.contains("stats.id.ndv"))
    spark.sql("ANALYZE TABLE g25.t COMPUTE STATISTICS FOR COLUMNS id, name")
    val p2 = cat.loadTable("t").properties
    // analyzeTable's ndv is an HLL ESTIMATE — assert the band, not equality
    val idNdv = p2("stats.id.ndv").toLong
    assert(idNdv >= 45 && idNdv <= 55, s"ndv(id)=$idNdv for 50 distinct")
    val nameNdv = p2("stats.name.ndv").toLong
    assert(nameNdv >= 6 && nameNdv <= 8, s"ndv(name)=$nameNdv for 7 distinct")
    spark.sql("ANALYZE TABLE g25.t COMPUTE STATISTICS")
    assert(cat.loadTable("t").properties.contains("stats.ts.nulls"))
  }

  test("SHOW PARTITIONS + entries/manifests metadata tables") {
    val cat = freshCatalog("g29")
    spark.sql("CREATE TABLE g29.t (id BIGINT, region BIGINT, name STRING) " +
      "PARTITIONED BY (region, bucket(4, id))")
    spark.sql("INSERT INTO g29.t SELECT id, id % 3 AS region, concat('n', id) AS name " +
      "FROM range(60)")

    // SHOW PARTITIONS: one field=value/field=value line per live partition
    val parts = spark.sql("SHOW PARTITIONS g29.t").collect().map(_.getString(0))
    assert(parts.forall(p => p.startsWith("region=") && p.contains("/id_bucket=")), parts.mkString(";"))
    assert(parts.map(_.split("/")(0)).distinct.sorted.toSeq ==
      Seq("region=0", "region=1", "region=2"))
    // the PARTITION filter narrows to one source-column value
    val r1 = spark.sql("SHOW PARTITIONS g29.t PARTITION (region = 1)")
      .collect().map(_.getString(0))
    assert(r1.nonEmpty && r1.forall(_.startsWith("region=1/")))
    // a non-partition column refuses; an unpartitioned table refuses
    intercept[Exception](spark.sql("SHOW PARTITIONS g29.t PARTITION (name = 'x')"))
    spark.sql("CREATE TABLE g29.flat (id BIGINT)")
    intercept[Exception](spark.sql("SHOW PARTITIONS g29.flat"))

    // entries: ADDED/EXISTING status tracks the head sequence; the adding
    // snapshot is the first one listing the file
    spark.sql("INSERT INTO g29.t VALUES (1000, 9, 'late')")
    val headId = cat.loadTable("t").currentSnapshotId.get
    val e = spark.sql("SELECT status, snapshot_id, content FROM g29.t.entries").collect()
    assert(e.count(_.getInt(0) == 1) >= 1, "the late append must show ADDED")
    assert(e.filter(_.getInt(0) == 1).forall(_.getLong(1) == headId))
    assert(e.filter(_.getInt(0) == 0).forall(_.getLong(1) < headId))

    // manifests: one row per (content, spec) group with export-shaped counts
    val m = spark.sql("SELECT content, added_files_count, existing_files_count " +
      "FROM g29.t.manifests").collect()
    assert(m.map(_.getInt(0)).toSet == Set(0), "data-only table: one data group")
    assert(m.map(r => r.getLong(1) + r.getLong(2)).sum ==
      spark.sql("SELECT count(*) FROM g29.t.files").head.getLong(0))
    // a delete adds a deletes group
    spark.sql("DELETE FROM g29.t WHERE id = 7")
    assert(spark.sql("SELECT content FROM g29.t.manifests").collect()
      .map(_.getInt(0)).toSet == Set(0, 1))

    // all_entries: one row per (snapshot, entry) across the history —
    // every snapshot's entry count sums, and per-listing-snapshot the
    // rows match that snapshot's files table
    val headFiles = spark.sql("SELECT count(*) FROM g29.t.files").head.getLong(0)
    val lastListing = spark.sql(
      "SELECT count(*) FROM g29.t.all_entries WHERE listing_snapshot_id = " +
        cat.loadTable("t").currentSnapshotId.get).head.getLong(0)
    assert(lastListing == headFiles)
    assert(spark.sql("SELECT count(*) FROM g29.t.all_entries").head.getLong(0) > headFiles)
  }

  test("position_deletes metadata table: parquet tombstones AND deletion vectors decode") {
    val cat = freshCatalog("g30")
    spark.sql("CREATE TABLE g30.t (id BIGINT, v STRING)")
    spark.sql("INSERT INTO g30.t SELECT id, concat('v', id) FROM range(40)")
    spark.sql("DELETE FROM g30.t WHERE id IN (3, 17)") // parquet tombstones
    val pd1 = spark.sql(
      "SELECT file_path, pos, delete_file, sequence_number FROM g30.t.position_deletes")
      .collect()
    assert(pd1.length == 2)
    assert(pd1.forall(r => r.getString(2).endsWith(".parquet") && r.getLong(3) >= 2L))

    // on a v3 table the SAME front-door DELETE routes to deletion vectors
    // (the spec forbids new position-delete files in v3) and the
    // tombstones decode from their Puffin blob coordinates
    val cat2 = freshCatalog("g31")
    spark.sql("CREATE TABLE g31.t (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('format-version' = '3')")
    spark.sql("INSERT INTO g31.t SELECT id, concat('v', id) FROM range(40)")
    spark.sql("DELETE FROM g31.t WHERE id % 8 = 0")
    assert(cat2.loadTable("t").currentSnapshot.get.manifest
      .filter(_.content == FileContent.PositionDeletes).forall(_.isDeletionVector),
      "v3 front-door DELETE must write deletion vectors, not parquet tombstones")
    val pd2 = spark.sql("SELECT * FROM g31.t.position_deletes").collect()
    assert(pd2.length == 5, s"expected 5 DV tombstones, got ${pd2.length}")
    assert(pd2.forall(_.getString(2).endsWith(".puffin")))
    // positions are consistent with the MOR view: tombstoned rows are gone
    assert(spark.sql("SELECT count(*) FROM g31.t").head.getLong(0) == 35L)
    // ...and the table exports as clean v3 without any conversion pass
    IcebergExport.exportIcebergMetadata(cat2, "t")
  }

  test("column DEFAULTs fold to literals at CREATE; non-constants refuse") {
    val cat = freshCatalog("g28")
    // a constant EXPRESSION folds once at CREATE time — the stored
    // initial-default is the evaluated literal, not the expression text
    spark.sql("CREATE TABLE g28.t (id BIGINT, n INT DEFAULT 1 + 1)")
    assert(cat.loadTable("t").schema.find(_.name == "n").get.initialDefault.contains("2"))
    spark.sql("INSERT INTO g28.t (id) VALUES (7)")
    assert(spark.sql("SELECT n FROM g28.t").head.getInt(0) == 2)
    // a non-constant default would make file-absent snapshot reads
    // re-evaluate per query (and is not a legal Iceberg initial-default)
    val e = intercept[Exception](
      spark.sql("CREATE TABLE g28.bad (id BIGINT, ts TIMESTAMP DEFAULT current_timestamp())"))
    assert(e.getMessage.contains("constant") || e.getMessage.contains("literal"))
    assert(!cat.tableExists("bad"))
  }

  test("SQL identifiers resolve case-insensitively against declared column casing") {
    val cat = freshCatalog("g15")
    spark.sql("CREATE TABLE g15.t (myKey BIGINT, myVal STRING) PARTITIONED BY (MYKEY)")
    assert(cat.loadTable("t").partitionSpec == Seq(PartitionField("myKey")))
    spark.sql("INSERT INTO g15.t (MYVAL, mykey) VALUES ('a', 1), ('b', 2)")
    spark.sql("INSERT INTO g15.t BY NAME SELECT 'c' AS MYVAL, 3 AS MyKey")
    spark.sql("UPDATE g15.t SET MYVAL = 'z' WHERE myval = 'b'")
    spark.range(3, 5).selectExpr("id AS myKey", "'m' AS myVal")
      .createOrReplaceTempView("g15_src")
    spark.sql(
      """MERGE INTO g15.t AS t USING g15_src AS s ON t.MYKEY = s.myKey
        |WHEN MATCHED THEN UPDATE SET MyVal = s.myVal
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val rows = spark.sql("SELECT myKey, myVal FROM g15.t ORDER BY myKey").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((1L, "a"), (2L, "z"), (3L, "m"), (4L, "m")), s"got $rows")
    spark.sql("ALTER TABLE g15.t RENAME COLUMN MYVAL TO v2")
    assert(cat.loadTable("t").schemaColumns == Seq("myKey", "v2"))
  }

  test("front door is catalog-agnostic: full SQL DML cycle over RestCatalog on mocks3") {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.mocks3.impl", classOf[graft.testkit.MockS3FileSystem].getName)
    hc.set("fs.AbstractFileSystem.mocks3.impl", classOf[graft.testkit.MockS3Afs].getName)
    val server = new RestCatalog.Server(
      "mocks3://" + Files.createTempDirectory("graft-sql-s3").toString)
    try {
      GraftSql.register("s3sql", new RestCatalog.Client(server.uri))
      spark.sql("CREATE TABLE s3sql.t (k BIGINT, v STRING)")
      spark.sql("INSERT INTO s3sql.t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
      spark.sql("UPDATE s3sql.t SET v = upper(v) WHERE k = 2")
      spark.sql("DELETE FROM s3sql.t WHERE k = 3")
      spark.range(2, 5).selectExpr("id AS k", "'m' AS v")
        .createOrReplaceTempView("s3sql_src")
      spark.sql(
        """MERGE INTO s3sql.t AS t USING s3sql_src AS s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET v = s.v
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      spark.sql("CALL s3sql.system.rewrite_data_files('t')")
      val rows = spark.sql("SELECT k, v FROM s3sql.t ORDER BY k").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(rows == Seq((1L, "a"), (2L, "m"), (3L, "m"), (4L, "m")), s"got $rows")
      // every byte of the SQL-built table lives on object-store semantics
      new RestCatalog.Client(server.uri).loadTable("t")
        .currentSnapshot.get.manifest.foreach { f =>
          assert(f.path.startsWith("mocks3:/"), f.path)
        }
    } finally server.stop()
  }

  test("errors: unknown table, unknown suffix, write to a read-only suffix") {
    val cat = freshCatalog("g8")
    IceWrite.create(spark, cat, "n", spark.read.parquet(s"$sf/nation.parquet"))
    val e1 = intercept[Exception](spark.sql("SELECT * FROM g8.nope"))
    assert(e1.getMessage.contains("does not exist"))
    val e2 = intercept[Exception](spark.sql("SELECT * FROM g8.n.bogus_suffix"))
    assert(e2.getMessage.contains("unknown suffix"))
    val e3 = intercept[Exception](
      spark.sql("INSERT INTO g8.n.branch_dev VALUES (1, 'x', 'y', 2)"))
    assert(e3.getMessage.contains("read-only"))
    // non-graft relations still resolve through Spark's own catalogs
    spark.range(3).createOrReplaceTempView("plain_view")
    assert(spark.sql("SELECT count(*) AS c FROM plain_view").head.getLong(0) == 3)
  }

  test("ALTER TABLE RENAME TO: metadata-only rename through the front door") {
    import spark.implicits._
    val cat = freshCatalog("grn")
    IceWrite.create(spark, cat, "t",
      (1L to 25L).map(i => (i, s"n$i")).toDF("id", "name"))
    IceWrite.deleteWhere(spark, cat, "t", col("id") % 5 === 0)
    val uuid = cat.loadTable("t").stableUuid
    val snaps = cat.loadTable("t").snapshots.size

    spark.sql("ALTER TABLE grn.t RENAME TO t2")
    // identity + full MOR history preserved; data untouched
    assert(cat.loadTable("t2").stableUuid == uuid)
    assert(cat.loadTable("t2").snapshots.size == snaps)
    assert(spark.sql("SELECT count(*) AS c FROM grn.t2").head.getLong(0) == 20L)
    // the old name is GONE from the front door...
    val gone = intercept[Exception](spark.sql("SELECT * FROM grn.t").collect())
    assert(gone.getMessage.contains("t"), gone.getMessage)
    // ...and writes keep working under the new one
    spark.sql("INSERT INTO grn.t2 VALUES (100, 'post')")
    assert(spark.sql("SELECT count(*) AS c FROM grn.t2").head.getLong(0) == 21L)

    // qualified new names must stay in the same catalog
    spark.sql("ALTER TABLE grn.t2 RENAME TO grn.t3")
    assert(cat.tableExists("t3"))
    val cross = intercept[Exception](
      spark.sql("ALTER TABLE grn.t3 RENAME TO other.t4"))
    assert(cross.getMessage.contains("must stay in"), cross.getMessage)
    // occupied destination refuses; views refuse the TABLE rename door
    IceWrite.create(spark, cat, "occupied", Seq((1L, "x")).toDF("id", "name"))
    val occ = intercept[Exception](
      spark.sql("ALTER TABLE grn.t3 RENAME TO occupied"))
    assert(occ.getMessage.contains("already exists"), occ.getMessage)
    spark.sql("CREATE VIEW grn.v AS SELECT id FROM grn.t3")
    val vw = intercept[Exception](spark.sql("ALTER TABLE grn.v RENAME TO v2"))
    assert(vw.getMessage.contains("VIEW"), vw.getMessage)
    GraftSql.unregister("grn")
  }
}
