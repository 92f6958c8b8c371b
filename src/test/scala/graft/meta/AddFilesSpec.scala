package graft.meta

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** add_files / importParquetTable: registering foreign parquet (no field
  * ids) with footer-only stats, mixed id/name-addressed reads, tombstones
  * and compaction over imported files, and the rename guard. */
class AddFilesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def freshCatalog() =
    LocalCatalog(Files.createTempDirectory("addfiles-wh").toString)

  /** Foreign fixture: parquet written by PLAIN Spark (no field ids). */
  private def writeForeign(rows: Seq[(Long, String, Long)], parts: Int = 2): String = {
    val dir = Files.createTempDirectory("addfiles-src").toString + "/t"
    rows.toDF("id", "name", "score").repartition(parts)
      .write.parquet(dir)
    dir
  }
  private def parquetsUnder(dir: String): Seq[String] = {
    scala.util.Using.resource(Files.walk(java.nio.file.Paths.get(dir))) { w =>
      import scala.jdk.CollectionConverters._
      w.iterator().asScala.filter(p => Files.isRegularFile(p) &&
        p.toString.endsWith(".parquet")).map(_.toString).toSeq.sorted
    }
  }

  test("importParquetTable registers files with footer stats and zero rewrite") {
    val catalog = freshCatalog()
    val rows = (1L to 100L).map(i => (i, s"n$i", i * 10))
    val dir = writeForeign(rows, parts = 3)
    val before = parquetsUnder(dir)

    IceWrite.importParquetTable(spark, catalog, "imp", dir)

    val meta = catalog.loadTable("imp")
    val entries = meta.currentSnapshot.get.manifest
    // the registered paths ARE the foreign files — nothing was rewritten
    assert(entries.map(_.path).sorted == before)
    assert(entries.forall(_.nameMatched))
    assert(entries.forall(_.recordCount > 0))
    // footer zone maps landed (numeric columns only)
    assert(entries.forall(_.columnStats.contains("id")))

    // manifest-only count: no deletes -> exact, zero scan
    assert(IceRead.fastCount(catalog, "imp") == Some(100L))

    val got = IceRead.table(spark, catalog, "imp")
      .as[(Long, String, Long)].collect().toSet
    assert(got == rows.toSet)
  }

  test("zone-map range pruning works from imported footer stats") {
    val catalog = freshCatalog()
    // 4 range-disjoint foreign files
    val dir = Files.createTempDirectory("addfiles-rng").toString + "/t"
    (1L to 400L).map(i => (i, s"n$i", i)).toDF("id", "name", "score")
      .repartitionByRange(4, col("id")).write.parquet(dir)
    IceWrite.importParquetTable(spark, catalog, "rng", dir)
    val meta = catalog.loadTable("rng")
    val snap = meta.currentSnapshot.get
    val all = snap.manifest.size
    val kept = IceRead.selectFilesByRange(meta, snap, "id", 1, 50).size
    assert(kept < all, s"range probe pruned nothing: $kept of $all")
    val got = IceRead.tableRange(spark, catalog, "rng", "id", 1, 50)
      .agg(count("*"), sum("id")).as[(Long, Long)].head()
    assert(got == ((50L, 50L * 51 / 2)))
  }

  test("addFiles into a typed engine table: mixed id/name reads, deletes, upsert") {
    val catalog = freshCatalog()
    val native = (1L to 50L).map(i => (i, s"n$i", i))
    IceWrite.create(spark, catalog, "mix", native.toDF("id", "name", "score"))

    val dir = writeForeign((51L to 100L).map(i => (i, s"n$i", i)), parts = 2)
    IceWrite.addFiles(spark, catalog, "mix", parquetsUnder(dir))

    val all = IceRead.table(spark, catalog, "mix").as[(Long, String, Long)].collect()
    assert(all.length == 100)
    assert(all.map(_._1).toSet == (1L to 100L).toSet)
    // imported rows carry real values, not the id-reader's silent NULLs
    assert(all.filter(_._1 > 50).forall(r => r._2 == s"n${r._1}" && r._3 == r._1))

    // deleteWhere must tombstone rows inside IMPORTED files too
    IceWrite.deleteWhere(spark, catalog, "mix", col("id") % 10 === 0)
    val afterDel = IceRead.table(spark, catalog, "mix").as[(Long, String, Long)].collect()
    assert(afterDel.map(_._1).toSet == (1L to 100L).filterNot(_ % 10 == 0).toSet)

    // equality-delete upsert replaces imported rows by key
    IceWrite.upsert(spark, catalog, "mix",
      Seq((77L, "SEVENTY", 0L)).toDF("id", "name", "score"), keys = Seq("id"))
    val r77 = IceRead.table(spark, catalog, "mix")
      .filter(col("id") === 77).as[(Long, String, Long)].collect()
    assert(r77.toSeq == Seq((77L, "SEVENTY", 0L)))
  }

  test("rename refused while imported files live; compaction + expiry graduates them") {
    val catalog = freshCatalog()
    val dir = writeForeign((1L to 30L).map(i => (i, s"n$i", i)))
    IceWrite.importParquetTable(spark, catalog, "grad", dir)

    val e = intercept[IllegalArgumentException](
      SchemaEvolution.renameColumn(catalog, "grad", "name", "title"))
    assert(e.getMessage.contains("name-addressed"))

    // compaction rewrites imported files with field ids stamped
    new graft.compaction.Compaction(catalog, "grad", spark).compact()
    val cur = catalog.loadTable("grad").currentSnapshot.get.manifest
    assert(cur.forall(!_.nameMatched))
    // old snapshots still hold the imported entries -> still refused
    intercept[IllegalArgumentException](
      SchemaEvolution.renameColumn(catalog, "grad", "name", "title"))
    graft.compaction.Maintenance.expireSnapshots(catalog, "grad", keepLast = 1)

    SchemaEvolution.renameColumn(catalog, "grad", "name", "title")
    val got = IceRead.table(spark, catalog, "grad")
      .select("id", "title").as[(Long, String)].collect().toSet
    assert(got == (1L to 30L).map(i => (i, s"n$i")).toSet)
  }

  test("validation: missing column, type conflict, double registration") {
    val catalog = freshCatalog()
    IceWrite.create(spark, catalog, "val1",
      Seq((1L, "a", 1L)).toDF("id", "name", "score"))

    // a file lacking `score` is refused (no initial-default)
    val d1 = Files.createTempDirectory("addfiles-miss").toString + "/t"
    Seq((2L, "b")).toDF("id", "name").write.parquet(d1)
    val e1 = intercept[IllegalArgumentException](
      IceWrite.addFiles(spark, catalog, "val1", parquetsUnder(d1)))
    assert(e1.getMessage.contains("score"))

    // type conflict is refused
    val d2 = Files.createTempDirectory("addfiles-type").toString + "/t"
    Seq((2, "b", "oops")).toDF("id", "name", "score").write.parquet(d2)
    intercept[Exception](IceWrite.addFiles(spark, catalog, "val1", parquetsUnder(d2)))

    // registering the same path twice is refused — including alternate
    // spellings of the same path ('//' and '/./' normalize away)
    val d3 = writeForeign(Seq((5L, "e", 5L)), parts = 1)
    val files = parquetsUnder(d3)
    IceWrite.addFiles(spark, catalog, "val1", files)
    val e3 = intercept[IllegalArgumentException](
      IceWrite.addFiles(spark, catalog, "val1", files))
    assert(e3.getMessage.contains("already registered"))
    val respelled = files.map(_.replaceFirst("/([^/]+)$", "/./$1"))
    val e4 = intercept[IllegalArgumentException](
      IceWrite.addFiles(spark, catalog, "val1", respelled))
    assert(e4.getMessage.contains("already registered"))
  }

  test("a column added with an initial-default may be absent from imported files") {
    val catalog = freshCatalog()
    IceWrite.create(spark, catalog, "dflt",
      Seq((1L, "a", 1L)).toDF("id", "name", "score"))
    SchemaEvolution.addColumn(catalog, "dflt", "lang", "STRING", default = Some("'en'"))

    val dir = writeForeign(Seq((2L, "b", 2L)), parts = 1) // no `lang` column
    IceWrite.addFiles(spark, catalog, "dflt", parquetsUnder(dir))
    val got = IceRead.table(spark, catalog, "dflt")
      .select("id", "lang").as[(Long, String)].collect().toSet
    // both the pre-evolution native file and the imported file read the default
    assert(got == Set((1L, "en"), (2L, "en")))
  }

  test("hive-style identity partition values decode from path segments") {
    val catalog = freshCatalog()
    val root = Files.createTempDirectory("addfiles-part").toString
    // hive layout with the partition column ALSO materialized in the files
    for (g <- Seq("a", "b")) {
      val rows = (1L to 10L).map(i => (i, g))
      rows.toDF("id", "grp").coalesce(1)
        .write.parquet(s"$root/grp=$g")
    }
    IceWrite.importParquetTable(spark, catalog, "part", root,
      partitionSpec = Seq(PartitionField("grp")))

    val entries = catalog.loadTable("part").currentSnapshot.get.manifest
    assert(entries.nonEmpty)
    assert(entries.forall(e => e.partitionValues.get("grp").exists(Set("a", "b"))))
    // partition-pruned read touches only grp=a files and is exact
    val got = IceRead.tablePartition(spark, catalog, "part", Map("grp" -> "a"))
      .agg(count("*")).as[Long].head()
    assert(got == 10L)
  }
}
