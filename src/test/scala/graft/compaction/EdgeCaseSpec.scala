package graft.compaction

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.meta._
import graft.selection._
import graft.testkit.FileGenerator

/** Edge cases mirrored from the reference's integration layer: SQL-keyword
  * schemas (integration_tests.rs:46-56), branch-targeted commits, and the
  * OverwriteFiles commit variant (mod.rs:1068-1177). */
class EdgeCaseSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def newCatalog(): LocalCatalog =
    LocalCatalog(Files.createTempDirectory("graft-wh").toString)

  test("ident normalization: case-drifted manifest columns resolve; opt-out is strict") {
    val catalog = newCatalog()
    val src = spark.read.parquet("/root/testdata/sf0.001/region.parquet")
    graft.testkit.FileGenerator.writeTable(spark, catalog, "t_ident", src,
      graft.testkit.FileGenerator.Config(dataFileCount = 2, orderCol = "r_regionkey"))
    // drift the metadata schema's casing away from the files' lowercase
    val meta = catalog.loadTable("t_ident")
    catalog.commit(meta, meta.copy(schema =
      meta.schema.map(f => f.copy(name = f.name.toUpperCase))))

    // normalization OFF first (the files are still lowercase): strict
    // case-sensitive resolution must refuse the drifted names — and the
    // caller's session conf stays untouched
    val before = spark.conf.get("spark.sql.caseSensitive", "false")
    intercept[Exception] {
      new Compaction(catalog, "t_ident", spark,
        config = FullCompactionConfig(PlanningParams(maxOutputParallelism = 1)),
        enableIdentNormalization = false).compact()
    }
    assert(spark.conf.get("spark.sql.caseSensitive", "false") == before)

    // normalization ON (default, = reference enable_ident_normalization):
    // case-insensitive resolution rescues the same drift
    val ok = new Compaction(catalog, "t_ident", spark,
      config = FullCompactionConfig(PlanningParams(maxOutputParallelism = 1))).compact()
    assert(ok.addedFiles.nonEmpty)
    assert(spark.read.parquet(ok.addedFiles.map(_.path): _*).count() == src.count())
    assert(spark.conf.get("spark.sql.caseSensitive", "false") == before)
  }

  test("SQL-keyword column names survive the whole pipeline") {
    val catalog = newCatalog()
    // columns named select/from/where/order (FIXTURES.md §2)
    val src = spark.range(300).select(
      col("id").cast("int").as("select"),
      concat(lit("s"), col("id")).as("from"),
      (col("id") * 1.5).as("where"),
      col("id").as("order"))
    FileGenerator.writeTable(spark, catalog, "keyword_table", src,
      FileGenerator.Config(dataFileCount = 5, eqDeleteRowsPerFile = 10,
        equalityIds = Seq("select"), orderCol = "order"))
    val c = new Compaction(catalog, "keyword_table", spark,
      config = FullCompactionConfig(PlanningParams(maxOutputParallelism = 2)),
      enableValidate = true)
    val res = c.compact()
    assert(res.addedFiles.nonEmpty)
    val after = catalog.loadTable("keyword_table")
    val out = spark.read.parquet(after.currentSnapshot.get.manifest
      .filter(_.content == FileContent.Data).map(_.path): _*)
    assert(out.columns.toSeq == Seq("select", "from", "where", "order"))
    assert(out.count() == 300 - 50) // 5 files x 10 eq-deleted unique keys
  }

  test("compaction targeting a branch leaves main's ref intact") {
    val catalog = newCatalog()
    val src = spark.read.parquet("/root/testdata/sf0.001/region.parquet")
    FileGenerator.writeTable(spark, catalog, "t_branch", src,
      FileGenerator.Config(dataFileCount = 2, orderCol = "r_regionkey"))
    // fork a branch pointing at the current snapshot
    val meta = catalog.loadTable("t_branch")
    catalog.commit(meta, meta.copy(refs = meta.refs + ("audit" -> meta.currentSnapshotId.get)))

    val c = new Compaction(catalog, "t_branch", spark,
      config = FullCompactionConfig(PlanningParams(maxOutputParallelism = 1)),
      toBranch = "audit")
    c.compact()
    val after = catalog.loadTable("t_branch")
    assert(after.refs("main") == 1L)       // untouched
    assert(after.refs("audit") != 1L)      // advanced by the commit
    val auditSnap = after.snapshotForRef("audit").get
    assert(auditSnap.manifest.count(_.content == FileContent.Data) == 1)
  }

  test("overwrite commit stamps a fresh sequence number; rewrite keeps the starting one") {
    val catalog = newCatalog()
    val src = spark.read.parquet("/root/testdata/sf0.001/region.parquet")
    FileGenerator.writeTable(spark, catalog, "t_ow", src,
      FileGenerator.Config(dataFileCount = 2, orderCol = "r_regionkey"))

    val c1 = new Compaction(catalog, "t_ow", spark,
      config = FullCompactionConfig(PlanningParams(maxOutputParallelism = 1)))
    val outcomes1 = c1.concurrentRewritePlans(c1.planCompaction())
    val t1 = c1.commitRewriteResults(outcomes1)
    val seqAfterRewrite = t1.currentSnapshot.get.manifest
      .filter(_.content == FileContent.Data).map(_.sequenceNumber).max
    // rewrite: files keep the STARTING snapshot's sequence number (2)
    assert(seqAfterRewrite == 2L)
    assert(t1.currentSnapshot.get.summary("operation") == "replace")

    val c2 = new Compaction(catalog, "t_ow", spark,
      config = FullCompactionConfig(PlanningParams(maxOutputParallelism = 1)))
    val outcomes2 = c2.concurrentRewritePlans(c2.planCompaction())
    val t2 = c2.commitOverwriteResults(outcomes2)
    val seqAfterOverwrite = t2.currentSnapshot.get.manifest
      .filter(_.content == FileContent.Data).map(_.sequenceNumber).max
    // overwrite: files take the NEW sequence number
    assert(seqAfterOverwrite == t2.lastSequenceNumber)
    assert(t2.currentSnapshot.get.summary("operation") == "overwrite")
  }

  test("append landing between plan and commit survives the compaction commit") {
    val catalog = newCatalog()
    IceWrite.create(spark, catalog, "t_race",
      (1L to 20L).map(i => (i, s"v$i")).toDF("id", "v"), targetFileSizeBytes = 2048)
    val c = new Compaction(catalog, "t_race", spark,
      config = FullCompactionConfig(PlanningParams(maxOutputParallelism = 1)))
    val plans = c.planCompaction()
    val outcomes = c.concurrentRewritePlans(plans)

    // a writer lands between rewrite and commit
    IceWrite.append(spark, catalog, "t_race",
      Seq((100L, "new")).toDF("id", "v"))
    c.commitRewriteResults(outcomes)

    val out = IceRead.table(spark, catalog, "t_race")
      .select($"id").as[Long].collect().toSet
    assert(out == ((1L to 20L) ++ Seq(100L)).toSet)
  }

  test("eq delete committed mid-compaction applies to rewritten rows (replace) but not to overwrite") {
    // the reason the starting-sequence-number rule exists
    // (mod.rs:950-1061): a replace commit stamps rewritten files with the
    // PLANNING snapshot's sequence number, so a concurrent equality
    // delete (newer seq) still erases those rows; an overwrite commit
    // stamps a FRESH sequence number, so its files outrank the delete.
    def run(overwrite: Boolean): Set[Long] = {
      val catalog = newCatalog()
      val name = if (overwrite) "t_ow" else "t_rp"
      IceWrite.create(spark, catalog, name,
        (1L to 20L).map(i => (i, s"v$i")).toDF("id", "v"), targetFileSizeBytes = 2048)
      val c = new Compaction(catalog, name, spark,
        config = FullCompactionConfig(PlanningParams(maxOutputParallelism = 1)))
      val outcomes = c.concurrentRewritePlans(c.planCompaction())
      IceWrite.appendEqualityDeletes(spark, catalog, name,
        Seq(Tuple1(5L)).toDF("id"), Seq("id"))
      if (overwrite) c.commitOverwriteResults(outcomes)
      else c.commitRewriteResults(outcomes)
      IceRead.table(spark, catalog, name).select($"id").as[Long].collect().toSet
    }
    assert(run(overwrite = false) == (1L to 20L).toSet - 5L) // delete wins
    assert(run(overwrite = true) == (1L to 20L).toSet)       // overwrite outranks it
  }

  test("empty table and single-file table produce no plans under small-files") {
    val catalog = newCatalog()
    val src = spark.read.parquet("/root/testdata/sf0.001/region.parquet")
    FileGenerator.writeTable(spark, catalog, "t_single", src,
      FileGenerator.Config(dataFileCount = 1, orderCol = "r_regionkey"))
    // auto planner refuses single-file tables (total_data_files <= 1)
    val report = new AutoCompactionPlanner(AutoCompactionConfig())
      .planReport(catalog, "t_single")
    assert(report.reason == AutoPlanReason.NoCandidate)
  }
}
