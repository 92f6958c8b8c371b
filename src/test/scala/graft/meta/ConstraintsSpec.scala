package graft.meta

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** CHECK constraints: enforcement must be atomic (a rejected batch leaves
  * no rows, no snapshot, and no files), NULL must pass (ANSI CHECK),
  * add-constraint must validate existing data, and drop must re-open the
  * gate.
  */
class ConstraintsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def freshTable(): (LocalCatalog, String) = {
    val catalog = LocalCatalog(Files.createTempDirectory("graft-ck-wh").toString)
    IceWrite.create(spark, catalog, "t",
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "name", "bal"))
    (catalog, "t")
  }

  private def dataFileCount(catalog: LocalCatalog): Long =
    Files.list(Paths.get(catalog.loadTable("t").location, "data")).count()

  test("checkedAppend rejects a violating batch atomically") {
    val (catalog, t) = freshTable()
    Constraints.addCheck(spark, catalog, t, "bal_nonneg", "bal >= 0")
    Constraints.addNotNull(spark, catalog, t, "name")
    val vBefore = catalog.loadTable(t).version
    val filesBefore = dataFileCount(catalog)

    val dirty = Seq((3L, "c", -5L), (4L, null.asInstanceOf[String], 7L), (5L, "e", -1L))
      .toDF("id", "name", "bal")
    val e = intercept[Constraints.ConstraintViolationException](
      Constraints.checkedAppend(spark, catalog, t, dirty))
    assert(e.violations == Map("bal_nonneg" -> 2L, "name_not_null" -> 1L))
    assert(catalog.loadTable(t).version == vBefore, "no metadata commit")
    assert(dataFileCount(catalog) == filesBefore, "written files reclaimed")
    assert(IceRead.table(spark, catalog, t).count() == 2)

    Constraints.checkedAppend(spark, catalog, t, Seq((6L, "f", 0L)).toDF("id", "name", "bal"))
    assert(IceRead.table(spark, catalog, t).count() == 3)
  }

  test("NULL passes CHECK (ANSI) but fails NOT NULL") {
    val (catalog, t) = freshTable()
    Constraints.addCheck(spark, catalog, t, "bal_nonneg", "bal >= 0")
    // null bal -> predicate UNKNOWN -> passes
    Constraints.checkedAppend(spark, catalog, t,
      Seq((3L, "c", null.asInstanceOf[java.lang.Long])).toDF("id", "name", "bal"))
    assert(IceRead.table(spark, catalog, t).count() == 3)
    // existing null -> NOT NULL on the same column must refuse to attach
    val e = intercept[Constraints.ConstraintViolationException](
      Constraints.addNotNull(spark, catalog, t, "bal"))
    assert(e.violations == Map("bal_not_null" -> 1L))
  }

  test("addCheck validates existing data and commits nothing on failure") {
    val (catalog, t) = freshTable()
    val vBefore = catalog.loadTable(t).version
    val e = intercept[Constraints.ConstraintViolationException](
      Constraints.addCheck(spark, catalog, t, "big_bal", "bal >= 100"))
    assert(e.violations == Map("big_bal" -> 2L))
    assert(catalog.loadTable(t).version == vBefore)
    assert(Constraints.checks(catalog.loadTable(t)).isEmpty)
  }

  test("dropCheck re-opens the gate; violationReport counts per constraint") {
    val (catalog, t) = freshTable()
    Constraints.addCheck(spark, catalog, t, "bal_nonneg", "bal >= 0")
    val dirty = Seq((9L, "z", -3L)).toDF("id", "name", "bal")
    val report = Constraints.violationReport(dirty, Constraints.checks(catalog.loadTable(t)))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(report == Seq(("bal_nonneg", 1L)))
    Constraints.dropCheck(catalog, t, "bal_nonneg")
    Constraints.checkedAppend(spark, catalog, t, dirty)
    assert(IceRead.table(spark, catalog, t).count() == 3)
  }
}
