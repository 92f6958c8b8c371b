package graft.meta

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Changelog-driven incremental materialized views: refresh must equal a
  * full recompute after any mix of base writes, groups must vanish at
  * count zero, compaction must be invisible, and a no-op refresh must not
  * commit.
  */
class MaterializedViewSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.001"

  private def baseRows = spark.read.parquet(s"$sf/supplier.parquet")
    .select(col("s_suppkey"), col("s_nationkey"),
      round(col("s_acctbal") * 100, 0).cast("long").as("bal_cents"))

  private def fullAgg(catalog: LocalCatalog, base: String) =
    IceRead.table(spark, catalog, base)
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as(MaterializedView.CountCol), sum("bal_cents").as("bal_sum"))
      .orderBy("s_nationkey")

  private def mvRows(catalog: LocalCatalog) =
    IceRead.table(spark, catalog, "mv_sup")
      .select(col("s_nationkey"), col(MaterializedView.CountCol), col("bal_sum"))
      .orderBy("s_nationkey")

  test("refresh equals full recompute across append, upsert, delete, compaction") {
    val catalog = LocalCatalog(Files.createTempDirectory("graft-mv-wh").toString)
    IceWrite.create(spark, catalog, "base_sup",
      baseRows.filter(col("s_suppkey") % 3 =!= 0).repartition(2))
    MaterializedView.create(spark, catalog, "mv_sup", "base_sup",
      Seq("s_nationkey"), Seq(MaterializedView.Agg("bal_sum", "bal_cents")))
    assert(mvRows(catalog).collect().toSeq == fullAgg(catalog, "base_sup").collect().toSeq)

    // append the held-out third, tombstone every 5th, upsert a mutation
    IceWrite.append(spark, catalog, "base_sup", baseRows.filter(col("s_suppkey") % 3 === 0))
    IceWrite.deleteWhere(spark, catalog, "base_sup", col("s_suppkey") % 5 === 0)
    IceWrite.upsert(spark, catalog, "base_sup",
      baseRows.filter(col("s_suppkey") % 7 === 1)
        .withColumn("bal_cents", col("bal_cents") + 11L),
      keys = Seq("s_suppkey"))
    MaterializedView.refresh(spark, catalog, "mv_sup")
    assert(mvRows(catalog).collect().toSeq == fullAgg(catalog, "base_sup").collect().toSeq)

    // compaction rewrites base files but must not change the view
    new graft.compaction.Compaction(catalog, "base_sup", spark).compact()
    val v = catalog.loadTable("mv_sup").version
    MaterializedView.refresh(spark, catalog, "mv_sup")
    assert(mvRows(catalog).collect().toSeq == fullAgg(catalog, "base_sup").collect().toSeq)

    // base head unchanged -> refresh is a no-op commit-wise
    val v2 = catalog.loadTable("mv_sup").version
    MaterializedView.refresh(spark, catalog, "mv_sup")
    assert(catalog.loadTable("mv_sup").version == v2)
    assert(v2 > v, "the post-compaction refresh advances the watermark")
  }

  test("groups reaching count zero disappear from the view") {
    val catalog = LocalCatalog(Files.createTempDirectory("graft-mv0-wh").toString)
    IceWrite.create(spark, catalog, "base_sup", baseRows.repartition(2))
    MaterializedView.create(spark, catalog, "mv_sup", "base_sup",
      Seq("s_nationkey"), Seq(MaterializedView.Agg("bal_sum", "bal_cents")))
    val someNation = baseRows.select("s_nationkey").head().getInt(0)
    IceWrite.deleteWhere(spark, catalog, "base_sup", col("s_nationkey") === someNation)
    MaterializedView.refresh(spark, catalog, "mv_sup")
    val nations = mvRows(catalog).collect().map(_.getInt(0)).toSet
    assert(!nations.contains(someNation), s"nation $someNation must vanish")
    assert(mvRows(catalog).collect().toSeq == fullAgg(catalog, "base_sup").collect().toSeq)
  }

  test("non-views and min/max-style definitions are rejected") {
    val catalog = LocalCatalog(Files.createTempDirectory("graft-mvx-wh").toString)
    IceWrite.create(spark, catalog, "plain", baseRows.limit(5))
    val e = intercept[IllegalArgumentException](
      MaterializedView.refresh(spark, catalog, "plain"))
    assert(e.getMessage.contains("not a materialized view"))
    intercept[IllegalArgumentException](
      MaterializedView.create(spark, catalog, "mv_bad", "plain",
        Seq("s_nationkey"), Seq(MaterializedView.Agg(MaterializedView.CountCol, "bal_cents"))))
  }
}
