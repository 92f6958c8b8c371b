package graft.exec

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.meta.{IceRead, IceWrite, LocalCatalog, PartitionField}

/** Metadata-only `count(*)`: ungrouped counts over deleteless graft scans
  * must answer from manifest record counts (no scan in the plan); any
  * delete application, filter, or grouping falls back to a real scan with
  * identical results. */
class MetadataCountSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def freshCatalog() =
    LocalCatalog(Files.createTempDirectory("mcount-wh").toString)

  private def hasScan(df: DataFrame): Boolean = {
    df.collect()
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      p.collectFirst {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
        case _: FileSourceScanExec => true
      }.getOrElse(false)
    walk(df.queryExecution.executedPlan)
  }

  test("count(*) over a deleteless table answers from the manifest, no scan") {
    val cat = freshCatalog()
    IceWrite.create(spark, cat, "c1", (1L to 100L).map(i => (i, s"n$i")).toDF("id", "name"))
    IceWrite.append(spark, cat, "c1", (101L to 150L).map(i => (i, s"n$i")).toDF("id", "name"))

    val q = IceRead.table(spark, cat, "c1").groupBy().count()
    assert(q.as[Long].head() == 150L)
    assert(!hasScan(q), "metadata-only count must not scan:\n" + q.queryExecution.executedPlan)

    // Dataset.count() action takes the same plan
    assert(IceRead.table(spark, cat, "c1").count() == 150L)
  }

  test("SQL count(*) through the front door is metadata-only; partitioned tables too") {
    val cat = freshCatalog()
    graft.meta.GraftSql.register("mcnt", cat)
    try {
      val rows = Seq("a", "b").flatMap(g => (1L to 30L).map(i => (i, g))).toDF("id", "grp")
      IceWrite.create(spark, cat, "p1", rows, partitionSpec = Seq(PartitionField("grp")))
      val q = spark.sql("SELECT count(*) AS n, count(1) AS m FROM mcnt.p1")
      assert(q.collect().head.toSeq == Seq(60L, 60L))
      assert(!hasScan(q))
    } finally graft.meta.GraftSql.unregister("mcnt")
  }

  test("deletes, filters, grouping, and distinct all fall back to real scans") {
    val cat = freshCatalog()
    IceWrite.create(spark, cat, "c2", (1L to 40L).map(i => (i, i % 4)).toDF("id", "k"))
    IceWrite.deleteWhere(spark, cat, "c2", col("id") <= 10L)

    // MOR deletes: anti join blocks the rewrite, count reflects tombstones
    val live = IceRead.table(spark, cat, "c2").groupBy().count()
    assert(live.as[Long].head() == 30L)
    assert(hasScan(live), "deletes must force a scan")

    val cat3 = freshCatalog()
    IceWrite.create(spark, cat3, "c3", (1L to 40L).map(i => (i, i % 4)).toDF("id", "k"))
    val filtered = IceRead.table(spark, cat3, "c3").filter(col("id") > 5L).groupBy().count()
    assert(filtered.as[Long].head() == 35L && hasScan(filtered))
    val grouped = IceRead.table(spark, cat3, "c3").groupBy("k").count()
    assert(grouped.collect().map(_.getLong(1)).sum == 40L && hasScan(grouped))
    val distinct = IceRead.table(spark, cat3, "c3").agg(count_distinct(col("k")))
    assert(distinct.collect().head.getLong(0) == 4L && hasScan(distinct))
  }

  test("min/max/count(col) answer from zone maps and null counts, no scan") {
    val cat = freshCatalog()
    val rows = (1L to 100L).map(i =>
      (i, if (i % 4 == 0) null else java.lang.Long.valueOf(i * 3),
        new java.math.BigDecimal(s"${i}.25"))).toDF("id", "v", "d")
      .select(col("id"), col("v"), col("d").cast("decimal(9,2)").as("d"))
    IceWrite.create(spark, cat, "mm", rows.filter(col("id") <= 50L))
    IceWrite.append(spark, cat, "mm", rows.filter(col("id") > 50L))

    val q = IceRead.table(spark, cat, "mm").agg(
      min(col("id")).as("mn"), max(col("id")).as("mx"),
      count(col("v")).as("nv"), count(lit(1)).as("n"),
      min(col("d")).as("dmn"), max(col("d")).as("dmx"))
    val r = q.collect().head
    assert(r.getLong(0) == 1L && r.getLong(1) == 100L)
    assert(r.getLong(2) == 75L && r.getLong(3) == 100L)
    assert(r.getDecimal(4).toPlainString == "1.25" && r.getDecimal(5).toPlainString == "100.25")
    assert(!hasScan(q), "zone-map aggregates must not scan:\n" + q.queryExecution.executedPlan)
  }

  test("min/max over unsafe or stat-less types fall back to a scan") {
    val cat = freshCatalog()
    IceWrite.create(spark, cat, "uf",
      (1L to 20L).map(i => (i, i / 2.0, s"s$i")).toDF("id", "x", "s"))
    val qd = IceRead.table(spark, cat, "uf").agg(min(col("x")))
    assert(qd.collect().head.getDouble(0) == 0.5 && hasScan(qd), "doubles must scan (NaN)")
    val qs = IceRead.table(spark, cat, "uf").agg(max(col("s")))
    assert(qs.collect().head.getString(0) == "s9" && hasScan(qs), "strings have no zone maps")
  }

  test("min/max of an all-null column is null, answered from null counts") {
    val cat = freshCatalog()
    val rows = (1L to 10L).map(i => (i, null.asInstanceOf[java.lang.Long])).toDF("id", "v")
    IceWrite.create(spark, cat, "an", rows)
    val q = IceRead.table(spark, cat, "an").agg(min(col("v")).as("mn"), count(col("v")).as("c"))
    val r = q.collect().head
    assert(r.isNullAt(0) && r.getLong(1) == 0L)
    assert(!hasScan(q))
  }

  test("partition-grouped count/min/max answer from the manifest, no scan") {
    val cat = freshCatalog()
    val rows = (1L to 60L).map(i => (i, s"g${i % 3}", i % 5,
      if (i % 4 == 0) null else java.lang.Long.valueOf(i * 2))).toDF("id", "grp", "band", "v")
    IceWrite.create(spark, cat, "gt", rows.filter(col("id") <= 30L),
      partitionSpec = Seq(PartitionField("grp"), PartitionField("band")))
    IceWrite.append(spark, cat, "gt", rows.filter(col("id") > 30L))

    // full-tuple grouping: one answer row per (grp, band) from the manifest
    val q = IceRead.table(spark, cat, "gt").groupBy("grp", "band")
      .agg(count(lit(1)).as("n"), min(col("id")).as("mn"), max(col("id")).as("mx"),
        count(col("v")).as("nv"), max(col("grp")).as("gmax"))
    val got = q.collect().map(r => (r.getString(0), r.getLong(1)) ->
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getString(6))).toMap
    val want = rows.collect().groupBy(r => (r.getString(1), r.getLong(2))).map {
      case (k, rs) => k -> (rs.length.toLong, rs.map(_.getLong(0)).min,
        rs.map(_.getLong(0)).max, rs.count(!_.isNullAt(3)).toLong, k._1)
    }
    assert(got == want, s"grouped metadata answers diverge:\n got=$got\n want=$want")
    assert(!hasScan(q), "grouped metadata aggregate must not scan:\n" +
      q.queryExecution.executedPlan)

    // grouping by a SUBSET of the partition columns merges tuples
    val sub = IceRead.table(spark, cat, "gt").groupBy("grp")
      .agg(count(lit(1)).as("n"), min(col("id")).as("mn"))
    assert(sub.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("g0" -> 20L, "g1" -> 20L, "g2" -> 20L))
    assert(!hasScan(sub))

    // SQL front door: the "rows per partition" ops query, zero scan jobs
    graft.meta.GraftSql.register("mgrp", cat)
    try {
      val sq = spark.sql(
        "SELECT grp, count(*) AS n, max(id) AS mx FROM mgrp.gt GROUP BY grp")
      assert(sq.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
        Map("g0" -> 20L, "g1" -> 20L, "g2" -> 20L))
      assert(!hasScan(sq))

      // SELECT DISTINCT <partition col> is the same Aggregate shape —
      // the partition-value listing answers from the manifest too
      val dq = spark.sql("SELECT DISTINCT grp FROM mgrp.gt")
      assert(dq.as[String].collect().sorted.toSeq == Seq("g0", "g1", "g2"))
      assert(!hasScan(dq), "DISTINCT partition col must be metadata-only:\n" +
        dq.queryExecution.executedPlan)
    } finally graft.meta.GraftSql.unregister("mgrp")
  }

  test("grouped fallbacks: deletes, non-partition keys, marked specs all scan") {
    val cat = freshCatalog()
    val rows = (1L to 40L).map(i => (i, s"g${i % 2}")).toDF("id", "grp")
    IceWrite.create(spark, cat, "gf", rows,
      partitionSpec = Seq(PartitionField("grp")))

    // grouping by a NON-partition column scans (manifest has no tuples)
    val byData = IceRead.table(spark, cat, "gf").groupBy(col("id") <= 20L).count()
    assert(byData.collect().map(_.getLong(1)).sum == 40L && hasScan(byData))

    // MOR deletes invalidate: grouped counts reflect tombstones via a scan
    IceWrite.deleteWhere(spark, cat, "gf", col("id") <= 10L)
    val q = IceRead.table(spark, cat, "gf").groupBy("grp").count()
    assert(q.collect().map(_.getLong(1)).sum == 30L)
    assert(hasScan(q), "deletes must force grouped counts to scan")

    // partition-spec transform change marks files: grouped answers must
    // not trust marked files' values (old domain) -> scan, still correct
    val cat2 = freshCatalog()
    IceWrite.create(spark, cat2, "gm", rows, partitionSpec = Seq(PartitionField("grp")))
    graft.meta.SchemaEvolution.updatePartitionSpec(cat2, "gm",
      Seq(PartitionField("grp", "truncate[1]")))
    val qm = IceRead.table(spark, cat2, "gm").groupBy("grp").count()
    assert(qm.collect().map(_.getLong(1)).sum == 40L)
    assert(hasScan(qm), "marked files must force grouped counts to scan")
  }

  test("time travel counts the snapshot it names") {
    val cat = freshCatalog()
    IceWrite.create(spark, cat, "c4", (1L to 25L).map(i => (i, i)).toDF("id", "v"))
    val v1 = cat.loadTable("c4").currentSnapshot.get.snapshotId
    IceWrite.append(spark, cat, "c4", (26L to 60L).map(i => (i, i)).toDF("id", "v"))

    val q1 = IceRead.tableAt(spark, cat, "c4", v1).groupBy().count()
    assert(q1.as[Long].head() == 25L && !hasScan(q1))
    val q2 = IceRead.table(spark, cat, "c4").groupBy().count()
    assert(q2.as[Long].head() == 60L && !hasScan(q2))
  }
}
