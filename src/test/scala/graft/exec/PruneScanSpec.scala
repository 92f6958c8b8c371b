package graft.exec

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.meta.{IceRead, IceWrite, LocalCatalog, PartitionField}

/** End-to-end manifest-level file skipping: filters on graft-table reads
  * must reach [[GraftFileIndex.listFiles]] through Catalyst's pushdown and
  * drop files by zone maps / identity partition values — with results
  * identical to the unpruned scan (pruning is plan-shape only). */
class PruneScanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def freshCatalog() =
    LocalCatalog(Files.createTempDirectory("prune-wh").toString)

  /** (total files listed, files kept) summed over every GraftFileIndex
    * scan in the executed plan. Forces execution first so AQE final plans
    * and lazy listings are settled. */
  private def pruneCounts(df: DataFrame): (Int, Int) = {
    df.collect()
    val counts @ (total, _) = GraftScan.pruneStats(df)
    assert(total > 0, "no GraftFileIndex scan in plan:\n" + df.queryExecution.executedPlan)
    counts
  }

  test("string identity-partition predicate prunes to one file per matching partition") {
    val cat = freshCatalog()
    val rows = Seq("a", "b", "c").flatMap(g => (1L to 10L).map(i => (i, g))).toDF("id", "grp")
    IceWrite.create(spark, cat, "t", rows, partitionSpec = Seq(PartitionField("grp")))

    val full = IceRead.table(spark, cat, "t")
    val q = full.filter(col("grp") === "b")
    val (total, kept) = pruneCounts(q)
    assert(total >= 3, s"expected >=3 data files, saw $total")
    assert(kept < total, s"no pruning happened ($kept of $total)")
    assert(q.count() == 10)
    // pruned result identical to a post-hoc filter over the full scan
    assert(q.select("id").as[Long].collect().sorted.toSeq ==
      full.collect().filter(_.getString(1) == "b").map(_.getLong(0)).sorted.toSeq)
  }

  test("numeric zone maps prune disjoint-range appends; results exact") {
    val cat = freshCatalog()
    IceWrite.create(spark, cat, "z", (1L to 100L).map(i => (i, i * 2)).toDF("id", "v"))
    IceWrite.append(spark, cat, "z", (101L to 200L).map(i => (i, i * 2)).toDF("id", "v"))
    IceWrite.append(spark, cat, "z", (201L to 300L).map(i => (i, i * 2)).toDF("id", "v"))

    val q = IceRead.table(spark, cat, "z").filter(col("id") > 250L)
    val (total, kept) = pruneCounts(q)
    assert(total >= 3 && kept < total, s"zone maps did not prune ($kept of $total)")
    assert(q.count() == 50)

    // between straddling two files keeps exactly those
    val mid = IceRead.table(spark, cat, "z").filter(col("id").between(95L, 105L))
    val (t2, k2) = pruneCounts(mid)
    assert(k2 < t2)
    assert(mid.count() == 11)

    // a filter matching nothing prunes every file and returns empty
    val none = IceRead.table(spark, cat, "z").filter(col("id") === -5L)
    val (_, k3) = pruneCounts(none)
    assert(k3 == 0)
    assert(none.count() == 0)
  }

  test("MOR read with deletes stays correct under pruning") {
    val cat = freshCatalog()
    val rows = Seq("a", "b").flatMap(g => (1L to 10L).map(i => (i, g))).toDF("id", "grp")
    IceWrite.create(spark, cat, "m", rows, partitionSpec = Seq(PartitionField("grp")))
    IceWrite.deleteWhere(spark, cat, "m", col("grp") === "b" && col("id") <= 3L)

    val q = IceRead.table(spark, cat, "m").filter(col("grp") === "b")
    val (total, kept) = pruneCounts(q)
    assert(kept < total)
    assert(q.count() == 7, "deletes must still apply on the pruned branch")
    // untouched partition unaffected
    assert(IceRead.table(spark, cat, "m").filter(col("grp") === "a").count() == 10)
  }

  test("SQL front door prunes through spark.sql WHERE clauses") {
    val cat = freshCatalog()
    graft.meta.GraftSql.register("prunecat", cat)
    try {
      val rows = Seq("x", "y", "z").flatMap(g => (1L to 5L).map(i => (i, g))).toDF("id", "grp")
      IceWrite.create(spark, cat, "s", rows, partitionSpec = Seq(PartitionField("grp")))
      val q = spark.sql("SELECT id FROM prunecat.s WHERE grp = 'y' AND id >= 2")
      val (total, kept) = pruneCounts(q)
      assert(total >= 3 && kept < total, s"SQL filter did not prune ($kept of $total)")
      assert(q.as[Long].collect().sorted.toSeq == Seq(2L, 3L, 4L, 5L))
    } finally graft.meta.GraftSql.unregister("prunecat")
  }

  test("randomized range predicates: pruned scan equals post-hoc filtering") {
    val cat = freshCatalog()
    IceWrite.create(spark, cat, "r",
      (1L to 60L).map(i => (i, (i % 7).toDouble)).toDF("id", "v"))
    (1 to 4).foreach(b => IceWrite.append(spark, cat, "r",
      ((b * 60L + 1) to (b * 60L + 60L)).map(i => (i, (i % 7).toDouble)).toDF("id", "v")))
    val all = IceRead.table(spark, cat, "r").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val rnd = new scala.util.Random(42)
    (1 to 12).foreach { _ =>
      val lo = rnd.nextLong().abs % 300 + 1
      val hi = math.min(300L, lo + rnd.nextInt(80))
      val q = IceRead.table(spark, cat, "r")
        .filter(col("id") >= lo && col("id") <= hi && col("v") < 5.0)
      val expect = all.filter { case (i, v) => i >= lo && i <= hi && v < 5.0 }
      assert(q.count() == expect.length, s"mismatch for id in [$lo,$hi]")
    }
  }

  private def graftScans(df: DataFrame): Seq[FileSourceScanExec] = {
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p.collect {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
        case s: FileSourceScanExec if s.relation.location.isInstanceOf[GraftFileIndex] => Seq(s)
      }.flatten ++ p.subqueries.flatMap(walk)
    walk(df.queryExecution.executedPlan)
  }

  test("identity partition columns are served as Spark partition columns") {
    val cat = freshCatalog()
    val rows = Seq("a", "b", "c").flatMap(g => (1L to 8L).map(i => (i, g, i * 2))).toDF("id", "grp", "v")
    IceWrite.create(spark, cat, "pm", rows, partitionSpec = Seq(PartitionField("grp")))
    val q = IceRead.table(spark, cat, "pm").filter(col("grp") >= "b")
    q.collect()
    val scans = graftScans(q)
    assert(scans.nonEmpty)
    assert(scans.forall(_.relation.location.asInstanceOf[GraftFileIndex].partitionMode),
      "partition-schema mode did not engage")
    // the predicate must arrive as a PARTITION filter, not a pushed data filter
    assert(scans.exists(_.partitionFilters.nonEmpty),
      s"no partition filters on scan: ${scans.map(_.partitionFilters)}")
    // values decode from the manifest; results and schema order unchanged
    assert(q.columns.toSeq == Seq("id", "grp", "v"))
    assert(q.count() == 16)
    assert(q.select("grp").distinct().as[String].collect().toSet == Set("b", "c"))
  }

  test("dynamic partition pruning fires on a join against the partition column") {
    val cat = freshCatalog()
    val fact = Seq("a", "b", "c", "d").flatMap(g => (1L to 20L).map(i => (i, g))).toDF("id", "grp")
    IceWrite.create(spark, cat, "dppf", fact, partitionSpec = Seq(PartitionField("grp")))
    // DPP requires a SELECTIVE Filter on the build side at optimization
    // time — a local Seq dim constant-folds away (ConvertToLocalRelation
    // runs before the PartitionPruning batch), so the dim must be a real
    // file source with the filter above it
    val dimDir = Files.createTempDirectory("dpp-dim").toString
    Seq(("a", "drop"), ("b", "keep"), ("c", "drop"), ("d", "drop"))
      .toDF("grp", "tag").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter(col("tag") === "keep")
    val q = IceRead.table(spark, cat, "dppf").join(dim, Seq("grp"))
    val rows = q.collect()
    assert(rows.length == 20)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning") || plan.contains("DynamicPruning"),
      s"expected a DPP subquery in the plan:\n$plan")
    // the runtime filter must have pruned the scan to grp=b's files only
    val scans = graftScans(q)
    val scanned = scans.map(s =>
      s.metrics.get("numFiles").map(_.value).getOrElse(0L)).sum
    val total = scans.map(_.relation.location.asInstanceOf[GraftFileIndex].lastPrune._1).sum
    assert(total >= 4 && scanned < total,
      s"DPP did not reduce scanned files ($scanned of $total)")
  }

  test("unsafe partition column types fall back to flat mode, results exact") {
    val cat = freshCatalog()
    // double identity partition: dir-string round trip not guaranteed ->
    // the index must NOT serve it from the manifest
    val rows = Seq(0.5, 1.5).flatMap(g => (1L to 5L).map(i => (i, g))).toDF("id", "g")
    IceWrite.create(spark, cat, "fm", rows, partitionSpec = Seq(PartitionField("g")))
    val q = IceRead.table(spark, cat, "fm").filter(col("g") === 0.5)
    q.collect()
    val scans = graftScans(q)
    assert(scans.nonEmpty)
    assert(scans.forall(!_.relation.location.asInstanceOf[GraftFileIndex].partitionMode))
    assert(q.count() == 5)
    assert(q.select("g").distinct().as[Double].collect().toSeq == Seq(0.5))
  }

  test("typed date partition column round-trips through partition mode") {
    val cat = freshCatalog()
    val rows = Seq("2024-01-15", "2024-02-20").flatMap(d => (1L to 4L).map(i => (i, d)))
      .toDF("id", "ds").select(col("id"), col("ds").cast("date").as("d"))
    IceWrite.create(spark, cat, "dm", rows, partitionSpec = Seq(PartitionField("d")))
    val q = IceRead.table(spark, cat, "dm").filter(col("d") === lit("2024-01-15").cast("date"))
    q.collect()
    assert(graftScans(q).forall(_.relation.location.asInstanceOf[GraftFileIndex].partitionMode))
    assert(q.count() == 4)
    assert(q.select("d").distinct().as[java.sql.Date].collect().map(_.toString).toSeq ==
      Seq("2024-01-15"))
  }

  test("string zone maps prune data-column predicates across sorted appends") {
    val cat = freshCatalog()
    // three appends with disjoint DOMAIN ranges on a plain string column
    // (not a partition column — this is the zone-map path)
    val batches = Seq(
      ('a' to 'h').map(c => (c.toString * 3, 1L)),
      ('i' to 'p').map(c => (c.toString * 3, 2L)),
      ('q' to 'z').map(c => (c.toString * 3, 3L)))
    IceWrite.create(spark, cat, "sz", batches.head.toDF("domain", "v"))
    batches.tail.foreach(b => IceWrite.append(spark, cat, "sz", b.toDF("domain", "v")))

    val eq = IceRead.table(spark, cat, "sz").filter(col("domain") === "kkk")
    val (t1, k1) = pruneCounts(eq)
    assert(t1 >= 3 && k1 < t1, s"string equality did not prune ($k1 of $t1)")
    assert(eq.count() == 1)

    val pre = IceRead.table(spark, cat, "sz").filter(col("domain").startsWith("qq"))
    val (t2, k2) = pruneCounts(pre)
    assert(k2 < t2, s"prefix did not prune ($k2 of $t2)")
    assert(pre.count() == 1)

    val like = IceRead.table(spark, cat, "sz").filter(col("domain") < "ccc")
    val (t3, k3) = pruneCounts(like)
    assert(k3 < t3)
    assert(like.count() == 2) // aaa, bbb

    val none = IceRead.table(spark, cat, "sz").filter(col("domain") === "0zero")
    val (_, k4) = pruneCounts(none)
    assert(k4 == 0 && none.count() == 0)
  }

  test("bucket-partitioned point lookups prune to one bucket's files") {
    val cat = freshCatalog()
    val rows = (1L to 400L).map(i => (i, s"name$i")).toDF("id", "name")
    IceWrite.create(spark, cat, "bk", rows,
      partitionSpec = Seq(PartitionField("id", "bucket[8]")))
    val q = IceRead.table(spark, cat, "bk").filter(col("id") === 123L)
    val (total, kept) = pruneCounts(q)
    // zone maps can't help (every bucket spans the id range): the bucket
    // transform must do the pruning
    assert(total >= 8 && kept * 4 <= total, s"bucket pruning did not engage ($kept of $total)")
    assert(q.count() == 1)
    // a value that exists nowhere still maps to exactly one bucket
    val none = IceRead.table(spark, cat, "bk").filter(col("id") === 100000L)
    val (_, k2) = pruneCounts(none)
    assert(k2 * 4 <= total && none.count() == 0)
    // range predicates on the bucketed column fall back to a full scan
    assert(IceRead.table(spark, cat, "bk").filter(col("id") > 390L).count() == 10)
  }

  test("time travel keeps pruning and snapshot isolation") {
    val cat = freshCatalog()
    IceWrite.create(spark, cat, "tt", (1L to 50L).map(i => (i, i)).toDF("id", "v"))
    val v1 = cat.loadTable("tt").currentSnapshot.get.snapshotId
    IceWrite.append(spark, cat, "tt", (51L to 100L).map(i => (i, i)).toDF("id", "v"))

    val q = IceRead.tableAt(spark, cat, "tt", v1).filter(col("id") > 40L)
    val (_, kept) = pruneCounts(q)
    assert(q.count() == 10, "time travel must not see the later append")
    assert(kept >= 1)
    val q2 = IceRead.tableAt(spark, cat, "tt", v1).filter(col("id") > 60L)
    val (_, k2) = pruneCounts(q2)
    assert(k2 == 0 && q2.count() == 0)
  }
}
