package graft.exec

import java.nio.file.Files

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.meta.{IceRead, IceWrite, LocalCatalog, PartitionField}

/** Randomized truth-check of the file-skipping + metadata-aggregate layer:
  * a mixed-type table written in several commits (so zone maps differ per
  * file), then ~100 random predicates and aggregates compared against a
  * driver-side collected model. A wrong SKIP silently drops rows, so this
  * is the spec that would catch it. Seeded — failures reproduce. */
case class FuzzRow(id: Long, v: java.lang.Long, x: java.lang.Double,
    s: String, d: java.sql.Date, grp: String)

class PruneFuzzSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private type R = FuzzRow
  private val R = FuzzRow

  private def mkRows(seed: Int, n: Int): Seq[R] = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { i =>
      R(
        id = i.toLong + seed * 1000L,
        v = if (rnd.nextInt(5) == 0) null else java.lang.Long.valueOf(rnd.nextInt(200) - 100),
        x = if (rnd.nextInt(7) == 0) null else java.lang.Double.valueOf(rnd.nextInt(1000) / 8.0),
        s = "s" + rnd.nextInt(50),
        d = java.sql.Date.valueOf(s"2024-0${1 + rnd.nextInt(9)}-${10 + rnd.nextInt(18)}"),
        grp = Seq("alpha", "beta", "gamma", "delta")(rnd.nextInt(4)))
    }
  }

  private lazy val (cat, truth) = {
    val c = LocalCatalog(Files.createTempDirectory("fuzz-wh").toString)
    val batches = (0 until 4).map(s => mkRows(s, 150))
    IceWrite.create(spark, c, "fz", batches.head.toDF(),
      partitionSpec = Seq(PartitionField("grp")))
    batches.tail.foreach(b => IceWrite.append(spark, c, "fz", b.toDF()))
    // tombstone a slice so one table has live deletes too
    (c, batches.flatten)
  }

  private def randomPredicate(rnd: scala.util.Random, depth: Int = 0): (Column, R => Boolean) = {
    def leaf(): (Column, R => Boolean) = rnd.nextInt(12) match {
      case 0 =>
        val k = rnd.nextInt(800) + rnd.nextInt(4) * 1000L
        (col("id") > k, r => r.id > k)
      case 1 =>
        val k = rnd.nextInt(800) + rnd.nextInt(4) * 1000L
        (col("id") <= k, r => r.id <= k)
      case 2 =>
        val k = rnd.nextInt(200) - 100L
        (col("v") === k, r => r.v != null && r.v == k)
      case 3 =>
        val k = rnd.nextInt(200) - 100L
        (col("v") < k, r => r.v != null && r.v < k)
      case 4 => (col("v").isNull, r => r.v == null)
      case 5 => (col("x").isNotNull, r => r.x != null)
      case 6 =>
        val k = rnd.nextInt(1000) / 8.0
        (col("x") >= k, r => r.x != null && r.x >= k)
      case 7 =>
        val g = Seq("alpha", "beta", "gamma", "delta", "absent")(rnd.nextInt(5))
        (col("grp") === g, r => r.grp == g)
      case 8 =>
        val ss = Seq.fill(1 + rnd.nextInt(3))("s" + rnd.nextInt(60))
        (col("s").isin(ss: _*), r => ss.contains(r.s))
      case 9 =>
        val dd = java.sql.Date.valueOf(s"2024-0${1 + rnd.nextInt(9)}-15")
        (col("d") > lit(dd), r => r.d.compareTo(dd) > 0)
      case 10 => // string zone-map range (binary order == Java order for ASCII)
        val k = "s" + rnd.nextInt(60)
        (col("s") >= k, r => r.s >= k)
      case 11 => // string prefix
        val p = "s" + rnd.nextInt(6)
        (col("s").startsWith(p), r => r.s.startsWith(p))
    }
    if (depth >= 2 || rnd.nextInt(3) == 0) leaf()
    else {
      val (c1, f1) = randomPredicate(rnd, depth + 1)
      val (c2, f2) = randomPredicate(rnd, depth + 1)
      if (rnd.nextBoolean()) (c1 && c2, r => f1(r) && f2(r))
      else (c1 || c2, r => f1(r) || f2(r))
    }
  }

  test("100 random predicates: pruned scan matches the collected model exactly") {
    val rnd = new scala.util.Random(20260815)
    (1 to 100).foreach { i =>
      val (pred, model) = randomPredicate(rnd)
      val got = IceRead.table(spark, cat, "fz").filter(pred)
        .select("id").as[Long].collect().sorted.toSeq
      val want = truth.filter(model).map(_.id).sorted
      assert(got == want, s"case $i predicate $pred: got ${got.size} want ${want.size}")
    }
  }

  test("100 random predicates over a TRUNCATE-partitioned table match the model") {
    // the same corpus re-laid-out under truncate transforms: string
    // prefixes on s (the URL/key layout) + width-1000 buckets on id.
    // Every predicate now ALSO exercises truncCompare/truncPrefixMatch —
    // a wrong skip in the prefix-interval math is silent row loss here.
    val c2 = LocalCatalog(Files.createTempDirectory("fuzz-tr-wh").toString)
    val batches = (0 until 4).map(s => mkRows(s, 150))
    IceWrite.create(spark, c2, "ft", batches.head.toDF(),
      partitionSpec = Seq(
        PartitionField("s", "truncate[2]"), PartitionField("id", "truncate[1000]")))
    batches.tail.foreach(b => IceWrite.append(spark, c2, "ft", b.toDF()))
    val rnd = new scala.util.Random(20260816)
    var pruned = 0
    (1 to 100).foreach { i =>
      val (pred, model) = randomPredicate(rnd)
      val q = IceRead.table(spark, c2, "ft").filter(pred)
      val got = q.select("id").as[Long].collect().sorted.toSeq
      val want = truth.filter(model).map(_.id).sorted
      assert(got == want, s"case $i predicate $pred: got ${got.size} want ${want.size}")
      if (want.nonEmpty) {
        val (total, kept) = GraftScan.pruneStats(q)
        if (total > 0 && kept < total) pruned += 1
      }
    }
    assert(pruned > 10, s"truncate layout never pruned ($pruned) — arm is vacuous")
  }

  test("metadata aggregates match the collected model across random columns") {
    val byCol = Map[String, R => Option[Long]](
      "id" -> (r => Some(r.id)),
      "v" -> (r => Option(r.v).map(_.longValue())))
    byCol.foreach { case (c, f) =>
      val vals = truth.flatMap(f(_))
      val row = IceRead.table(spark, cat, "fz")
        .agg(min(col(c)).as("mn"), max(col(c)).as("mx"),
          count(col(c)).as("nc"), count(lit(1)).as("n")).collect().head
      assert(row.getLong(0) == vals.min, s"min($c)")
      assert(row.getLong(1) == vals.max, s"max($c)")
      assert(row.getLong(2) == vals.size.toLong, s"count($c)")
      assert(row.getLong(3) == truth.size.toLong)
    }
    // date min/max reconstructs through the day encoding
    val dRow = IceRead.table(spark, cat, "fz")
      .agg(min(col("d")), max(col("d"))).collect().head
    assert(dRow.getDate(0).toString == truth.map(_.d.toString).min)
    assert(dRow.getDate(1).toString == truth.map(_.d.toString).max)
  }

  test("deletes invalidate the metadata shortcut but never the answers") {
    val c2 = LocalCatalog(Files.createTempDirectory("fuzz2-wh").toString)
    IceWrite.create(spark, c2, "fd", truth.take(300).toDF(),
      partitionSpec = Seq(PartitionField("grp")))
    IceWrite.deleteWhere(spark, c2, "fd", col("id") % 3 === 0)
    val live = truth.take(300).filter(_.id % 3 != 0)
    val row = IceRead.table(spark, c2, "fd")
      .agg(count(lit(1)), min(col("id")), max(col("id"))).collect().head
    assert(row.getLong(0) == live.size.toLong)
    assert(row.getLong(1) == live.map(_.id).min && row.getLong(2) == live.map(_.id).max)
    // and filtered reads stay exact under MOR + pruning
    val got = IceRead.table(spark, c2, "fd").filter(col("grp") === "beta" && col("id") > 1500L)
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == live.filter(r => r.grp == "beta" && r.id > 1500L).map(_.id).sorted)
  }
}
