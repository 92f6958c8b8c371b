package graft.compaction

import java.nio.file.Files
import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.meta._
import graft.selection._

/** Model-based workload test: a seeded random sequence of table operations
  * (append, upsert, deleteWhere, compaction, schema rename, maintenance,
  * tagging, snapshot rollback)
  * runs against both the real engine and a trivial in-memory model; after
  * EVERY step the MOR read must equal the model exactly. This is the
  * interaction coverage individual specs cannot give — e.g. an upsert
  * keyed through a renamed column against rows that a compaction just
  * rewrote under tombstones a maintenance pass then folded away. */
class WorkloadModelSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("40 random mixed operations never diverge from the model (seed 7)") {
    val rnd = new Random(7)
    val catalog = LocalCatalog(Files.createTempDirectory("graft-wl").toString)
    val s = spark
    import s.implicits._

    // model: id -> payload; the table's value column name evolves
    var model = Map.empty[Long, Long]
    var nextId = 1L
    var valueCol = "val0"
    var renames = 0
    // (tag, snapshotId, model-at-tag) saved since the last rollback —
    // rollback targets must be ancestors of the current snapshot, and
    // every tag taken since the last rollback is on the current chain
    var saved = List.empty[(String, Long, Map[Long, Long])]
    var tags = 0

    def freshRows(n: Int): Seq[(Long, Long)] = {
      val rows = (0 until n).map { _ =>
        val id = nextId; nextId += 1
        id -> rnd.nextLong(1000000)
      }
      rows
    }

    val initial = freshRows(20)
    IceWrite.create(spark, catalog, "wl",
      initial.toDF("id", valueCol), targetFileSizeBytes = 4096)
    model ++= initial

    def check(step: String): Unit = {
      val got = IceRead.table(spark, catalog, "wl")
        .select(col("id"), col(valueCol))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == model, s"divergence after $step: " +
        s"missing=${(model.keySet -- got.keySet).take(5)} " +
        s"extra=${(got.keySet -- model.keySet).take(5)}")
    }
    check("create")

    var rollbacks = 0
    for (step <- 1 to 40) {
      rnd.nextInt(14) match {
        case 0 | 1 | 2 => // append fresh rows
          val rows = freshRows(1 + rnd.nextInt(10))
          IceWrite.append(spark, catalog, "wl", rows.toDF("id", valueCol))
          model ++= rows
          check(s"$step:append")
        case 3 | 4 | 5 => // upsert: update some existing + insert some new
          val existing = rnd.shuffle(model.keySet.toSeq).take(rnd.nextInt(5))
            .map(id => id -> rnd.nextLong(1000000))
          val inserted = freshRows(rnd.nextInt(4))
          val batch = existing ++ inserted
          if (batch.nonEmpty) {
            IceWrite.upsert(spark, catalog, "wl", batch.toDF("id", valueCol), keys = Seq("id"))
            model ++= batch
          }
          check(s"$step:upsert")
        case 6 | 7 => // deleteWhere a random id band
          if (model.nonEmpty) {
            val ids = model.keySet.toSeq.sorted
            val lo = ids(rnd.nextInt(ids.size))
            val hi = lo + rnd.nextInt(8)
            IceWrite.deleteWhere(spark, catalog, "wl", col("id").between(lo, hi))
            model = model.filterNot { case (id, _) => id >= lo && id <= hi }
          }
          check(s"$step:deleteWhere")
        case 8 | 9 => // full compaction (never changes content)
          new Compaction(catalog, "wl", spark,
            config = FullCompactionConfig(PlanningParams(
              maxInputParallelism = 4, maxOutputParallelism = 2)),
            enableValidate = true,
            cleanupDanglingDeletes = rnd.nextBoolean()).compact()
          check(s"$step:compact")
        case 10 => // rename the value column (metadata-only)
          val next = s"val${renames + 1}"; renames += 1
          SchemaEvolution.renameColumn(catalog, "wl", valueCol, next)
          valueCol = next
          check(s"$step:rename->$next")
        case 11 => // maintenance (never changes content)
          Maintenance.rewritePositionDeletes(spark, catalog, "wl")
          Maintenance.expireSnapshots(catalog, "wl", keepLast = 3)
          check(s"$step:maintenance")
        case 12 => // tag the current state (a rollback target; expiry-pinned)
          val tag = s"wl-tag-$tags"; tags += 1
          val snap = catalog.loadTable("wl").currentSnapshotId.get
          IceWrite.createTag(catalog, "wl", tag, snap)
          saved ::= ((tag, snap, model))
          check(s"$step:tag->$tag")
        case 13 => // rollback to a random tagged ancestor; model rewinds too
          if (saved.nonEmpty) {
            val (tag, snap, m) = saved(rnd.nextInt(saved.size))
            IceWrite.rollbackTo(catalog, "wl", snap)
            model = m
            rollbacks += 1
            // only tags taken from here on are guaranteed ancestors now
            saved = Nil
            check(s"$step:rollback->$tag")
          }
      }
    }
    assert(model.nonEmpty)
    // the seed must actually exercise the time-travel ops
    assert(tags > 0 && rollbacks > 0,
      s"seed walked past the tag/rollback cases (tags=$tags rollbacks=$rollbacks)")
  }
}
