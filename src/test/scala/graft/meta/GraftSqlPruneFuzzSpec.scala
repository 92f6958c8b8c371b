package graft.meta

import java.nio.file.Files

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.exec.GraftScan

/** The two round-6 subsystems COMPOSED under randomness: DML sequences
  * through the SQL front door on a PARTITIONED table, interleaved with
  * random predicate reads that are (a) row-compared against a
  * hand-evaluated Scala-collection model — a wrong SKIP is silent row
  * loss and shows up here — and (b) plan-asserted through
  * [[GraftScan.pruneStats]] so the reads demonstrably go through the
  * pruning file index and actually skip files over the run.
  * GraftSqlFuzzSpec model-checks DML alone; PruneFuzzSpec model-checks
  * skipping alone; this spec is the seam between them. */
class GraftSqlPruneFuzzSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  /** model row: (k, g, v, s) */
  private type R = (Long, Int, Double, String)

  private def runSeed(seed: Long, nOps: Int, formatVersion: Int = 2): Unit = {
    val rnd = new Random(seed)
    val cat = LocalCatalog(Files.createTempDirectory(s"graft-pfuzz-$seed").toString)
    GraftSql.register(s"pf$seed", cat)
    val t = s"pf$seed.t"
    // identity partition on g: every write fans out per partition, every
    // read prunes by partition constants + zone maps on k/v/s. On v3 the
    // SAME DML routes through deletion vectors (DELETE) and the
    // one-snapshot DV+copies UPDATE — the model must not notice.
    spark.sql(s"CREATE TABLE $t (k BIGINT, g INT, v DOUBLE, s STRING) " +
      "PARTITIONED BY (g) " +
      s"TBLPROPERTIES ('format-version' = '$formatVersion')")
    var model = Vector.empty[R]
    var nextK = 0L
    var readsChecked = 0
    var readsPruned = 0

    def freshRow(): R = {
      val r = (nextK, rnd.nextInt(4), rnd.nextInt(40) * 0.25, s"s${rnd.nextInt(10)}")
      nextK += 1
      r
    }
    def lit(r: R) = s"(${r._1}, ${r._2}, CAST(${r._3} AS DOUBLE), '${r._4}')"

    /** a random predicate as (SQL text, hand evaluator). */
    def predicate(): (String, R => Boolean) = rnd.nextInt(6) match {
      case 0 => val c = rnd.nextInt(4); (s"g = $c", _._2 == c)
      case 1 => val x = rnd.nextLong(math.max(1L, nextK)); (s"k <= $x", _._1 <= x)
      case 2 => val x = rnd.nextLong(math.max(1L, nextK)); (s"k > $x", _._1 > x)
      case 3 => val x = rnd.nextInt(40) * 0.25; (s"v >= CAST($x AS DOUBLE)", _._3 >= x)
      case 4 => val c = rnd.nextInt(10); (s"s = 's$c'", _._4 == s"s$c")
      case _ =>
        val c = rnd.nextInt(4); val x = rnd.nextLong(math.max(1L, nextK))
        (s"g = $c AND k <= $x", r => r._2 == c && r._1 <= x)
    }

    def checkRead(at: String): Unit = {
      val (sql, eval) = predicate()
      val df = spark.sql(s"SELECT k, g, v, s FROM $t WHERE $sql ORDER BY k, g, v, s")
      val got = df.collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getString(3))).toVector
      val want = model.filter(eval).sortBy(r => (r._1, r._2, r._3, r._4))
      assert(got == want,
        s"divergence after $at on [$sql]:\n  spark=$got\n  model=$want")
      if (want.nonEmpty) {
        // a non-empty read must plan through the pruning index (an EMPTY
        // result may legally collapse to AQE's EmptyRelation, erasing the
        // scan node); track actual skips across the run
        val (total, kept) = GraftScan.pruneStats(df)
        assert(total > 0, s"no GraftFileIndex in plan at $at:\n" +
          df.queryExecution.executedPlan)
        assert(kept <= total)
        readsChecked += 1
        if (kept < total) readsPruned += 1
      }
    }

    for (op <- 1 to nOps) {
      val what = rnd.nextInt(100) match {
        case x if x < 45 => // INSERT a small batch
          val rows = Vector.fill(1 + rnd.nextInt(3))(freshRow())
          spark.sql(s"INSERT INTO $t VALUES ${rows.map(lit).mkString(", ")}")
          model = model ++ rows
          s"INSERT ${rows.length}"

        case x if x < 60 => // DELETE by partition or key stride
          if (rnd.nextBoolean()) {
            val g = rnd.nextInt(4)
            spark.sql(s"DELETE FROM $t WHERE g = $g")
            model = model.filterNot(_._2 == g)
            s"DELETE g=$g"
          } else {
            val m = 2 + rnd.nextInt(4); val r0 = rnd.nextInt(m)
            spark.sql(s"DELETE FROM $t WHERE k % $m = $r0")
            model = model.filterNot(r => r._1 % m == r0)
            s"DELETE k%$m=$r0"
          }

        case x if x < 75 => // UPDATE under a partition predicate
          val g = rnd.nextInt(4); val c = rnd.nextInt(5)
          spark.sql(s"UPDATE $t SET v = v + $c WHERE g = $g")
          model = model.map(r => if (r._2 == g) (r._1, r._2, r._3 + c, r._4) else r)
          s"UPDATE g=$g +$c"

        case x if x < 90 => // dynamic partition OVERWRITE
          val rows = Vector.fill(1 + rnd.nextInt(3))(freshRow())
          spark.sql(s"INSERT OVERWRITE $t VALUES ${rows.map(lit).mkString(", ")}")
          val replaced = rows.map(_._2).toSet
          model = model.filterNot(r => replaced.contains(r._2)) ++ rows
          s"OVERWRITE ${rows.length}"

        case _ => // compaction (changes file layout, never content)
          if (model.nonEmpty) spark.sql(s"CALL pf$seed.system.rewrite_data_files('t')")
          "COMPACT"
      }
      if (op % 3 == 0 || op == nOps) checkRead(s"op $op ($what)")
    }
    assert(readsChecked > 5, s"too few checked reads: $readsChecked")
    assert(readsPruned > 0,
      s"no read ever skipped a file over $readsChecked checked reads — " +
        "the pruning arm of this spec is vacuous")
    if (formatVersion >= 3) {
      // the whole random history preserved v3 invariants: every live row
      // has a distinct _row_id, new position deletes are DVs only
      val ids = IceRead.tableWithRowIds(spark, cat, "t")
        .select("_row_id").collect().map(_.getLong(0))
      assert(ids.length == model.length && ids.distinct.length == ids.length,
        s"row-id invariant broke: ${ids.length} ids, ${ids.distinct.length} distinct, " +
          s"${model.length} model rows")
      assert(cat.loadTable("t").snapshots.flatMap(_.manifest)
        .filter(_.content == FileContent.PositionDeletes).forall(_.isDeletionVector),
        "a v3 history must never contain plain parquet position deletes")
    }
  }

  test("front-door DML x pruned reads match the model (seed 101)") {
    runSeed(101L, 40)
  }

  test("front-door DML x pruned reads match the model (seed 202)") {
    runSeed(202L, 40)
  }

  test("front-door DML x pruned reads on a FORMAT-V3 table (seed 303): DV routing + lineage") {
    runSeed(303L, 40, formatVersion = 3)
  }
}
