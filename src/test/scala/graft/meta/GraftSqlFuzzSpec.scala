package graft.meta

import java.nio.file.Files

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Randomized DML sequences through the SQL front door, mirrored
  * against an independent Scala-collection model (NOT Spark — the model
  * evaluates predicates and MERGE clause semantics by hand, so a shared
  * bug can't cancel out). Each op commits a real snapshot; the table is
  * re-read through `spark.sql` and compared row-for-row every few ops.
  *
  * MERGE-with-duplicate-target-keys semantics under the equality-delete
  * commit: ALL rows of a touched key vanish and one updated copy per
  * (target row, source row) pair lands — the model replays exactly that.
  */
class GraftSqlFuzzSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  /** model row: (k, g, v, s) */
  private type R = (Long, Int, Double, String)

  private def check(name: String, model: Vector[R], at: String): Unit = {
    val got = spark.sql(s"SELECT k, g, v, s FROM $name ORDER BY k, g, v, s")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getString(3)))
      .toVector
    val want = model.sortBy(r => (r._1, r._2, r._3, r._4))
    assert(got == want, s"divergence after $at:\n  spark=$got\n  model=$want")
  }

  private def runSeed(seed: Long, nOps: Int): Seq[String] = {
    val opLog = Seq.newBuilder[String]
    val rnd = new Random(seed)
    val cat = LocalCatalog(Files.createTempDirectory(s"graft-fuzz-$seed").toString)
    GraftSql.register(s"fz$seed", cat)
    val t = s"fz$seed.t"
    spark.sql(s"CREATE TABLE $t (k BIGINT, g INT, v DOUBLE, s STRING)")
    var model = Vector.empty[R]
    var nextK = 0L

    def freshRow(): R = {
      val r = (nextK, rnd.nextInt(4), rnd.nextInt(40) * 0.25, s"s${rnd.nextInt(10)}")
      nextK += 1
      r
    }
    def lit(r: R) = s"(${r._1}, ${r._2}, CAST(${r._3} AS DOUBLE), '${r._4}')"

    for (op <- 1 to nOps) {
      val what = rnd.nextInt(100) match {
        case x if x < 30 => // INSERT a small batch (fresh + occasional dup key)
          val fresh = Vector.fill(1 + rnd.nextInt(3))(freshRow())
          val dups = if (model.nonEmpty && rnd.nextBoolean())
            Vector(model(rnd.nextInt(model.length)) match {
              case (k, g, _, _) => (k, g, rnd.nextInt(40) * 0.25, s"d${rnd.nextInt(5)}")
            })
          else Vector.empty
          val rows = fresh ++ dups
          spark.sql(s"INSERT INTO $t VALUES ${rows.map(lit).mkString(", ")}")
          model = model ++ rows
          s"INSERT ${rows.length}"

        case x if x < 45 => // DELETE by group or key stride
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

        case x if x < 65 => // UPDATE arithmetic + string op under a predicate
          val g = rnd.nextInt(4); val c = rnd.nextInt(5)
          spark.sql(s"UPDATE $t SET v = v + $c, s = upper(s) WHERE g = $g")
          model = model.map(r =>
            if (r._2 == g) (r._1, r._2, r._3 + c, r._4.toUpperCase) else r)
          s"UPDATE g=$g +$c"

        case x if x < 85 => // MERGE: update-or-delete matched, insert rest
          val existing = rnd.shuffle(model.map(_._1).distinct)
            .take(rnd.nextInt(3)).toVector
          val incoming = Vector.fill(1 + rnd.nextInt(2))(freshRow()) ++
            existing.map(k => (k, rnd.nextInt(4), rnd.nextInt(40) * 0.25,
              s"m${rnd.nextInt(5)}"))
          val srcName = s"fuzz_src_$seed"
          // distinct keys required by merge; incoming construction guarantees it
          spark.sql(s"SELECT * FROM (VALUES ${incoming.map(lit).mkString(", ")}) " +
            s"AS v(k, g, v, s)").createOrReplaceTempView(srcName)
          spark.sql(
            s"""MERGE INTO $t AS t USING $srcName AS s ON t.k = s.k
               |WHEN MATCHED AND s.g = 0 THEN DELETE
               |WHEN MATCHED THEN UPDATE SET v = s.v, s = s.s
               |WHEN NOT MATCHED AND s.g < 3 THEN INSERT *""".stripMargin)
          val src = incoming.map(r => r._1 -> r).toMap
          val targetKeys = model.map(_._1).toSet
          model = model.flatMap { r =>
            src.get(r._1) match {
              case Some(srow) =>
                if (srow._2 == 0) None // matched-delete wins (clause order)
                else Some((r._1, r._2, srow._3, srow._4)) // update keeps t.g
              case None => Some(r)
            }
          } ++ incoming.filter(r => !targetKeys.contains(r._1) && r._2 < 3)
          s"MERGE ${incoming.length}"

        case x if x < 92 => // INSERT OVERWRITE: full or dynamic by spec
          val rows = Vector.fill(1 + rnd.nextInt(3))(freshRow())
          spark.sql(s"INSERT OVERWRITE $t VALUES ${rows.map(lit).mkString(", ")}")
          // unpartitioned = atomic full replace; partitioned = DYNAMIC
          // overwrite (only the partitions present in the incoming rows
          // are replaced) — the model applies the live spec's transform
          val spec = cat.loadTable("t").partitionSpec
          model = spec.headOption match {
            case None => rows
            case Some(p) =>
              def pkey(g: Int): Int = p.transform match {
                case "identity" => g
                case "truncate[2]" => g - Math.floorMod(g, 2)
                case other => sys.error(s"fuzz spec drift: $other")
              }
              val replaced = rows.map(r => pkey(r._2)).toSet
              model.filterNot(r => replaced.contains(pkey(r._2))) ++ rows
          }
          s"OVERWRITE ${rows.length} (spec=${spec.map(_.transform).mkString})"

        case x if x < 96 => // partition-spec evolution (content-invariant)
          val spec = cat.loadTable("t").partitionSpec
          val stmt = spec.headOption match {
            case None => s"ALTER TABLE $t ADD PARTITION FIELD g"
            case Some(PartitionField("g", "identity")) =>
              s"ALTER TABLE $t REPLACE PARTITION FIELD g WITH truncate(2, g)"
            case Some(PartitionField("g", "truncate[2]")) =>
              s"ALTER TABLE $t DROP PARTITION FIELD truncate(2, g)"
            case other => sys.error(s"fuzz spec drift: $other")
          }
          spark.sql(stmt)
          // compact so every live file records values under the NEW spec
          // (value-keyed partition ops refuse marker-bearing/value-less
          // files) — the evolve-then-compact sequence every real migration
          // runs. Keyed on live DATA FILES, not the model: a table emptied
          // by DELETE still holds tombstoned files lacking the new value.
          val hasData = cat.loadTable("t").currentSnapshot
            .exists(_.manifest.exists(_.content == FileContent.Data))
          if (hasData) spark.sql(s"CALL fz$seed.system.rewrite_data_files('t')")
          s"SPEC ${stmt.replace(s"ALTER TABLE $t ", "")}"

        case _ => // TRUNCATE
          spark.sql(s"TRUNCATE TABLE $t")
          model = Vector.empty
          "TRUNCATE"
      }
      opLog += what
      if (op % 5 == 0 || op == nOps) check(t, model, s"op $op ($what)")
    }
    opLog.result()
  }

  test("random DML sequences match the hand-evaluated model (seed 42)") {
    runSeed(42L, 40)
  }

  test("random DML sequences match the hand-evaluated model (seed 7)") {
    runSeed(7L, 40)
  }

  test("DML under live partition-spec evolution matches the model (seed 13)") {
    val ops = runSeed(13L, 60)
    // the evolve-then-compact op and a dynamic (partitioned) overwrite
    // must both actually fire for this seed to pin anything
    assert(ops.count(_.startsWith("SPEC")) >= 2, s"spec ops missing: $ops")
    assert(ops.exists(o => o.startsWith("OVERWRITE") && !o.endsWith("(spec=)")),
      s"no partitioned overwrite fired: $ops")
  }
}
