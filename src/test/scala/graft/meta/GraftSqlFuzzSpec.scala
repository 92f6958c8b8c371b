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

  private def runSeed(seed: Long, nOps: Int): Unit = {
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

        case x if x < 92 => // INSERT OVERWRITE: full replace
          val rows = Vector.fill(1 + rnd.nextInt(3))(freshRow())
          spark.sql(s"INSERT OVERWRITE $t VALUES ${rows.map(lit).mkString(", ")}")
          model = rows
          s"OVERWRITE ${rows.length}"

        case _ => // TRUNCATE
          spark.sql(s"TRUNCATE TABLE $t")
          model = Vector.empty
          "TRUNCATE"
      }
      if (op % 5 == 0 || op == nOps) check(t, model, s"op $op ($what)")
    }
  }

  test("random DML sequences match the hand-evaluated model (seed 42)") {
    runSeed(42L, 40)
  }

  test("random DML sequences match the hand-evaluated model (seed 7)") {
    runSeed(7L, 40)
  }
}
