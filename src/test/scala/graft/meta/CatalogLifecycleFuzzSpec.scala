package graft.meta

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Property fuzz over the catalog LIFECYCLE surface — create / rename /
  * drop / stale-name drop / create-over-renamed-root — the op class
  * where both r9's and r10's data-loss findings lived (rename markers,
  * stale-name drops). A driver-side model tracks every live table's
  * expected row count; after EVERY op, every live table must still read
  * its exact rows (no op may destroy another entry's data), stale-name
  * drops must be no-ops, and creates over a renamed entry's retained
  * root must refuse. Runs the same script against [[LocalCatalog]] and
  * [[RestCatalog]] (the two Catalog impls share the contract). */
class CatalogLifecycleFuzzSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def script(cat: Catalog, seed: Long, supportsRename: Boolean): Unit = {
    val rnd = new scala.util.Random(seed)
    // model: live name -> (row count, marker id baked into the rows)
    var live = Map.empty[String, (Long, Long)]
    // names that EVER existed and were renamed away or dropped — the
    // stale-drop and recreate probes draw from these
    var retired = Set.empty[String]
    var nextId = 0L

    def verifyAll(): Unit = live.foreach { case (n, (rows, id)) =>
      val df = IceRead.table(spark, cat, n)
      assert(df.count() == rows, s"table $n lost rows")
      assert(df.filter(col("mark") =!= id).isEmpty,
        s"table $n carries another table's rows")
    }

    (1 to 60).foreach { _ =>
      rnd.nextInt(6) match {
        case 0 => // create a fresh table
          val n = s"t$nextId"; val id = nextId; nextId += 1
          val rows = 5L + rnd.nextInt(20)
          IceWrite.create(spark, cat, n,
            (1L to rows).map(i => (i, id)).toDF("k", "mark"))
          live += n -> (rows, id)
        case 1 if supportsRename && live.nonEmpty => // rename a live table
          val from = live.keys.toSeq(rnd.nextInt(live.size))
          val to = s"t$nextId"; nextId += 1
          cat.renameTable(from, to)
          live += to -> live(from); live -= from
          retired += from
        case 2 if live.nonEmpty => // drop a live table
          val n = live.keys.toSeq(rnd.nextInt(live.size))
          cat.dropTable(n)
          live -= n; retired += n
        case 3 if retired.nonEmpty => // STALE drop: must destroy nothing
          val n = retired.toSeq(rnd.nextInt(retired.size))
          if (!live.contains(n)) cat.dropTable(n)
        case 4 if retired.nonEmpty => // recreate a retired name
          val n = retired.toSeq(rnd.nextInt(retired.size))
          if (!live.contains(n)) {
            val id = nextId; nextId += 1
            val rows = 3L + rnd.nextInt(10)
            try {
              IceWrite.create(spark, cat, n,
                (1L to rows).map(i => (i, id)).toDF("k", "mark"))
              live += n -> (rows, id)
            } catch {
              // a name whose root still holds a RENAMED table's data must
              // refuse — that refusal IS the data-loss guard
              case e: Exception =>
                assert(e.getMessage.contains("renamed"),
                  s"recreate of $n failed for the wrong reason: ${e.getMessage}")
            }
          }
        case 5 if live.nonEmpty => // PROPERTY churn must never move rows
          val n = live.keys.toSeq(rnd.nextInt(live.size))
          // reserved engine-state keys refuse at every user door (the
          // shared guard the doors call) — forging identity, stats
          // retirement, or ANALYZE provenance is never property churn
          val reserved = Seq("graft.table-uuid", "graft.stats.retired-names",
            "graft.bloom.k.paths", "ndv.sketch.path")(rnd.nextInt(4))
          intercept[IllegalArgumentException](
            SchemaEvolution.requireUnreservedProps(Seq(reserved)))
          // legal churn through the engine API is metadata-only: the
          // per-op model sweep below proves reads stay exact under it
          SchemaEvolution.updateProperties(cat, n,
            Map(s"fuzz.k${rnd.nextInt(3)}" -> rnd.nextInt(100).toString),
            removes = Set(s"fuzz.k${rnd.nextInt(3)}"))
        case _ => ()
      }
      verifyAll()
    }
    assert(live.nonEmpty, "fuzz degenerated: nothing ever lived")
  }

  test("LocalCatalog lifecycle fuzz: no op destroys another entry's data") {
    for (seed <- Seq(1L, 2L)) {
      val cat = LocalCatalog(Files.createTempDirectory(s"lcfz$seed").toString)
      script(cat, seed, supportsRename = true)
    }
  }

  test("RestCatalog lifecycle fuzz: no op destroys another entry's data") {
    val srv = new RestCatalog.Server(
      Files.createTempDirectory("rcfz").toString)
    try script(new RestCatalog.Client(srv.uri), 3L, supportsRename = true)
    finally srv.stop()
  }
}
