package graft.meta

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The Hadoop FileSystem storage seam: byte round-trips, ranged reads,
  * the exclusive-create CAS, listings, and path canonicalization — the
  * primitives every metadata module now builds on. */
class MetaIOSpec extends AnyFunSuite {

  SparkTestBase.spark // default FS config comes from the session

  private def tmp() = Files.createTempDirectory("metaio").toString

  test("write/read round trip, plain and file://-qualified spellings") {
    val dir = tmp()
    val p = MetaIO.join(dir, "a", "b.txt")
    MetaIO.writeString(p, "hello")
    assert(MetaIO.readString(p) == "hello")
    assert(MetaIO.size(p) == 5L)
    // the SAME file through an explicit file:// spelling
    assert(MetaIO.readString(s"file://$p") == "hello")
    MetaIO.writeString(s"file://$p", "rewritten")
    assert(MetaIO.readString(p) == "rewritten")
  }

  test("readRange is a positioned slice") {
    val p = MetaIO.join(tmp(), "r.bin")
    MetaIO.write(p, (0 until 100).map(_.toByte).toArray)
    assert(MetaIO.readRange(p, 10, 5).toSeq == Seq[Byte](10, 11, 12, 13, 14))
  }

  test("createExclusive: first writer wins, losers see false — under concurrency") {
    val p = MetaIO.join(tmp(), "v1.json")
    import scala.concurrent.{Await, Future, ExecutionContext}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    val wins = Await.result(Future.sequence((1 to 8).map(i => Future {
      MetaIO.createExclusive(p, s"writer-$i".getBytes)
    })), 30.seconds)
    assert(wins.count(identity) == 1, s"exactly one CAS winner, got $wins")
    assert(MetaIO.readString(p).startsWith("writer-"))
  }

  test("writeAtomicReplace lands whole values and leaves no temp files") {
    val dir = tmp()
    val p = MetaIO.join(dir, "ck")
    MetaIO.writeAtomicReplace(p, "1".getBytes)
    assert(MetaIO.readString(p) == "1")
    // repeated replaces: last value wins, nothing accumulates
    (2 to 20).foreach(i => MetaIO.writeAtomicReplace(p, i.toString.getBytes))
    assert(MetaIO.readString(p) == "20")
    assert(MetaIO.listFiles(dir).map(f => MetaIO.fileName(f._1)) == Seq("ck"),
      "temp files must not survive the rename")
  }

  test("normalize collapses // and /. to one canonical spelling") {
    assert(MetaIO.normalize("/a//b/./c.parquet") == "/a/b/c.parquet")
    assert(MetaIO.normalize("/a/b/c.parquet") == "/a/b/c.parquet")
  }

  test("recursive listing returns plain stored paths with sizes and mtimes") {
    val dir = tmp()
    MetaIO.writeString(MetaIO.join(dir, "x", "f1.parquet"), "1111")
    MetaIO.writeString(MetaIO.join(dir, "f2.parquet"), "22")
    val got = MetaIO.listFilesRecursive(dir)
    assert(got.map(f => (MetaIO.fileName(f._1), f._2)).toSet ==
      Set(("f1.parquet", 4L), ("f2.parquet", 2L)))
    assert(got.forall(f => !f._1.startsWith("file:")), "local listings stay plain")
    assert(got.forall(_._3 > 0L))
    assert(MetaIO.listFilesRecursive(MetaIO.join(dir, "missing")).isEmpty)
  }
}

/** The whole table stack driven through a `file://`-QUALIFIED warehouse —
  * the deployment shape where the warehouse location carries an explicit
  * filesystem scheme (s3a://, hdfs://) and every metadata/data path flows
  * through the Hadoop seam end to end: create, append, MOR deletes,
  * compaction, DVs, maintenance. */
class QualifiedWarehouseSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.001"

  test("create/append/delete/compact/GC over a file://-schemed warehouse") {
    import org.apache.spark.sql.functions._
    val catalog = LocalCatalog("file://" + Files.createTempDirectory("qual-wh").toString)
    val src = spark.read.parquet(s"$sf/customer.parquet")

    IceWrite.create(spark, catalog, "t_q", src)
    IceWrite.append(spark, catalog, "t_q", src.withColumn("c_custkey", col("c_custkey") + 1000))
    IceWrite.appendEqualityDeletes(spark, catalog, "t_q",
      src.filter(col("c_custkey") <= 10).select(col("c_custkey")), Seq("c_custkey"))
    IceWrite.deleteWhere(spark, catalog, "t_q", col("c_custkey") === 20L)

    val expect = 2 * src.count() -
      src.filter(col("c_custkey") <= 10).count() -
      src.filter(col("c_custkey") === 20L).count()
    assert(IceRead.table(spark, catalog, "t_q").count() == expect)

    // v3 DV path through the same qualified location
    val meta3 = catalog.loadTable("t_q")
    IceWrite.deleteWhereDv(spark, catalog, "t_q", col("c_custkey") === 21L)
    assert(IceRead.table(spark, catalog, "t_q").count() == expect - 1)
    assert(catalog.loadTable("t_q").version == meta3.version + 1)

    // compaction folds the deletes in; the MOR view is unchanged
    new graft.compaction.Compaction(catalog, "t_q", spark).compact()
    assert(IceRead.table(spark, catalog, "t_q").count() == expect - 1)

    // maintenance reclaims the replaced inputs through the same seam
    graft.compaction.Maintenance.expireSnapshots(catalog, "t_q", keepLast = 1)
    val orphans = graft.compaction.Maintenance.orphanFiles(catalog, "t_q", olderThanMs = 0L)
    assert(orphans.nonEmpty, "replaced files become orphans after expiry")
    assert(graft.compaction.Maintenance.deleteOrphans(
      catalog, "t_q", orphans, olderThanMs = 0L) == orphans.size)
    assert(IceRead.table(spark, catalog, "t_q").count() == expect - 1)
  }
}
