package graft.meta

import java.net.URI
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.apache.hadoop.fs.{FileSystem, Path}

import graft.SparkTestBase
import graft.testkit.{FsOpRecorder, MockS3FileSystem}

/** The storage-seam contract under OBJECT-STORE semantics, without
  * docker: a mock Hadoop filesystem ([[graft.testkit.MockS3FileSystem]])
  * strips exactly the properties S3 strips (no exclusive create, no
  * atomic dest-checked rename), mirroring the reference's MinIO/S3
  * integration surface (integration-tests/testdata/docker-compose.yaml:
  * 22-62, CATALOG_IO__IMPL=S3FileIO).
  *
  * Contract proven here:
  *  1. the mock store really cannot express the version-file CAS — two
  *     interleaved exclusive-create protocols BOTH succeed (lost update);
  *  2. [[LocalCatalog]] therefore refuses object-store warehouses;
  *  3. [[RestCatalog]] (server-side CAS) stays exactly-once for
  *     concurrent committers even with every table file on the mock
  *     object store.
  */
class ObjectStoreContractSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.mocks3.impl", classOf[MockS3FileSystem].getName)
    hc.set("fs.AbstractFileSystem.mocks3.impl", classOf[graft.testkit.MockS3Afs].getName)
    hc.set("fs.countfs.impl", classOf[graft.testkit.CountingLocalFileSystem].getName)
    hc.set("fs.AbstractFileSystem.countfs.impl", classOf[graft.testkit.CountingLocalAfs].getName)
  }

  private def mockDir(prefix: String): String =
    "mocks3://" + Files.createTempDirectory(prefix).toString

  test("the mock store cannot express an exclusive create: interleaved writers both 'win'") {
    FsOpRecorder.reset()
    val dir = mockDir("s3sem")
    val fs = FileSystem.get(new URI("mocks3:///"), spark.sparkContext.hadoopConfiguration)
    val target = new Path(dir, "v2.metadata.json")

    // writer A and writer B each run the exclusive-create protocol
    // (check absent -> publish); the interleaving is executed inline, so
    // the demonstration is deterministic, not a race that might pass
    assert(!fs.exists(target)) // A's absence check
    assert(!fs.exists(target)) // B's absence check — both see "absent"
    def publish(tag: String): Boolean = {
      val tmp = new Path(dir, s".tmp-$tag")
      val out = fs.create(tmp, false)
      try out.write(tag.getBytes(StandardCharsets.UTF_8)) finally out.close()
      fs.rename(tmp, target)
    }
    assert(publish("commit-A")) // A publishes "its" version 2
    assert(publish("commit-B")) // B ALSO succeeds: A's commit is silently lost
    val content = scala.io.Source.fromInputStream(fs.open(target)).mkString
    assert(content == "commit-B")

    // and create(overwrite = false) itself is not exclusive either
    val direct = new Path(dir, "direct")
    fs.create(direct, false).close()
    fs.create(direct, false).close() // no FileAlreadyExistsException: a PUT
  }

  test("LocalCatalog refuses object-store warehouses up front") {
    val e1 = intercept[IllegalArgumentException](new LocalCatalog(mockDir("refuse")))
    assert(e1.getMessage.contains("RestCatalog"))
    // real-world schemes refused by URI parse alone — no s3a jars needed
    intercept[IllegalArgumentException](new LocalCatalog("s3a://bucket/warehouse"))
    intercept[IllegalArgumentException](new LocalCatalog("oss://bucket/warehouse"))
    // stores that DO provide atomic create-no-overwrite (ADLS Gen2
    // hierarchical namespace, Azure Blob If-None-Match, GCS generation
    // precondition) pass the guard — the refusal keys on exclusive-create
    // semantics, not on rename semantics
    assert(!MetaIO.lacksExclusiveCreate("abfss://c@a.dfs.core.windows.net/wh"))
    assert(!MetaIO.lacksExclusiveCreate("gs://bucket/warehouse"))
    assert(!MetaIO.lacksExclusiveCreate("wasbs://c@a.blob.core.windows.net/wh"))
    // ...while still being rename-inverting object stores elsewhere
    assert(MetaIO.isObjectStore("abfss://c@a.dfs.core.windows.net/wh"))
    assert(MetaIO.isObjectStore("gs://bucket/warehouse"))
    // non-object-store schemes stay in contract
    new LocalCatalog(Files.createTempDirectory("posix-wh").toString)
  }

  test("RestCatalog over the mock object store: concurrent commits stay exactly-once") {
    val server = new RestCatalog.Server(mockDir("rest-wh"))
    try {
      val bootstrap = new RestCatalog.Client(server.uri)
      val src = spark.read.parquet(s"$sf/region.parquet")
      IceWrite.create(spark, bootstrap, "t_s3race", src)
      // Hadoop Path renders an empty authority as a single slash
      assert(bootstrap.loadTable("t_s3race").location.startsWith("mocks3:/"))

      // 4 independent clients append concurrently; each IceWrite.append
      // retries its CAS on 409. Every parquet byte lands on mocks3://.
      val pool = Executors.newFixedThreadPool(4)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val futures = (1 to 4).map { i =>
        Future {
          val c = new RestCatalog.Client(server.uri)
          IceWrite.append(spark, c, "t_s3race",
            src.select(org.apache.spark.sql.functions.col("r_regionkey")
              .plus(i * 100).as("r_regionkey"),
              org.apache.spark.sql.functions.col("r_name")))
        }
      }
      Await.result(Future.sequence(futures), 120.seconds)
      pool.shutdown()

      val meta = bootstrap.loadTable("t_s3race")
      // exactly-once: create + 4 appends, none lost, none doubled
      assert(meta.snapshots.size == 5)
      assert(meta.version == 5)
      val rows = IceRead.table(spark, bootstrap, "t_s3race")
      assert(rows.count() == 25)
      meta.currentSnapshot.get.manifest.foreach { f =>
        assert(f.path.startsWith("mocks3:/"), f.path)
      }
    } finally server.stop()
  }

  /** The reference's MinIO end-to-end (integration-tests/src/
    * integration_tests.rs:38-579) run against the mock store: a
    * fragmented MOR table built entirely on mocks3:// (6 data files +
    * position deletes + equality deletes), compacted through the FULL
    * pipeline — plan -> MOR rewrite -> CAS commit via RestCatalog ->
    * validator — with every metadata and parquet byte on object-store
    * semantics. Closes the gap between "commit contract proven" and
    * "pipeline proven". */
  test("full compaction pipeline over the mock object store (plan -> rewrite -> commit -> validate)") {
    import org.apache.spark.sql.functions._
    import graft.compaction.Compaction
    import graft.selection.{FullCompactionConfig, PlanningParams}
    val server = new RestCatalog.Server(mockDir("rest-e2e"))
    try {
      val cat = new RestCatalog.Client(server.uri)
      val src = spark.read.parquet(s"$sf/lineitem.parquet")
        .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"),
          col("l_extendedprice"), col("l_returnflag"))

      // fragment: 6 appends of disjoint orderkey slices
      IceWrite.create(spark, cat, "t_s3e2e", src.filter(col("l_orderkey") % 6 === 0))
      (1 to 5).foreach { i =>
        IceWrite.append(spark, cat, "t_s3e2e", src.filter(col("l_orderkey") % 6 === i))
      }
      // equality deletes: kill every row of 10 order keys
      IceWrite.appendEqualityDeletes(spark, cat, "t_s3e2e",
        src.filter(col("l_orderkey") <= 35).select(col("l_orderkey")).distinct(),
        Seq("l_orderkey"))
      // position deletes: first 5 positions of one data file
      val someData = cat.loadTable("t_s3e2e").currentSnapshot.get.manifest
        .filter(_.content == FileContent.Data).head
      import spark.implicits._
      IceWrite.appendPositionDeletes(spark, cat, "t_s3e2e",
        (0L until 5L).map(p => (someData.path, p)).toDF("file_path", "pos"))

      val before = cat.loadTable("t_s3e2e").currentSnapshot.get
      assert(before.manifest.count(_.content == FileContent.Data) == 6)
      assert(before.manifest.exists(_.content == FileContent.PositionDeletes))
      assert(before.manifest.exists(_.content == FileContent.EqualityDeletes))
      before.manifest.foreach(f => assert(f.path.startsWith("mocks3:/"), f.path))
      val wantRows = IceRead.table(spark, cat, "t_s3e2e")
        .collect().map(_.toSeq).toSeq.sortBy(_.toString)

      // the full pipeline, validator on: compact() throws on any mismatch
      val result = new Compaction(cat, "t_s3e2e", spark,
        config = FullCompactionConfig(PlanningParams(
          targetFileSizeBytes = 512L * 1024 * 1024,
          maxInputParallelism = 8, maxOutputParallelism = 2)),
        enableValidate = true, cleanupDanglingDeletes = true).compact()
      assert(result.addedFiles.nonEmpty)
      result.addedFiles.foreach(f => assert(f.path.startsWith("mocks3:/"),
        s"rewrite output must land on the object store: ${f.path}"))

      val after = cat.loadTable("t_s3e2e").currentSnapshot.get
      assert(after.manifest.count(_.content == FileContent.Data) < 6)
      assert(after.manifest.forall(_.content == FileContent.Data),
        "compaction must fold every delete file into the rewrite")
      val gotRows = IceRead.table(spark, cat, "t_s3e2e")
        .collect().map(_.toSeq).toSeq.sortBy(_.toString)
      assert(gotRows == wantRows, "MOR view must be invariant under compaction")
    } finally server.stop()
  }

  test("metadata load chain is O(anchors + deltas) round trips, independent of tracked files") {
    val whDir = Files.createTempDirectory("count-wh").toString
    val wh = "countfs://" + whDir
    val cat = new LocalCatalog(wh) // countfs keeps posix semantics: in contract
    // a snapshot tracking MANY files: round trips must not scale with it
    val entries = (1 to 5000).map { i =>
      FileEntry(f"$wh/t_ops/data/f$i%05d.parquet", 1000L + i,
        FileContent.Data, 10L, sequenceNumber = 1L)
    }
    cat.createTable(TableMetadata(name = "t_ops", location = s"$wh/t_ops",
      schema = SchemaField.fromNames(Seq("a", "b")),
      currentSnapshotId = Some(1L), refs = Map("main" -> 1L),
      snapshots = Seq(Snapshot(1L, None, 1L, 1L, entries)), lastSequenceNumber = 1L))
    // grow a delta chain: 20 more commits (anchorEvery=16 -> one anchor inside)
    (1 to 20).foreach { i =>
      val m = cat.loadTable("t_ops")
      cat.commit(m, m.copy(properties = m.properties + ("touch" -> i.toString)))
    }

    // a FRESH catalog instance (cold cache) loads the current version
    val fresh = new LocalCatalog(wh)
    FsOpRecorder.reset()
    val loaded = fresh.loadTable("t_ops")
    val opens = FsOpRecorder.count("open")
    val statuses = FsOpRecorder.count("getFileStatus")
    assert(loaded.version == 21)
    assert(loaded.currentSnapshot.get.manifest.size == 5000)
    // chain: hint + anchor v16 + deltas v17..v21 + roll-forward probe =
    // ~7 opens; give slack but stay orders below the 5000 tracked files
    assert(opens <= 15, s"load chain opened $opens files (ops=${FsOpRecorder.snapshot})")
    assert(statuses <= 40, s"load chain stat'd $statuses times")

    // injected latency makes the bound observable as wall-clock: with
    // 2 ms per FS op a file-count-proportional chain would take >10 s
    val fresh2 = new LocalCatalog(wh)
    FsOpRecorder.reset()
    FsOpRecorder.latencyMs = 2L
    val t0 = System.nanoTime()
    fresh2.loadTable("t_ops")
    val elapsedMs = (System.nanoTime() - t0) / 1000000L
    FsOpRecorder.latencyMs = 0L
    assert(elapsedMs < 2000, s"latency-injected load took ${elapsedMs}ms")
  }
}
