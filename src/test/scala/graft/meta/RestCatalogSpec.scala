package graft.meta

import java.nio.file.Files
import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Protocol-level contract of the REST catalog: CAS over HTTP, 409 ->
  * CommitConflictException, create/exists/drop round trips, independent
  * clients observing each other's commits. */
class RestCatalogSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var server: RestCatalog.Server = _
  private def client() = new RestCatalog.Client(server.uri)

  override def beforeAll(): Unit =
    server = new RestCatalog.Server(Files.createTempDirectory("graft-rest-wh").toString)
  override def afterAll(): Unit = server.stop()

  private def meta(name: String) = TableMetadata(name = name, location = "")

  test("create assigns version 1 and a warehouse location; double create conflicts") {
    val c = client()
    val m = c.createTable(meta("t_create"))
    assert(m.version == 1)
    assert(m.location == graft.meta.MetaIO.join(server.warehouse, "t_create"))
    assert(Files.isDirectory(java.nio.file.Paths.get(c.dataDir("t_create"))))
    assert(c.tableExists("t_create"))
    intercept[IllegalArgumentException](c.createTable(meta("t_create")))
  }

  test("listTables enumerates both catalog kinds, sorted, excluding dropped") {
    val c = client()
    c.createTable(meta("t_list_b")); c.createTable(meta("t_list_a"))
    c.createTable(meta("t_list_gone")); c.dropTable("t_list_gone")
    val rest = c.listTables.filter(_.startsWith("t_list_"))
    assert(rest == Seq("t_list_a", "t_list_b"))

    val local = LocalCatalog(Files.createTempDirectory("list-wh").toString)
    local.createTable(meta("zz")); local.createTable(meta("aa"))
    local.createTable(meta("mm")); local.dropTable("mm")
    assert(local.listTables == Seq("aa", "zz"))
  }

  test("load of a missing table fails; exists is false; drop is idempotent") {
    val c = client()
    assert(!c.tableExists("t_nope"))
    intercept[IllegalArgumentException](c.loadTable("t_nope"))
    c.dropTable("t_nope") // no error
  }

  test("commit CAS: stale base raises CommitConflictException; reload + retry wins") {
    val c = client()
    val base = c.createTable(meta("t_cas"))
    val v2 = c.commit(base, base.copy(lastSequenceNumber = 10L))
    assert(v2.version == 2 && v2.lastSequenceNumber == 10L)
    // committing against the stale base must 409
    intercept[CommitConflictException](c.commit(base, base.copy(lastSequenceNumber = 99L)))
    // the standard loop: reload, reapply, commit
    val fresh = c.loadTable("t_cas")
    val v3 = c.commit(fresh, fresh.copy(lastSequenceNumber = 11L))
    assert(v3.version == 3 && v3.lastSequenceNumber == 11L)
  }

  test("independent clients see each other's commits (server is the store)") {
    val a = client(); val b = client()
    val m = a.createTable(meta("t_two"))
    a.commit(m, m.copy(lastSequenceNumber = 7L))
    val seen = b.loadTable("t_two")
    assert(seen.version == 2 && seen.lastSequenceNumber == 7L)
  }

  test("hammered concurrent commits serialize: every version wins exactly once") {
    val c = client()
    c.createTable(meta("t_race"))
    val pool = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    val futs = (1 to 8).map { _ =>
      Future {
        var done = false
        var retries = 0
        while (!done && retries < 50) {
          val m = c.loadTable("t_race")
          try { c.commit(m, m.copy(lastSequenceNumber = m.lastSequenceNumber + 1)); done = true }
          catch { case _: CommitConflictException => retries += 1 }
        }
        done
      }
    }
    val results = Await.result(Future.sequence(futs), 60.seconds)
    pool.shutdown()
    assert(results.forall(identity))
    val end = c.loadTable("t_race")
    assert(end.version == 9) // 1 (create) + 8 serialized commits
    assert(end.lastSequenceNumber == 8L) // no lost update
  }

  test("metadata survives the JSON round trip (snapshots, manifest, refs)") {
    val c = client()
    val m = c.createTable(meta("t_json"))
    val snap = Snapshot(snapshotId = 1L, parentId = None, sequenceNumber = 1L,
      timestampMs = 42L, manifest = Seq(FileEntry(
        "/x/data-0.parquet", 123L, FileContent.Data, 10L, sequenceNumber = 1L,
        equalityIds = Seq("id"), partitionValues = Map("p" -> "1"),
        columnStats = Map("id" -> ("1", "10")))),
      summary = Map("operation" -> "append"))
    val committed = c.commit(m, m.copy(
      snapshots = Seq(snap), currentSnapshotId = Some(1L),
      refs = Map("main" -> 1L, "audit" -> 1L), lastSequenceNumber = 1L))
    val back = c.loadTable("t_json")
    assert(back == committed)
    assert(back.currentSnapshot.get.manifest.head.columnStats("id") == ("1", "10"))
    assert(back.refs == Map("main" -> 1L, "audit" -> 1L))
  }

  test("rename: metadata-only, version continues, both clients observe, drop reclaims data") {
    val c = client()
    val m1 = c.createTable(meta("rn_a"))
    val m2 = c.commit(m1, m1.copy(properties = m1.properties + ("k" -> "v")))
    assert(m2.version == 2)
    val renamed = c.renameTable("rn_a", "rn_b")
    assert(renamed.name == "rn_b" && renamed.version == 3,
      "the version counter must continue across the rename (no CAS reuse)")
    assert(renamed.location == m1.location, "rename is metadata-only: location stays")
    assert(renamed.stableUuid == m1.stableUuid)
    assert(!c.tableExists("rn_a") && c.tableExists("rn_b"))
    // an independent client sees the rename, and commits CAS on the
    // renamed entry exactly as before
    val c2 = client()
    val live = c2.loadTable("rn_b")
    assert(live.properties.get("k").contains("v"), "history survives the rename")
    val m4 = c2.commit(live, live.copy(properties = live.properties + ("k2" -> "w")))
    assert(m4.version == 4)
    // refusals mirror the local catalog's
    intercept[IllegalArgumentException](c.renameTable("rn_missing", "x"))
    c.createTable(meta("rn_c"))
    intercept[IllegalArgumentException](c.renameTable("rn_c", "rn_b"))
    // drop of a renamed entry reclaims the ORIGINAL location's data dir
    val origRoot = m1.location
    assert(MetaIO.exists(origRoot))
    c.dropTable("rn_b")
    assert(!MetaIO.exists(origRoot), "drop must reclaim the renamed entry's data root")
  }

  test("commits travel as O(change) deltas and apply server-side, removals included") {
    val c = client()
    def entry(i: Int) = FileEntry(s"/x/f$i.parquet", i.toLong, FileContent.Data, 1L, 1L)
    val big = Snapshot(1L, None, 1L, 1L, (0 until 500).map(entry),
      Map("operation" -> "append"))
    val m1 = c.commit(c.createTable(meta("t_delta")),
      c.loadTable("t_delta").copy(snapshots = Seq(big),
        currentSnapshotId = Some(1L), refs = Map("main" -> 1L), lastSequenceNumber = 1L))

    // a 1-file append: the client wire body must be the delta form (tiny),
    // and the server must resolve it against its stored copy exactly
    val s2 = Snapshot(2L, Some(1L), 2L, 2L, big.manifest :+ entry(9999),
      Map("operation" -> "append"))
    val want = m1.copy(snapshots = m1.snapshots :+ s2,
      currentSnapshotId = Some(2L), refs = Map("main" -> 2L), lastSequenceNumber = 2L)
    val deltaBody = MetadataJson.writeDelta(m1, want.copy(version = m1.version))
    assert(deltaBody.nonEmpty, "the append evolution must be delta-expressible")
    assert(deltaBody.get.length * 20 < MetadataJson.write(want).length,
      "the delta wire body should be tiny next to full metadata")
    val m2 = c.commit(m1, want)
    assert(c.loadTable("t_delta") == m2)
    assert(m2.currentSnapshot.get.manifest.size == 501)

    // snapshot REMOVAL (expiry) also rides the delta
    val m3 = c.commit(m2, m2.copy(snapshots = m2.snapshots.filter(_.snapshotId == 2L)))
    assert(c.loadTable("t_delta").snapshots.map(_.snapshotId) == Seq(2L))
    assert(c.loadTable("t_delta").currentSnapshot.get.manifest.size == 501)
  }
}

/** The full compaction E2E suite against the REST catalog — the
  * two-implementation proof that Compaction/Maintenance/IceRead only ever
  * needed the [[Catalog]] contract. */
class RestCompactionE2ESpec extends graft.compaction.CompactionE2ESpec with BeforeAndAfterAll {
  private var server: RestCatalog.Server = _
  override def beforeAll(): Unit =
    server = new RestCatalog.Server(Files.createTempDirectory("graft-rest-wh").toString)
  override def afterAll(): Unit = server.stop()
  override protected def newCatalog(): Catalog = new RestCatalog.Client(server.uri)
}

/** The full write-path suite (create/append/upsert/branch/concurrent CAS
  * retry) against the REST catalog. */
class RestIceWriteSpec extends IceWriteSpec with BeforeAndAfterAll {
  private var server: RestCatalog.Server = _
  override def beforeAll(): Unit =
    server = new RestCatalog.Server(Files.createTempDirectory("graft-rest-wh").toString)
  override def afterAll(): Unit = server.stop()
  override protected def newCatalog(): Catalog = new RestCatalog.Client(server.uri)
}
