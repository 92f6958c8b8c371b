package graft.meta

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Metadata at manifest scale: gzip'd version files (magic-sniffed, mixed
  * chains read transparently), delta-encoded commits staying O(change) on
  * a 50k-file table, and driver-side planning over the big manifest. */
class ManifestScaleSpec extends AnyFunSuite {

  private def entry(i: Int, seq: Long = 1L, content: FileContent.Value = FileContent.Data) =
    FileEntry(
      path = f"/warehouse/t/data/part-$i%06d.parquet", length = 128L * 1024 * 1024,
      content = content, recordCount = 1000000L, sequenceNumber = seq,
      partitionValues = Map("ds" -> f"2026-01-${i % 28 + 1}%02d"),
      columnStats = Map("id" -> (s"${i * 1000L}", s"${i * 1000L + 999}")))

  private def bigMeta(name: String, n: Int): (TableMetadata, Snapshot) = {
    val manifest = (0 until n).map(entry(_))
    val snap = Snapshot(snapshotId = 1L, parentId = None, sequenceNumber = 1L,
      timestampMs = 1L, manifest = manifest, summary = Map("operation" -> "append"))
    (TableMetadata(name = name, location = "",
      schema = Seq(SchemaField(1, "id", "BIGINT"), SchemaField(2, "ds", "STRING")),
      lastColumnId = 2, partitionSpec = Seq(PartitionField("ds")),
      currentSnapshotId = Some(1L), refs = Map("main" -> 1L),
      snapshots = Seq(snap), lastSequenceNumber = 1L), snap)
  }

  test("50k-file manifest: gzip shrinks the version file >3x; loads round-trip") {
    val wh = Files.createTempDirectory("scale-wh")
    val gz = new LocalCatalog(wh.toString, gzipMetadataAtBytes = 0L)
    val plain = new LocalCatalog(Files.createTempDirectory("scale-wh-p").toString,
      gzipMetadataAtBytes = Long.MaxValue)

    val (meta, _) = bigMeta("big", 50000)
    val t0 = System.nanoTime()
    gz.createTable(meta); plain.createTable(meta)
    val gzBytes = Files.size(wh.resolve("big/metadata/v1.metadata.json"))
    val plainBytes = Files.size(
      Paths.get(plain.warehouse.toString, "big/metadata/v1.metadata.json"))
    assert(gzBytes * 3 < plainBytes,
      s"gzip bought < 3x: $gzBytes vs $plainBytes")

    val loaded = gz.loadTable("big")
    assert(loaded.currentSnapshot.get.manifest.size == 50000)
    // normalize per-catalog identity (location, the stable table-uuid
    // each createTable mints) before comparing; compare the cheap header
    // first so a mismatch never asks scalatest to prettify 50k entries
    def norm(m: TableMetadata) =
      m.copy(location = "", properties = m.properties - TableMetadata.UuidKey)
    val loadedP = plain.loadTable("big")
    assert(norm(loaded).copy(snapshots = Nil) == norm(loadedP).copy(snapshots = Nil))
    val snapshotsEqual = norm(loaded).snapshots == norm(loadedP).snapshots
    assert(snapshotsEqual, "gzip and plain catalogs must round-trip identical snapshots")
    info(s"50k entries: write+load x2 in ${(System.nanoTime() - t0) / 1000000} ms; " +
      s"gz=$gzBytes plain=$plainBytes")
  }

  test("delta encoding keeps a 1-file append O(change) on a 50k-file table") {
    val wh = Files.createTempDirectory("scale-wh2")
    val cat = new LocalCatalog(wh.toString, gzipMetadataAtBytes = Long.MaxValue)
    val (meta, snap) = bigMeta("delta", 50000)
    val created = cat.createTable(meta)
    val newSnap = Snapshot(snapshotId = 2L, parentId = Some(1L), sequenceNumber = 2L,
      timestampMs = 2L, manifest = snap.manifest :+ entry(999999, seq = 2L),
      summary = Map("operation" -> "append"))
    cat.commit(created, created.copy(currentSnapshotId = Some(2L),
      refs = Map("main" -> 2L), snapshots = created.snapshots :+ newSnap,
      lastSequenceNumber = 2L))
    val v1 = Files.size(wh.resolve("delta/metadata/v1.metadata.json"))
    val v2 = Files.size(wh.resolve("delta/metadata/v2.metadata.json"))
    // v2 holds v1's full manifest ONCE plus a delta for snapshot 2 — if the
    // delta encoding broke, v2 would carry the 50k manifest twice
    assert(v2 < (v1 * 3) / 2, s"append version not delta-encoded: v1=$v1 v2=$v2")
    val re = cat.loadTable("delta")
    assert(re.currentSnapshot.get.manifest.size == 50001)
    // driver-side planning over the big manifest stays sub-second-ish;
    // correctness: partition-scoped delete applies to its partition only
    val t0 = System.nanoTime()
    val tasks = re.scanTasks(re.currentSnapshot.get)
    info(s"scanTasks over 50001 files in ${(System.nanoTime() - t0) / 1000000} ms")
    assert(tasks.size == 50001 && tasks.forall(_.deletes.isEmpty))
  }

  test("million-entry manifest: write/load/plan round-trip, delta commit O(change)") {
    // the 100 TB shape: ~1M tracked files (100 TB / 128 MB targets). The
    // point is that metadata handling stays driver-tractable — load and
    // scan planning in seconds, and an incremental commit priced by the
    // CHANGE (snapshot 2's version file reuses snapshot 1's manifest via
    // the delta codec instead of re-inlining a second million entries).
    val wh = Files.createTempDirectory("scale-wh1m")
    val cat = new LocalCatalog(wh.toString, gzipMetadataAtBytes = 0L)
    val n = 1000000
    val (meta, snap) = bigMeta("m1m", n)

    val tW = System.nanoTime()
    val created = cat.createTable(meta)
    val writeMs = (System.nanoTime() - tW) / 1000000
    val v1 = Files.size(wh.resolve("m1m/metadata/v1.metadata.json"))

    // cold load: a FRESH catalog instance (no decoded cache) pays the
    // full anchor parse; the original instance's warm load is O(1)
    val tL = System.nanoTime()
    val loaded = new LocalCatalog(wh.toString, gzipMetadataAtBytes = 0L).loadTable("m1m")
    val loadMs = (System.nanoTime() - tL) / 1000000
    assert(loaded.currentSnapshot.get.manifest.size == n)
    val tWm = System.nanoTime()
    assert(cat.loadTable("m1m").currentSnapshot.get.manifest.size == n)
    val warmMs = (System.nanoTime() - tWm) / 1000000
    assert(warmMs < 1000, s"warm load should be cache-fast, took ${warmMs}ms")

    val tP = System.nanoTime()
    val tasks = loaded.scanTasks(loaded.currentSnapshot.get)
    val planMs = (System.nanoTime() - tP) / 1000000
    assert(tasks.size == n)

    // 1-file append on the million-entry table
    val newSnap = Snapshot(snapshotId = 2L, parentId = Some(1L), sequenceNumber = 2L,
      timestampMs = 2L, manifest = snap.manifest :+ entry(9999999, seq = 2L),
      summary = Map("operation" -> "append"))
    val tC = System.nanoTime()
    cat.commit(created, created.copy(currentSnapshotId = Some(2L),
      refs = Map("main" -> 2L), snapshots = created.snapshots :+ newSnap,
      lastSequenceNumber = 2L))
    val commitMs = (System.nanoTime() - tC) / 1000000
    val v2 = Files.size(wh.resolve("m1m/metadata/v2.metadata.json"))
    assert(v2 < (v1 * 3) / 2, s"append version not delta-encoded: v1=$v1 v2=$v2")
    assert(cat.loadTable("m1m").currentSnapshot.get.manifest.size == n + 1)

    info(s"1M entries: write=${writeMs}ms coldLoad=${loadMs}ms warmLoad=${warmMs}ms " +
      s"plan=${planMs}ms deltaCommit=${commitMs}ms " +
      s"v1=${v1 / 1024 / 1024}MiB v2=${v2 / 1024}KiB")
    // loose ceilings — catch quadratic regressions, not machine noise
    assert(loadMs < 60000 && planMs < 60000 && commitMs < 120000)
  }

  test("100k-entry Iceberg export + import round-trips in bounded time with stats intact") {
    // the interop path at migration scale: exporting 100k manifest
    // entries (avro manifests + list + metadata JSON) and importing them
    // back is driver-side metadata work — it must stay seconds, not
    // minutes, and preserve the zone maps that make the imported table
    // prunable without footer reads
    val n = 100000
    val whSrc = Files.createTempDirectory("exp-scale-src").toString
    val whDst = Files.createTempDirectory("exp-scale-dst").toString
    val srcCat = new LocalCatalog(whSrc)
    val (meta, _) = bigMeta("t_scale", n)
    srcCat.createTable(meta.copy(location = MetaIO.join(whSrc, "t_scale")))

    val tE = System.nanoTime()
    val jsonPath = IcebergExport.exportIcebergMetadata(srcCat, "t_scale")
    val exportMs = (System.nanoTime() - tE) / 1000000
    val tI = System.nanoTime()
    val back = IcebergImport.importIcebergMetadata(
      new LocalCatalog(whDst), "t_scale_b", jsonPath)
    val importMs = (System.nanoTime() - tI) / 1000000

    assert(back.currentSnapshot.get.manifest.size == n)
    // stats survived: spot-check decoded bounds on both ends of the range
    val byPath = back.currentSnapshot.get.manifest.map(f => f.path -> f).toMap
    for (i <- Seq(0, n / 2, n - 1)) {
      val f = byPath(f"/warehouse/t/data/part-$i%06d.parquet")
      assert(f.columnStats.get("id").contains((s"${i * 1000L}", s"${i * 1000L + 999}")),
        s"entry $i lost its zone map: ${f.columnStats}")
      assert(f.partitionValues("ds") == f"2026-01-${i % 28 + 1}%02d")
    }
    info(s"100k entries: export $exportMs ms, import $importMs ms")
    assert(exportMs < 60000 && importMs < 60000,
      s"metadata-scale interop out of envelope: export $exportMs ms import $importMs ms")
  }

  test("cross-version deltas: commits write O(change) bytes; chains load; anchors bound them") {
    val wh = Files.createTempDirectory("scale-xd")
    // anchorEvery = 4 exercises delta -> anchor -> delta across one test
    val cat = new LocalCatalog(wh.toString, gzipMetadataAtBytes = Long.MaxValue,
      anchorEvery = 4)
    val (meta, snap) = bigMeta("xd", 5000)
    var cur = cat.createTable(meta) // v1: full (anchor)
    val v1 = Files.size(wh.resolve("xd/metadata/v1.metadata.json"))

    // seven 1-file appends -> v2..v8 (v4 and v8 are full anchors)
    for (i <- 2 to 8) {
      val prev = cur.currentSnapshot.get
      val s = Snapshot(snapshotId = i.toLong, parentId = Some(prev.snapshotId),
        sequenceNumber = i.toLong, timestampMs = i.toLong,
        manifest = prev.manifest :+ entry(100000 + i, seq = i.toLong),
        summary = Map("operation" -> "append"))
      cur = cat.commit(cur, cur.copy(currentSnapshotId = Some(i.toLong),
        refs = Map("main" -> i.toLong), snapshots = cur.snapshots :+ s,
        lastSequenceNumber = i.toLong))
    }
    val sizes = (1 to 8).map(v =>
      v -> Files.size(wh.resolve(s"xd/metadata/v$v.metadata.json"))).toMap
    // non-anchor versions are O(change): tiny next to the full anchors
    for (v <- Seq(2, 3, 5, 6, 7))
      assert(sizes(v) * 20 < sizes(1), s"v$v should be a small delta: $sizes")
    for (v <- Seq(4, 8))
      assert(sizes(v) > sizes(1), s"v$v should be a full anchor: $sizes")

    // the loaded head equals the in-memory truth, through a delta chain
    val loaded = cat.loadTable("xd")
    assert(loaded.version == 8 && loaded.currentSnapshot.get.manifest.size == 5007)
    assert(loaded.copy(snapshots = Nil) == cur.copy(snapshots = Nil))
    assert(loaded.snapshots.size == cur.snapshots.size)
    loaded.snapshots.zip(cur.snapshots).foreach { case (a, b) =>
      assert(a.copy(manifest = Nil) == b.copy(manifest = Nil), s"snapshot ${b.snapshotId} header")
      assert(a.manifest == b.manifest, s"snapshot ${b.snapshotId} manifest")
    }

    // snapshot REMOVAL (expiry) round-trips through a delta commit
    val trimmed = cur.copy(snapshots = cur.snapshots.filter(_.snapshotId >= 7L))
    cur = cat.commit(cur, trimmed) // v9: delta with removed-snapshot-ids
    val after = cat.loadTable("xd")
    assert(after.snapshots.map(_.snapshotId) == Seq(7L, 8L))
    assert(after.currentSnapshot.get.manifest.size == 5007)

    // metadata cleanup keeps the retained window's anchor chain loadable
    graft.compaction.Maintenance.cleanMetadataVersions(cat, "xd", keepLast = 2)
    assert(cat.loadTable("xd") == after.copy(version = after.version))
    assert(!Files.exists(wh.resolve("xd/metadata/v1.metadata.json")),
      "pre-anchor history should be reclaimed")
    assert(Files.exists(wh.resolve("xd/metadata/v8.metadata.json")),
      "the retained window's anchor must survive")
  }

  test("mixed plain/gz chains read; CAS conflict intact with gzip on") {
    val wh = Files.createTempDirectory("scale-wh3")
    // threshold between the small v1 and the larger v2 -> v1 plain, v2 gz
    val (m200, _) = bigMeta("mix", 200)
    val probe = MetadataJson.write(m200).length
    val cat = new LocalCatalog(wh.toString, gzipMetadataAtBytes = probe / 2L)
    val (tiny, _) = bigMeta("mix", 1)
    val created = cat.createTable(tiny)
    val raw1 = Files.readAllBytes(wh.resolve("mix/metadata/v1.metadata.json"))
    assert(raw1(0) == '{', "small v1 should be plain JSON")

    val (big, bigSnap) = bigMeta("mix", 200)
    val updated = created.copy(snapshots = Seq(bigSnap.copy(snapshotId = 2L)),
      currentSnapshotId = Some(2L), refs = Map("main" -> 2L))
    cat.commit(created, updated)
    val raw2 = Files.readAllBytes(wh.resolve("mix/metadata/v2.metadata.json"))
    assert((raw2(0) & 0xff) == 0x1f && (raw2(1) & 0xff) == 0x8b, "big v2 should be gzip")
    assert(cat.loadTable("mix").currentSnapshot.get.manifest.size == 200)

    // CAS: a second commit against the same base must conflict
    intercept[CommitConflictException](cat.commit(created, updated))
  }
}
