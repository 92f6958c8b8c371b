package graft.meta

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** The metadata JSON codec is the on-disk format — write(read(x)) must be
  * the identity for arbitrary metadata: typed and untyped schemas,
  * branches, snapshots, partition values, equality field ids, zone maps. */
class JsonPropertySpec extends AnyFunSuite {

  private def samples[T](gen: Gen[T], n: Int = 100): Seq[T] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val nameGen = Gen.alphaLowerStr.map(s => "c" + s.take(6))
  private val fieldGen: Gen[SchemaField] = for {
    id <- Gen.chooseNum(1, 50)
    name <- nameGen
    t <- Gen.oneOf("", "BIGINT", "STRING", "DOUBLE", "ARRAY<FLOAT>")
    nullable <- Gen.oneOf(true, false)
    dflt <- Gen.option(Gen.oneOf("42", "'unknown'", "0.5"))
  } yield SchemaField(id, name, t, nullable, dflt)

  private def shortListOf[T](max: Int, g: Gen[T]): Gen[List[T]] =
    Gen.chooseNum(0, max).flatMap(n => Gen.listOfN(n, g))

  private val fileGen: Gen[FileEntry] = for {
    path <- nameGen.map("/w/" + _)
    len <- Gen.chooseNum(1L, 1L << 40)
    content <- Gen.oneOf(FileContent.Data, FileContent.PositionDeletes, FileContent.EqualityDeletes)
    rows <- Gen.chooseNum(0L, 1L << 30)
    seq <- Gen.chooseNum(0L, 100L)
    eqIds <- shortListOf(3, nameGen)
    eqFids <- shortListOf(3, Gen.chooseNum(1, 50))
    parts <- shortListOf(2, Gen.zip(nameGen, Gen.oneOf("1", "2", "a b", "x=y"))).map(_.toMap)
    stats <- shortListOf(3, Gen.zip(nameGen,
      Gen.zip(Gen.chooseNum(-1000, 1000).map(_.toString), Gen.chooseNum(1000, 9999).map(_.toString)))).map(_.toMap)
    nulls <- shortListOf(3, Gen.zip(nameGen, Gen.chooseNum(0L, 1L << 30))).map(_.toMap)
    nameMatched <- Gen.oneOf(true, false)
    firstRowId <- Gen.option(Gen.chooseNum(0L, 1L << 40))
    specId <- Gen.oneOf(0, 0, 0, 2, 7) // mostly current-spec, some imported
  } yield FileEntry(path, len, content, rows, seq, eqIds, eqFids, parts, Nil, stats,
    nullCounts = nulls, nameMatched = nameMatched, firstRowId = firstRowId,
    specId = specId)

  private val snapGen: Gen[Snapshot] = for {
    id <- Gen.chooseNum(1L, 99L)
    parent <- Gen.option(Gen.chooseNum(1L, 99L))
    seq <- Gen.chooseNum(1L, 99L)
    ts <- Gen.chooseNum(0L, 1L << 45)
    manifest <- shortListOf(6, fileGen)
    summary <- shortListOf(3, Gen.zip(nameGen, nameGen)).map(_.toMap)
  } yield Snapshot(id, parent, seq, ts, manifest, summary)

  private val metaGen: Gen[TableMetadata] = for {
    name <- nameGen
    fv <- Gen.oneOf(1, 2, 3)
    schema <- shortListOf(6, fieldGen)
    pspec <- shortListOf(2, Gen.zip(nameGen, Gen.oneOf("identity", "bucket[4]"))
      .map { case (c, t) => PartitionField(c, t) })
    sort <- shortListOf(2, Gen.zip(nameGen, Gen.oneOf(true, false), Gen.oneOf(true, false))
      .map { case (c, a, nf) => SortField(c, a, nf) })
    cur <- Gen.option(Gen.chooseNum(1L, 99L))
    refs <- shortListOf(3, Gen.zip(nameGen, Gen.chooseNum(1L, 99L))).map(_.toMap)
    snaps <- shortListOf(4, snapGen)
    lastSeq <- Gen.chooseNum(0L, 999L)
    v <- Gen.chooseNum(1, 50)
    lastCol <- Gen.chooseNum(0, 60)
    tags <- shortListOf(3, Gen.zip(nameGen, Gen.chooseNum(1L, 99L))).map(_.toMap)
    props <- shortListOf(4, Gen.zip(nameGen, Gen.alphaNumStr.map(_.take(12)))).map(_.toMap)
    nextRow <- Gen.chooseNum(0L, 1L << 40)
  } yield TableMetadata(name, s"/w/$name", fv, schema, pspec, sort, cur, refs,
    snaps, lastSeq, v, lastCol, tags, props, nextRowId = nextRow)

  test("metadata JSON write/read is the identity on arbitrary metadata") {
    for (meta <- samples(metaGen)) {
      val back = MetadataJson.read(MetadataJson.write(meta))
      assert(back == meta, s"round-trip mismatch for $meta")
    }
  }

  test("append chains delta-encode manifests: O(change) metadata, lossless") {
    // 40 snapshots, each appending one file to a 200-file base — the
    // commit pattern that makes full-manifest metadata O(snapshots x
    // files). Deltas must kick in, shrink the JSON by an order of
    // magnitude, and round-trip exactly.
    def entry(i: Int) = FileEntry(s"/w/data/f$i.parquet", 1000L + i,
      FileContent.Data, 10L, i.toLong)
    val base = (0 until 200).map(entry)
    var manifest = base
    val snaps = (1 to 40).map { i =>
      manifest = manifest :+ entry(1000 + i)
      Snapshot(i.toLong, if (i == 1) None else Some(i - 1L), i.toLong, i.toLong * 1000,
        manifest, Map("operation" -> "append"))
    }
    val meta = TableMetadata("t", "/w/t", 2, SchemaField.fromNames(Seq("a")),
      snapshots = snaps, currentSnapshotId = Some(40L), lastSequenceNumber = 40L)

    val json = MetadataJson.write(meta)
    assert(MetadataJson.read(json) == meta)
    assert(json.contains("manifest-delta"))

    // size comparison vs the full encoding (simulated by breaking chains)
    val unchained = meta.copy(snapshots = meta.snapshots.map(_.copy(parentId = None)))
    val fullJson = MetadataJson.write(unchained)
    assert(!fullJson.contains("manifest-delta"))
    assert(json.length < fullJson.length / 10,
      s"delta ${json.length} B vs full ${fullJson.length} B — expected >10x shrink")

    // a rewrite (remove + add + replace) also deltas and round-trips
    val rewritten = manifest.take(100).map(f => f.copy(sequenceNumber = 99L)) ++
      Seq(entry(5000))
    val withRewrite = meta.copy(snapshots = snaps :+ Snapshot(41L, Some(40L), 41L,
      41000L, rewritten, Map("operation" -> "replace")))
    assert(MetadataJson.read(MetadataJson.write(withRewrite)) == withRewrite)
  }

  test("cross-version delta write/read is the identity on arbitrary evolutions") {
    // arbitrary base metadata evolved by: dropping a random subset of
    // snapshots, appending fresh ones (parent-linked or not), and
    // mutating every scalar field — readDelta(writeDelta(base, updated),
    // base) must reproduce `updated` exactly
    val rnd = new scala.util.Random(7)
    var checked = 0
    for (base0 <- samples(metaGen, 60)) {
      // unique snapshot ids (the delta keys removals/appends by id)
      val seen = scala.collection.mutable.Set.empty[Long]
      val base = base0.copy(snapshots = base0.snapshots.filter(s => seen.add(s.snapshotId)))
      val kept = base.snapshots.filter(_ => rnd.nextBoolean())
      val appended = (1 to rnd.nextInt(3)).map { k =>
        Snapshot(1000L + k, kept.lastOption.map(_.snapshotId), 500L + k,
          k * 1000L, kept.lastOption.map(_.manifest).getOrElse(Nil) :+
            FileEntry(s"/w/new$k.parquet", k.toLong, FileContent.Data, 1L, 500L + k),
          Map("operation" -> "append"))
      }
      val updated = base.copy(
        snapshots = kept ++ appended,
        version = base.version + 1,
        currentSnapshotId = appended.lastOption.map(_.snapshotId).orElse(base.currentSnapshotId),
        lastSequenceNumber = base.lastSequenceNumber + 1,
        properties = base.properties + ("touched" -> "yes"),
        refs = base.refs + ("main" -> 1L),
        nextRowId = base.nextRowId + 5)
      MetadataJson.writeDelta(base, updated) match {
        case Some(text) =>
          assert(MetadataJson.isDelta(text))
          assert(MetadataJson.deltaBaseVersion(text) == base.version)
          val back = MetadataJson.readDelta(text, base)
          assert(back == updated, s"delta round-trip mismatch\nbase=$base\nupdated=$updated")
          checked += 1
        case None => fail(s"delta refused for a pure add/remove evolution: $base")
      }
    }
    assert(checked >= 50)
  }

  test("delta with a new snapshot chained on a REMOVED parent still decodes") {
    // expire + append composed into ONE commit, where the appended
    // snapshot's parentId points at an expired snapshot: the writer must
    // not delta the new manifest against a base the reader won't have
    // (that file would be undecodable on disk — a bricked table)
    def entry(i: Int) = FileEntry(s"/w/f$i.parquet", i.toLong, FileContent.Data, 1L, 1L)
    val s1 = Snapshot(1L, None, 1L, 1L, (0 until 50).map(entry), Map("operation" -> "append"))
    val s2 = Snapshot(2L, Some(1L), 2L, 2L, s1.manifest :+ entry(100), Map("operation" -> "append"))
    val base = TableMetadata("t", "/w/t", 2, SchemaField.fromNames(Seq("a")),
      snapshots = Seq(s1, s2), currentSnapshotId = Some(2L), lastSequenceNumber = 2L,
      version = 3)
    // drop s2 (the would-be delta base) AND append s3 whose parent is s2
    val s3 = Snapshot(3L, Some(2L), 3L, 3L, s2.manifest :+ entry(200), Map("operation" -> "append"))
    val updated = base.copy(snapshots = Seq(s1, s3), version = 4,
      currentSnapshotId = Some(3L), lastSequenceNumber = 3L)
    val text = MetadataJson.writeDelta(base, updated)
      .getOrElse(fail("pure add/remove must stay delta-expressible"))
    val back = MetadataJson.readDelta(text, base)
    assert(back == updated, "reader must reconstruct the exact updated metadata")
  }

  test("cross-version delta refuses a mutated carried snapshot (falls back to full)") {
    val base0 = samples(metaGen, 20).find(_.snapshots.nonEmpty).get
    val seen = scala.collection.mutable.Set.empty[Long]
    val base = base0.copy(snapshots = base0.snapshots.filter(s => seen.add(s.snapshotId)))
    // in-place mutation of an existing snapshot's manifest: NOT expressible
    // as a snapshot-level delta — writeDelta must return None
    val mutated = base.copy(version = base.version + 1,
      snapshots = base.snapshots.map(s =>
        s.copy(manifest = s.manifest :+ FileEntry("/w/sneak.parquet", 1L,
          FileContent.Data, 1L, 1L))))
    assert(MetadataJson.writeDelta(base, mutated).isEmpty)
  }
}
