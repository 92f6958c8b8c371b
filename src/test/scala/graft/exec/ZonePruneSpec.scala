package graft.exec

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.meta.{FileContent, FileEntry}

/** Unit coverage of the conservative file-skipping predicate analysis —
  * every skip decision here must be PROVABLE from the manifest stats;
  * anything uncertain keeps the file (the filter still runs post-scan). */
class ZonePruneSpec extends AnyFunSuite {

  private val UTC = "UTC"
  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("price", DoubleType),
    StructField("grp", StringType),
    StructField("d", DateType),
    StructField("ts", TimestampType),
    StructField("dec", DecimalType(9, 2))))

  private def attr(n: String): AttributeReference = {
    val f = schema.fields.find(_.name == n).get
    AttributeReference(n, f.dataType)()
  }

  private def entry(
      stats: Map[String, (String, String)] = Map.empty,
      nulls: Map[String, Long] = Map.empty,
      parts: Map[String, String] = Map.empty,
      rows: Long = 100L,
      specId: Int = 0): FileEntry =
    FileEntry("/t/f.parquet", 1000L, FileContent.Data, rows, 1L,
      partitionValues = parts, columnStats = stats, nullCounts = nulls, specId = specId)

  private def may(e: Expression, f: FileEntry, idCols: Set[String] = Set.empty): Boolean =
    ZonePrune.mayMatch(e, f, schema, idCols, UTC)

  test("numeric equality prunes outside [min,max], keeps inside and at bounds") {
    val f = entry(stats = Map("id" -> ("10", "20")))
    assert(!may(EqualTo(attr("id"), Literal(9L)), f))
    assert(!may(EqualTo(attr("id"), Literal(21L)), f))
    assert(may(EqualTo(attr("id"), Literal(10L)), f))
    assert(may(EqualTo(attr("id"), Literal(20L)), f))
    assert(may(EqualTo(attr("id"), Literal(15L)), f))
    // flipped literal side
    assert(!may(EqualTo(Literal(9L), attr("id")), f))
  }

  test("range comparisons respect strict vs inclusive bounds, both orientations") {
    val f = entry(stats = Map("id" -> ("10", "20")))
    assert(!may(GreaterThan(attr("id"), Literal(20L)), f))   // id > 20: max == 20
    assert(may(GreaterThanOrEqual(attr("id"), Literal(20L)), f))
    assert(!may(LessThan(attr("id"), Literal(10L)), f))      // id < 10: min == 10
    assert(may(LessThanOrEqual(attr("id"), Literal(10L)), f))
    // flipped: 20 > id means id < 20 -> min 10 qualifies
    assert(may(GreaterThan(Literal(20L), attr("id")), f))
    assert(!may(GreaterThan(Literal(10L), attr("id")), f))   // 10 > id: min == 10
    assert(may(LessThan(Literal(15L), attr("id")), f))       // 15 < id: max 20
    assert(!may(LessThan(Literal(20L), attr("id")), f))
  }

  test("And requires both sides possible; Or either") {
    val f = entry(stats = Map("id" -> ("10", "20")))
    val in = EqualTo(attr("id"), Literal(15L))
    val out = EqualTo(attr("id"), Literal(99L))
    assert(!may(And(in, out), f))
    assert(may(And(in, in), f))
    assert(may(Or(in, out), f))
    assert(!may(Or(out, out), f))
  }

  test("In / InSet prune when every element is outside the zone") {
    val f = entry(stats = Map("id" -> ("10", "20")))
    assert(!may(In(attr("id"), Seq(Literal(1L), Literal(2L))), f))
    assert(may(In(attr("id"), Seq(Literal(1L), Literal(12L))), f))
    assert(!may(InSet(attr("id"), Set[Any](1L, 2L)), f))
    assert(may(InSet(attr("id"), Set[Any](1L, 12L)), f))
  }

  test("IsNull / IsNotNull use null counts; missing counts keep") {
    val noNulls = entry(nulls = Map("id" -> 0L))
    val allNulls = entry(nulls = Map("id" -> 100L), rows = 100L)
    val unknown = entry()
    assert(!may(IsNull(attr("id")), noNulls))
    assert(may(IsNull(attr("id")), allNulls))
    assert(may(IsNull(attr("id")), unknown))
    assert(!may(IsNotNull(attr("id")), allNulls))
    assert(may(IsNotNull(attr("id")), noNulls))
    assert(may(IsNotNull(attr("id")), unknown))
  }

  test("comparison with null literal can always skip; null-safe equality consults null counts") {
    val f = entry(stats = Map("id" -> ("10", "20")), nulls = Map("id" -> 0L))
    assert(!may(EqualTo(attr("id"), Literal(null, LongType)), f))
    assert(!may(EqualNullSafe(attr("id"), Literal(null, LongType)), f)) // zero nulls
    val withNulls = entry(nulls = Map("id" -> 5L))
    assert(may(EqualNullSafe(attr("id"), Literal(null, LongType)), withNulls))
  }

  test("missing or unparsable stats keep the file") {
    assert(may(EqualTo(attr("id"), Literal(999L)), entry()))
    assert(may(EqualTo(attr("id"), Literal(999L)), entry(stats = Map("id" -> ("a", "b")))))
    // NaN literal: undecidable, keep
    assert(may(EqualTo(attr("price"), Literal(Double.NaN)), entry(stats = Map("price" -> ("1.0", "2.0")))))
  }

  test("date and timestamp literals compare in footer encoding (days / micros)") {
    // d in [2024-01-01, 2024-01-31] as epoch days 19723..19753
    val f = entry(stats = Map("d" -> ("19723", "19753"), "ts" -> ("1000000", "2000000")))
    assert(may(EqualTo(attr("d"), Literal(19730, DateType)), f))
    assert(!may(EqualTo(attr("d"), Literal(19800, DateType)), f))
    assert(may(GreaterThan(attr("ts"), Literal(1500000L, TimestampType)), f))
    assert(!may(GreaterThan(attr("ts"), Literal(2000000L, TimestampType)), f))
  }

  test("int-backed decimals compare against UNSCALED footer stats") {
    // dec DECIMAL(9,2) in [123.45, 234.56] -> unscaled [12345, 23456]
    val f = entry(stats = Map("dec" -> ("12345", "23456")))
    def dl(s: String) = Literal(org.apache.spark.sql.types.Decimal(s), DecimalType(9, 2))
    assert(may(EqualTo(attr("dec"), dl("123.45")), f))
    assert(may(EqualTo(attr("dec"), dl("200.00")), f))
    assert(!may(EqualTo(attr("dec"), dl("999.99")), f))
    assert(!may(LessThan(attr("dec"), dl("123.45")), f))
  }

  test("identity-partition constants evaluate arbitrary deterministic predicates exactly") {
    val f = entry(parts = Map("grp" -> "beta"))
    val id = Set("grp")
    assert(may(EqualTo(attr("grp"), Literal(UTF8String.fromString("beta"), StringType)), f, id))
    assert(!may(EqualTo(attr("grp"), Literal(UTF8String.fromString("alpha"), StringType)), f, id))
    assert(may(StartsWith(attr("grp"), Literal(UTF8String.fromString("be"), StringType)), f, id))
    assert(!may(StartsWith(attr("grp"), Literal(UTF8String.fromString("al"), StringType)), f, id))
    // Not is decidable on the exact arm (structural analysis keeps it)
    assert(!may(Not(EqualTo(attr("grp"), Literal(UTF8String.fromString("beta"), StringType))), f, id))
  }

  test("partition-value pruning is disabled for historical-spec files and unlisted columns") {
    val foreign = entry(parts = Map("grp" -> "beta"), specId = 3)
    val pred = EqualTo(attr("grp"), Literal(UTF8String.fromString("alpha"), StringType))
    assert(may(pred, foreign, Set("grp")))      // specId != 0: conservative keep
    assert(may(pred, entry(parts = Map("grp" -> "beta")), Set.empty)) // not declared identity
  }

  test("typed identity-partition values cast through the partition-dir string") {
    val f = entry(parts = Map("d" -> "2024-01-15"))
    val days = 19737 // 2024-01-15 as epoch days
    assert(may(EqualTo(attr("d"), Literal(days, DateType)), f, Set("d")))
    assert(!may(EqualTo(attr("d"), Literal(days + 1, DateType)), f, Set("d")))
    // unparsable dir value for the type: keep
    val bad = entry(parts = Map("d" -> "not-a-date"))
    assert(may(EqualTo(attr("d"), Literal(days, DateType)), bad, Set("d")))
  }

  test("listFiles over 100k entries prunes in bounded driver time") {
    // the 10^6-file story: planning cost is O(files) driver-side decimal
    // compares with zero FS calls — pin it at 100k entries well under a
    // second (generous bound for CI noise; typical ~100ms)
    val entries = (0 until 100000).map { i =>
      FileEntry(s"/t/f$i.parquet", 1000L, FileContent.Data, 100L, 1L,
        partitionValues = Map("grp" -> s"g${i % 50}"),
        columnStats = Map("id" -> ((i * 100L).toString, (i * 100L + 99L).toString)),
        nullCounts = Map("id" -> 0L))
    }
    val idx = new GraftFileIndex(entries, schema, Seq(graft.meta.PartitionField("grp")))
    val pred = And(
      EqualTo(attr("grp"), Literal(UTF8String.fromString("g7"), StringType)),
      And(GreaterThanOrEqual(attr("id"), Literal(500000L)),
        LessThan(attr("id"), Literal(800000L))))
    // best-of-2: the first call JIT-compiles the whole prune path, and on
    // a slow or loaded box that cold pass alone has crossed the bound
    // (1.08-12.4 s observed) while the warmed pass sits at ~100 ms — the
    // assertion pins the algorithmic cost, not compiler warmup
    val samples = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      val dirs = idx.listFiles(Nil, Seq(pred))
      val elapsedMs = (System.nanoTime() - t0) / 1e6
      val kept = dirs.map(_.files.size).sum
      // ids 500000..799999 live in files 5000..7999; grp g7 = every 50th
      assert(kept == 60, s"expected 60 files, kept $kept")
      elapsedMs
    }
    assert(samples.min < 1000.0, s"listFiles took ${samples.min}ms for 100k entries")
  }

  test("bucket transforms prune equality and In on the source column") {
    import graft.meta.PartitionField
    val n = 8
    val spec = Seq(PartitionField("id", s"bucket[$n]"))
    def bucketOf(v: Long): Int =
      graft.functions.IcebergBucket(Literal(v), n)
        .eval(org.apache.spark.sql.catalyst.InternalRow.empty).asInstanceOf[Int]
    val v = 42L
    val fIn = entry(parts = Map("id" -> bucketOf(v).toString))
    val fOut = entry(parts = Map("id" -> ((bucketOf(v) + 1) % n).toString))
    def mayB(e: Expression, f: FileEntry): Boolean =
      ZonePrune.mayMatch(e, f, schema, Set.empty, UTC, spec)
    assert(mayB(EqualTo(attr("id"), Literal(v)), fIn))
    assert(!mayB(EqualTo(attr("id"), Literal(v)), fOut))
    assert(mayB(EqualTo(Literal(v), attr("id")), fIn))
    assert(!mayB(EqualTo(Literal(v), attr("id")), fOut))
    // In keeps a file iff ANY element lands in its bucket
    assert(!mayB(In(attr("id"), Seq(Literal(v))), fOut))
    val other = (1L to 50L).find(x => bucketOf(x) == ((bucketOf(v) + 1) % n)).get
    assert(mayB(In(attr("id"), Seq(Literal(v), Literal(other))), fOut))
    // range predicates never bucket-prune; historical specs keep
    assert(mayB(GreaterThan(attr("id"), Literal(v)), fOut))
    assert(mayB(EqualTo(attr("id"), Literal(v)), fOut.copy(specId = 3)))
    // sparkbucket variant prunes with Spark's murmur3 pmod
    val sspec = Seq(PartitionField("id", s"sparkbucket[$n]"))
    val sb = Pmod(new Murmur3Hash(Seq(Literal(v))), Literal(n))
      .eval(org.apache.spark.sql.catalyst.InternalRow.empty).asInstanceOf[Int]
    val sIn = entry(parts = Map("id" -> sb.toString))
    val sOut = entry(parts = Map("id" -> ((sb + 1) % n).toString))
    def mayS(e: Expression, f: FileEntry): Boolean =
      ZonePrune.mayMatch(e, f, schema, Set.empty, UTC, sspec)
    assert(mayS(EqualTo(attr("id"), Literal(v)), sIn))
    assert(!mayS(EqualTo(attr("id"), Literal(v)), sOut))
  }

  test("string zone maps prune comparisons, In, and prefix predicates") {
    def s(v: String) = Literal(UTF8String.fromString(v), StringType)
    val f = entry(stats = Map("grp" -> ("carrot", "melon")))
    assert(!may(EqualTo(attr("grp"), s("apple")), f))
    assert(!may(EqualTo(attr("grp"), s("zebra")), f))
    assert(may(EqualTo(attr("grp"), s("carrot")), f)) // inclusive bounds
    assert(may(EqualTo(attr("grp"), s("melon")), f))
    assert(may(EqualTo(attr("grp"), s("grape")), f))
    // ranges, both orientations
    assert(!may(GreaterThan(attr("grp"), s("melon")), f))   // grp > 'melon'
    assert(may(GreaterThanOrEqual(attr("grp"), s("melon")), f))
    assert(!may(LessThan(attr("grp"), s("carrot")), f))
    assert(may(LessThan(s("carrot"), attr("grp")), f))      // 'carrot' < grp
    assert(!may(GreaterThan(s("carrot"), attr("grp")), f))  // 'carrot' > grp
    // In
    assert(!may(In(attr("grp"), Seq(s("apple"), s("zzz"))), f))
    assert(may(In(attr("grp"), Seq(s("apple"), s("fig"))), f))
    // prefix: interval [p, increment(p)) vs [min, max]
    assert(may(StartsWith(attr("grp"), s("car")), f))
    assert(may(StartsWith(attr("grp"), s("mel")), f))
    assert(!may(StartsWith(attr("grp"), s("app")), f))  // before min
    assert(!may(StartsWith(attr("grp"), s("zzz")), f))  // after max
    assert(may(StartsWith(attr("grp"), s("")), f))      // empty prefix: everything
    // missing stats keep
    assert(may(StartsWith(attr("grp"), s("zzz")), entry()))
  }

  test("incrementBytes carries over 0xFF and returns None at the top") {
    def u(s: String) = UTF8String.fromString(s)
    assert(ZonePrune.incrementBytes(u("ab")).contains(u("ac")))
    val ff = UTF8String.fromBytes(Array[Byte]('a'.toByte, 0xFF.toByte))
    assert(ZonePrune.incrementBytes(ff).contains(u("b")))
    assert(ZonePrune.incrementBytes(UTF8String.fromBytes(Array[Byte](0xFF.toByte))).isEmpty)
  }

  test("partitionGroups gates: safe types, current spec, decodable values only") {
    import org.apache.spark.sql.catalyst.InternalRow
    def pg(files: Seq[FileEntry], idCols: Set[String]) =
      GraftScan.partitionGroups(files, schema, idCols, UTC)

    val ok = Seq(entry(parts = Map("grp" -> "a")), entry(parts = Map("grp" -> "b")),
      entry(parts = Map("grp" -> "b")))
    val Some((fields, groups)) = pg(ok, Set("grp"))
    assert(fields.map(_.name) == Seq("grp") && fields.forall(_.nullable))
    assert(groups.size == 2 && groups.map(_._2.size).sorted == Seq(1, 2))
    assert(groups.forall { case (row, _) =>
      row.isInstanceOf[InternalRow] && row.getUTF8String(0) != null })

    // date values decode to day ordinals
    val dated = Seq(entry(parts = Map("d" -> "2024-01-15")))
    val Some((_, dg)) = pg(dated, Set("d"))
    assert(dg.head._1.getInt(0) == 19737)

    // gates -> None (flat mode)
    assert(pg(ok, Set("price")).isEmpty, "double type must be unsafe")
    assert(pg(Seq(entry(parts = Map.empty)), Set("grp")).isEmpty, "missing value")
    assert(pg(Seq(entry(parts = Map("grp" -> "a"), specId = 2)), Set("grp")).isEmpty,
      "historical spec")
    assert(pg(Seq(entry(parts = Map("d" -> "not-a-date"))), Set("d")).isEmpty,
      "undecodable value")
    assert(pg(ok, Set("grp", "nope")).isEmpty, "identity col absent from schema")
    assert(pg(ok, Set.empty).isEmpty)
  }

  test("unknown expression shapes keep the file") {
    val f = entry(stats = Map("id" -> ("10", "20")))
    // attr-to-attr comparison: undecidable
    assert(may(EqualTo(attr("id"), attr("price")), f))
    // Not over zone logic (no exact arm): conservative keep even though id=15 possible
    assert(may(Not(EqualTo(attr("id"), Literal(15L))), f))
  }
}
