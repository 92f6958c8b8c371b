package graft.meta

import java.nio.file.Files

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.compaction.Compaction
import graft.exec.{GraftScan, ZonePrune}
import graft.functions.{IcebergTruncate, IcebergTruncateUtil}
import graft.selection.{FullCompactionConfig, PlanningParams}

/** Iceberg `truncate[W]` partition transform end-to-end: the last of the
  * five standard spec transforms. Truncate values are ORDER-PRESERVING
  * faithful literals (prefixes / floor multiples), so unlike bucket
  * ordinals they are value-addressable (drop/overwrite by value) AND
  * range-prunable — every row of a partition lies in [T, T+W) for
  * numerics, in the byte-prefix interval of T for full-width strings. */
class TruncatePartitionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def freshCatalog() =
    LocalCatalog(Files.createTempDirectory("trunc-wh").toString)

  test("transform semantics match the spec across domains") {
    // ints/longs floor to the next-lowest multiple, negatives included
    assert(IcebergTruncateUtil.truncLong(17L, 10) == 10L)
    assert(IcebergTruncateUtil.truncLong(-1L, 10) == -10L)
    assert(IcebergTruncateUtil.truncLong(-10L, 10) == -10L)
    assert(IcebergTruncateUtil.truncInt(0, 10) == 0)
    // strings truncate to W code points, never splitting a codepoint
    assert(IcebergTruncateUtil.truncString(UTF8String.fromString("iceberg"), 3).toString == "ice")
    assert(IcebergTruncateUtil.truncString(UTF8String.fromString("ab"), 5).toString == "ab")
    assert(IcebergTruncateUtil.truncString(UTF8String.fromString("日本語テスト"), 2).toString == "日本")
    // decimal floors the UNSCALED value by W, scale preserved (spec example)
    assert(IcebergTruncateUtil.truncDecimal(Decimal("12.34"), 10, 4, 2).toString == "12.30")
    assert(IcebergTruncateUtil.truncDecimal(Decimal("-0.05"), 10, 4, 2).toString == "-0.10")
    // boundary negatives floor PAST the source precision: the transform is
    // total, so the partition value carries one extra digit (decimal(3,2)
    // -9.99 truncate 100 -> -10.00 — must not overflow-throw)
    assert(IcebergTruncateUtil.truncDecimal(Decimal("-9.99"), 100, 4, 2).toString == "-10.00")
    // and the expression form widens its declared type to match
    assert(IcebergTruncate(
      Literal(Decimal("-9.99"), DecimalType(3, 2)), 100).dataType == DecimalType(4, 2))
    assert(IcebergTruncate(Literal(Decimal("-9.99"), DecimalType(3, 2)), 100)
      .eval().asInstanceOf[Decimal].toString == "-10.00")
    // binary keeps the first W bytes
    assert(IcebergTruncateUtil.truncBinary(Array[Byte](1, 2, 3, 4), 2).toSeq == Seq[Byte](1, 2))
  }

  private def truncEntry(stored: String, col: String = "k", specId: Int = 0) =
    FileEntry(s"/t/f-$stored.parquet", 1L, FileContent.Data, 10L, 1L,
      partitionValues = Map(col -> stored), specId = specId)

  private val truncFields = Seq(PartitionField("k", "truncate[10]"))
  private val strFields = Seq(PartitionField("k", "truncate[2]"))

  test("numeric truncate pruning: equality AND range comparisons") {
    val schema = StructType(Seq(StructField("k", LongType)))
    val a = AttributeReference("k", LongType)()
    val f = truncEntry("20") // rows lie in [20, 29]
    def may(e: Expression) = ZonePrune.mayMatch(e, f, schema, Set.empty, "UTC", truncFields)

    assert(may(EqualTo(a, Literal(25L))))
    assert(may(EqualTo(a, Literal(20L))) && may(EqualTo(a, Literal(29L))))
    assert(!may(EqualTo(a, Literal(30L))) && !may(EqualTo(a, Literal(19L))))
    assert(!may(GreaterThan(a, Literal(29L)))) // max attainable is 29
    assert(may(GreaterThanOrEqual(a, Literal(29L))))
    assert(!may(LessThan(a, Literal(20L))))
    assert(may(LessThanOrEqual(a, Literal(20L))))
    // flipped literal-first forms
    assert(!may(GreaterThan(Literal(20L), a))) // 20 > k needs k < 20
    assert(may(GreaterThan(Literal(21L), a)))
    assert(!may(LessThan(Literal(29L), a))) // 29 < k needs k > 29
    assert(may(In(a, Seq(Literal(5L), Literal(22L)))))
    assert(!may(In(a, Seq(Literal(5L), Literal(35L)))))
    // negative-domain file: [-10, -1]
    val neg = truncEntry("-10")
    assert(ZonePrune.mayMatch(EqualTo(a, Literal(-1L)), neg, schema, Set.empty, "UTC", truncFields))
    assert(!ZonePrune.mayMatch(EqualTo(a, Literal(0L)), neg, schema, Set.empty, "UTC", truncFields))
  }

  test("string truncate pruning: prefix interval, exact-set short values, StartsWith") {
    val schema = StructType(Seq(StructField("k", StringType)))
    val a = AttributeReference("k", StringType)()
    def lit(s: String) = Literal(UTF8String.fromString(s), StringType)
    val full = truncEntry("ab") // full width: rows have prefix "ab"
    def may(e: Expression, f: FileEntry = full) =
      ZonePrune.mayMatch(e, f, schema, Set.empty, "UTC", strFields)

    assert(may(EqualTo(a, lit("ab"))) && may(EqualTo(a, lit("abc"))))
    assert(!may(EqualTo(a, lit("ac"))) && !may(EqualTo(a, lit("aa"))) && !may(EqualTo(a, lit("b"))))
    assert(!may(LessThan(a, lit("ab")))) // min attainable IS "ab"
    assert(may(LessThanOrEqual(a, lit("ab"))))
    assert(may(GreaterThan(a, lit("abzzzz")))) // prefix set is unbounded above
    assert(!may(GreaterThan(a, lit("ac"))))
    assert(may(StartsWith(a, lit("a"))) && may(StartsWith(a, lit("ab"))) &&
      may(StartsWith(a, lit("abc"))))
    assert(!may(StartsWith(a, lit("b"))) && !may(StartsWith(a, lit("ac"))))

    // short value: the file's rows for k are EXACTLY "a"
    val short = truncEntry("a")
    assert(may(EqualTo(a, lit("a")), short))
    assert(!may(EqualTo(a, lit("ab")), short))
    assert(!may(StartsWith(a, lit("ab")), short))
    assert(may(StartsWith(a, lit("a")), short))

    // historical-spec files never truncate-prune (conservative)
    val marked = truncEntry("ab", specId = 3)
    assert(may(EqualTo(a, lit("zz")), marked))
  }

  test("multibyte string truncate pruning stays byte/codepoint consistent") {
    val schema = StructType(Seq(StructField("k", StringType)))
    val a = AttributeReference("k", StringType)()
    def lit(s: String) = Literal(UTF8String.fromString(s), StringType)
    // full-width value of 2 CODE POINTS = 6 UTF-8 bytes
    val f = truncEntry("日本")
    def may(e: Expression) = ZonePrune.mayMatch(e, f, schema, Set.empty, "UTC", strFields)
    assert(may(EqualTo(a, lit("日本語テスト"))))
    assert(may(EqualTo(a, lit("日本"))))
    assert(!may(EqualTo(a, lit("日中")))) // shares the first codepoint only
    assert(!may(EqualTo(a, lit("english"))))
    assert(may(StartsWith(a, lit("日"))) && may(StartsWith(a, lit("日本語"))))
    assert(!may(StartsWith(a, lit("日中"))))
    // range: the prefix interval sorts between its byte neighbors
    assert(may(GreaterThan(a, lit("日本")))) // longer strings with the prefix exist
    assert(!may(LessThan(a, lit("日本")))) // min attainable IS the stored prefix
  }

  test("decimal truncate pruning uses unscaled-step intervals") {
    val dt = DecimalType(4, 2)
    val schema = StructType(Seq(StructField("k", dt)))
    val a = AttributeReference("k", dt)()
    val f = truncEntry("12.30") // w=10 unscaled steps: rows in [12.30, 12.39]
    def may(e: Expression) = ZonePrune.mayMatch(e, f, schema, Set.empty, "UTC", truncFields)
    assert(may(EqualTo(a, Literal(Decimal("12.35"), dt))))
    assert(!may(EqualTo(a, Literal(Decimal("12.40"), dt))))
    assert(!may(GreaterThan(a, Literal(Decimal("12.39"), dt))))
    assert(may(GreaterThanOrEqual(a, Literal(Decimal("12.39"), dt))))
  }

  test("string-truncate table: fan-out, value-addressable reads/drops, compaction") {
    val cat = freshCatalog()
    val rows = Seq("alpha", "alto", "beta", "bend", "gamma", "a")
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "name")
    IceWrite.create(spark, cat, "t", rows,
      partitionSpec = Seq(PartitionField("name", "truncate[2]")))
    val meta = cat.loadTable("t")
    val vals = meta.currentSnapshot.get.manifest.flatMap(_.partitionValues.get("name")).toSet
    assert(vals == Set("al", "be", "ga", "a"), s"recorded partitions: $vals")

    // partition read by the truncated literal
    val al = IceRead.tablePartition(spark, cat, "t", Map("name" -> "al"))
    assert(al.select("name").as[String].collect().toSet == Set("alpha", "alto"))

    // metadata-only drop by prefix value (value-addressable like identity)
    IceWrite.dropPartitions(cat, "t", Map("name" -> "be"))
    assert(IceRead.table(spark, cat, "t").select("name").as[String].collect().toSet ==
      Set("alpha", "alto", "gamma", "a"))

    // compaction groups by (specId, partition) and preserves the layout
    new Compaction(cat, "t", spark,
      config = FullCompactionConfig(PlanningParams(
        targetFileSizeBytes = 512L * 1024 * 1024,
        maxInputParallelism = 4, maxOutputParallelism = 2))).compact()
    val after = cat.loadTable("t").currentSnapshot.get.manifest
    assert(after.flatMap(_.partitionValues.get("name")).toSet == Set("al", "ga", "a"))
    assert(IceRead.table(spark, cat, "t").count() == 4)
  }

  test("truncate-partitioned reads prune files at plan time; results exact") {
    val cat = freshCatalog()
    // ids 0..299 partitioned by truncate[100]: 3 value partitions
    IceWrite.create(spark, cat, "z", (0L until 300L).map(i => (i, s"r$i")).toDF("id", "s"),
      partitionSpec = Seq(PartitionField("id", "truncate[100]")))
    val full = IceRead.table(spark, cat, "z")

    val q = full.filter(col("id") === 250L)
    q.collect()
    val (total, kept) = GraftScan.pruneStats(q)
    assert(total >= 3 && kept < total, s"no pruning ($kept of $total)")
    assert(q.count() == 1L)

    val r = full.filter(col("id") >= 205L && col("id") < 210L)
    r.collect()
    val (t2, k2) = GraftScan.pruneStats(r)
    assert(k2 < t2, s"range did not prune ($k2 of $t2)")
    assert(r.count() == 5L)
  }

  test("export carries truncate[W] + source-typed values; import round-trips and prunes") {
    val cat = freshCatalog()
    val rows = Seq("alpha", "alto", "beta", "bend", "gamma")
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "name")
    IceWrite.create(spark, cat, "t", rows,
      partitionSpec = Seq(PartitionField("name", "truncate[2]")))
    val jsonPath = IcebergExport.exportIcebergMetadata(cat, "t")
    val j = JsonMethods.parse(MetaIO.readString(jsonPath))

    val specFields = (j \ "partition-specs")(0) \ "fields" match {
      case JArray(xs) => xs; case _ => fail("no spec fields")
    }
    assert(specFields.exists(f => (f \ "transform") == JString("truncate[2]") &&
      (f \ "name") == JString("name_trunc")))

    // manifests carry the truncated STRING values (source type, not ints)
    val listPath = (j \ "snapshots")(0) \ "manifest-list" match {
      case JString(p) => p; case _ => fail()
    }
    val parts = IcebergExport.readAvro(listPath)._1.flatMap { le =>
      IcebergExport.readAvro(le.get("manifest_path").toString)._1.map { r =>
        r.get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord]
          .get("partition").asInstanceOf[org.apache.avro.generic.GenericRecord]
          .get("name_trunc").toString
      }
    }
    assert(parts.toSet == Set("al", "be", "ga"))

    val dstCat = freshCatalog()
    val back = IcebergImport.importIcebergMetadata(dstCat, "t2", jsonPath)
    assert(back.partitionSpec == Seq(PartitionField("name", "truncate[2]")))
    val a = IceRead.table(spark, cat, "t")
    val b = IceRead.table(spark, dstCat, "t2")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // the imported table prunes point lookups on the truncate column
    val q = b.filter(col("name") === "gamma")
    q.collect()
    val (total, kept) = GraftScan.pruneStats(q)
    assert(kept < total, s"imported table did not prune ($kept of $total)")
    assert(q.count() == 1L)
  }

  test("SQL front door: CREATE ... PARTITIONED BY (truncate(2, name))") {
    val cat = freshCatalog()
    GraftSql.register("tcat", cat)
    try {
      spark.sql("CREATE TABLE tcat.t (id BIGINT, name STRING) " +
        "PARTITIONED BY (truncate(2, name))")
      assert(cat.loadTable("t").partitionSpec == Seq(PartitionField("name", "truncate[2]")))
      spark.sql("INSERT INTO tcat.t VALUES (1, 'alpha'), (2, 'beta'), (3, 'alto')")
      val vals = cat.loadTable("t").currentSnapshot.get.manifest
        .flatMap(_.partitionValues.get("name")).toSet
      assert(vals == Set("al", "be"))
      assert(spark.sql("SELECT name FROM tcat.t WHERE name LIKE 'al%'")
        .as[String].collect().toSet == Set("alpha", "alto"))
    } finally GraftSql.unregister("tcat")
  }
}
