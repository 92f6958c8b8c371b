package graft.meta

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.SparkTestBase
import graft.compaction.Compaction
import graft.selection.{FullCompactionConfig, PlanningParams}

/** Iceberg TIME transforms (year/month/day/hour) as first-class partition
  * layouts — the canonical pipeline shape: partition by ingestion day,
  * retire by day with a metadata-only drop. Values are recorded as the
  * human literal of the UTC ordinal, making them value-addressable
  * exactly like identity; the interop boundary converts literal <-> the
  * spec's int ordinals both ways. */
class TimePartitionSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.001"

  private def events = spark.read.parquet(s"$sf/events.parquet")
    .select(col("event_id"), col("ts"), col("user_id"), col("value"))

  test("ordinal <-> literal is the identity across the transform domains") {
    import PartitionField._
    for {
      (t, lits) <- Seq(
        "year" -> Seq("1969", "1970", "2026"),
        "month" -> Seq("1969-12", "1970-01", "2026-08"),
        "day" -> Seq("1969-12-31", "1970-01-01", "2026-08-14"),
        "hour" -> Seq("1969-12-31-23", "1970-01-01-00", "2026-08-14-15"))
      lit <- lits
    } assert(timeOrdinalToLiteral(t, timeLiteralToOrdinal(t, lit)) == lit,
      s"$t round trip broke for $lit")
    // spot values against the spec's examples (days/months/years since 1970)
    assert(timeLiteralToOrdinal("day", "1970-01-02") == 1)
    assert(timeLiteralToOrdinal("month", "1970-02") == 1)
    assert(timeLiteralToOrdinal("year", "1971") == 1)
    assert(timeLiteralToOrdinal("hour", "1970-01-01-01") == 1)
    assert(timeLiteralToOrdinal("day", "1969-12-31") == -1)
  }

  test("day-partitioned table: exact reads, metadata-only day drop, compaction") {
    val catalog = LocalCatalog(Files.createTempDirectory("tp-day").toString)
    IceWrite.create(spark, catalog, "ev_day", events,
      partitionSpec = Seq(PartitionField("ts", "day")))
    val meta = catalog.loadTable("ev_day")
    assert(meta.partitionSpec == Seq(PartitionField("ts", "day")))
    val entries = meta.currentSnapshot.get.manifest
    // one recorded literal day per file, every day of January present
    assert(entries.forall(_.partitionValues.get("ts").exists(_.startsWith("2024-01-"))))
    assert(entries.flatMap(_.partitionValues.get("ts")).distinct.size == 30)

    // partition read by day literal == row filter on the same day
    val want5 = events.filter(to_date(col("ts")) === "2024-01-05")
    val got5 = IceRead.tablePartition(spark, catalog, "ev_day", Map("ts" -> "2024-01-05"))
    assert(got5.count() > 0 && got5.count() == want5.count())
    assert(got5.exceptAll(want5).isEmpty && want5.exceptAll(got5).isEmpty)

    // day retention is a METADATA-ONLY drop (no SparkSession in the call)
    val total = events.count()
    IceWrite.dropPartitions(catalog, "ev_day", Map("ts" -> "2024-01-05"))
    assert(IceRead.table(spark, catalog, "ev_day").count() == total - want5.count())
    assert(IceRead.tablePartition(spark, catalog, "ev_day", Map("ts" -> "2024-01-05")).count() == 0)
    // untouched days intact, byte-for-byte (same file paths)
    val day6Before = entries.filter(_.partitionValues.get("ts").contains("2024-01-06")).map(_.path).toSet
    val day6After = catalog.loadTable("ev_day").currentSnapshot.get.manifest
      .filter(_.partitionValues.get("ts").contains("2024-01-06")).map(_.path).toSet
    assert(day6Before == day6After && day6Before.nonEmpty)

    // compaction respects the day grouping (partition-scoped groups)
    new Compaction(catalog, "ev_day", spark,
      config = FullCompactionConfig(PlanningParams(
        targetFileSizeBytes = 512L * 1024 * 1024,
        maxInputParallelism = 4, maxOutputParallelism = 2))).compact()
    val after = catalog.loadTable("ev_day")
    assert(IceRead.table(spark, catalog, "ev_day").count() == total - want5.count())
    assert(after.currentSnapshot.get.manifest
      .forall(_.partitionValues.get("ts").exists(_.startsWith("2024-01-"))))
  }

  test("day-partitioned export carries the spec transform + int ordinals; import round-trips") {
    val catalog = LocalCatalog(Files.createTempDirectory("tp-exp").toString)
    IceWrite.create(spark, catalog, "ev_exp", events.filter(dayofmonth(col("ts")) <= 3),
      partitionSpec = Seq(PartitionField("ts", "day")))
    val jsonPath = IcebergExport.exportIcebergMetadata(catalog, "ev_exp")
    val j = JsonMethods.parse(MetaIO.readString(jsonPath))

    // spec: transform "day", field name "ts_day"
    val specFields = (j \ "partition-specs")(0) \ "fields" match {
      case JArray(xs) => xs; case _ => fail("no spec fields")
    }
    assert(specFields.exists(f => (f \ "transform") == JString("day") &&
      (f \ "name") == JString("ts_day")))

    // manifests: int day ordinals in the partition struct
    val listPath = (j \ "snapshots")(0) \ "manifest-list" match {
      case JString(p) => p; case _ => fail()
    }
    val days = IcebergExport.readAvro(listPath)._1.flatMap { le =>
      IcebergExport.readAvro(le.get("manifest_path").toString)._1.map { r =>
        r.get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord]
          .get("partition").asInstanceOf[org.apache.avro.generic.GenericRecord]
          .get("ts_day")
      }
    }
    assert(days.nonEmpty && days.forall(_.isInstanceOf[Integer]))
    val wantOrdinals = (1 to 3).map(d =>
      PartitionField.timeLiteralToOrdinal("day", f"2024-01-$d%02d")).toSet
    assert(days.map(_.asInstanceOf[Integer].intValue).toSet == wantOrdinals)

    // import: literals restored, MOR + partition read exact
    val dstCat = LocalCatalog(Files.createTempDirectory("tp-exp-dst").toString)
    val back = IcebergImport.importIcebergMetadata(dstCat, "ev_b", jsonPath)
    assert(back.partitionSpec == Seq(PartitionField("ts", "day")))
    assert(back.currentSnapshot.get.manifest.forall(
      _.partitionValues.get("ts").exists(_.matches("2024-01-0[123]"))))
    val a = IceRead.table(spark, catalog, "ev_exp")
    val b = IceRead.table(spark, dstCat, "ev_b")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    val d2 = IceRead.tablePartition(spark, dstCat, "ev_b", Map("ts" -> "2024-01-02"))
    assert(d2.count() == events.filter(to_date(col("ts")) === "2024-01-02").count())
  }

  test("month/year/hour transforms write, read, and overwrite by value") {
    val s = spark
    import s.implicits._
    val catalog = LocalCatalog(Files.createTempDirectory("tp-mo").toString)
    IceWrite.create(spark, catalog, "ev_mo", events,
      partitionSpec = Seq(PartitionField("ts", "month")))
    assert(catalog.loadTable("ev_mo").currentSnapshot.get.manifest
      .forall(_.partitionValues.get("ts").contains("2024-01")))

    // hour granularity: literals carry the hour suffix
    val hrCat = LocalCatalog(Files.createTempDirectory("tp-hr").toString)
    IceWrite.create(spark, hrCat, "ev_hr", events.limit(50),
      partitionSpec = Seq(PartitionField("ts", "hour")))
    assert(hrCat.loadTable("ev_hr").currentSnapshot.get.manifest
      .forall(_.partitionValues.get("ts").exists(_.matches("2024-01-\\d{2}-\\d{2}"))))

    // dynamic partition overwrite by month: replaces January wholly
    val fresh = Seq((9001L, java.sql.Timestamp.valueOf("2024-01-15 12:00:00"), 7L, 1.5))
      .toDF("event_id", "ts", "user_id", "value")
    IceWrite.overwritePartitions(spark, catalog, "ev_mo", fresh)
    val after = IceRead.table(spark, catalog, "ev_mo")
    assert(after.count() == 1)
    assert(after.head().getLong(0) == 9001L)
  }
}
