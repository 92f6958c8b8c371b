package graft.exec

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.meta.{IceRead, IceWrite, LocalCatalog, SchemaEvolution}

/** Regression pins for the three stats-safety holes found in review:
  * (1) rename/drop + name reuse must not let a new column inherit the old
  * field's name-keyed manifest statistics; (2) a row group with
  * unrepresentable bounds must poison the column's file-level zone map,
  * not shrink it; (3) timestamp identity-partition strings must never
  * const-prune (writer-zone rendering). */
class StatsSafetySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("renamed-away column name reused by addColumn does not inherit old stats") {
    val cat = LocalCatalog(Files.createTempDirectory("retired-wh").toString)
    IceWrite.create(spark, cat, "t", (1L to 10L).map(i => (i, i * 100L)).toDF("id", "a"))
    SchemaEvolution.renameColumn(cat, "t", "a", "c")
    SchemaEvolution.addColumn(cat, "t", "a", "BIGINT")
    assert(cat.loadTable("t").statsRetiredNames == Set("a"))
    // new rows carry values for the NEW column a; old file reads NULL for it
    IceWrite.append(spark, cat, "t",
      Seq((11L, 1100L, java.lang.Long.valueOf(7L))).toDF("id", "c", "a"))

    val t = IceRead.table(spark, cat, "t")
    // metadata count(a) must NOT answer 10 from the old field's null counts
    val agg = t.agg(count(col("a")).as("nc"), min(col("a")).as("mn"), max(col("a")).as("mx"))
      .collect().head
    assert(agg.getLong(0) == 1L, s"count(a) counted the OLD field: ${agg.getLong(0)}")
    assert(agg.getLong(1) == 7L && agg.getLong(2) == 7L,
      s"min/max(a) answered from the OLD field's bounds: $agg")
    // IS NULL on the reused name must keep the old file (its rows are null)
    assert(t.filter(col("a").isNull).count() == 10L)
    // equality on the reused name must not zone-prune via the old bounds
    assert(t.filter(col("a") === 7L).count() == 1L)
    // the surviving column c keeps working (conservative, never wrong)
    assert(t.filter(col("c") === 500L).count() == 1L)
  }

  test("dropped column name reused by addColumn does not inherit old stats") {
    val cat = LocalCatalog(Files.createTempDirectory("retired2-wh").toString)
    IceWrite.create(spark, cat, "t", (1L to 6L).map(i => (i, i + 1000L)).toDF("id", "x"))
    SchemaEvolution.dropColumn(cat, "t", "x")
    SchemaEvolution.addColumn(cat, "t", "x", "BIGINT")
    assert(cat.loadTable("t").statsRetiredNames == Set("x"))
    val t = IceRead.table(spark, cat, "t")
    assert(t.filter(col("x").isNull).count() == 6L)
    assert(t.agg(count(col("x"))).collect().head.getLong(0) == 0L)
    // range pruning API must also refuse the retired name's bounds
    val ranged = IceRead.tableRange(spark, cat, "t", "x", BigDecimal(1001), BigDecimal(1002))
    assert(ranged.count() == 0L, "old bounds must not admit rows for the NEW x")
  }

  test("a row group with oversized string bounds poisons the file's string zone map") {
    val dir = Files.createTempDirectory("poison-str").toString
    val long = "z" * 80 // sorts AFTER every short value; bounds unrecordable
    val rows = (1 to 20000).map(i => (i.toLong, f"m$i%05d")) :+ (20001L, long)
    rows.toDF("id", "s").coalesce(1).sortWithinPartitions("id")
      .write.mode("overwrite").option("parquet.block.size", 64 * 1024).parquet(dir)
    val conf = spark.sessionState.newHadoopConf()
    val f = graft.meta.MetaIO.listFilesRecursive(dir).map(_._1).find(_.endsWith(".parquet")).get
    val info = SparkExecutor.parquetFooterInfo(conf, f)
    val nGroups = {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new org.apache.hadoop.fs.Path(f), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getFooter.getBlocks.size finally r.close()
    }
    assume(nGroups > 1, "fixture must span multiple row groups")
    // a merged-but-partial bound ('m00001'..'m20000') would wrongly prune
    // WHERE s = the long string; the column must carry NO string zone map
    assert(!info.stats.contains("s"),
      s"partial string bounds recorded: ${info.stats.get("s")} over $nGroups row groups")
    assert(info.stats.contains("id"), "numeric sibling column keeps its zone map")
  }

  test("a NaN-tainted row group poisons the file's numeric zone map") {
    val dir = Files.createTempDirectory("poison-nan").toString
    val rows = (1 to 20000).map(i => (i.toLong, i / 2.0)) :+ (20001L, Double.NaN)
    rows.toDF("id", "d").coalesce(1).sortWithinPartitions("id")
      .write.mode("overwrite").option("parquet.block.size", 64 * 1024).parquet(dir)
    val conf = spark.sessionState.newHadoopConf()
    val f = graft.meta.MetaIO.listFilesRecursive(dir).map(_._1).find(_.endsWith(".parquet")).get
    val info = SparkExecutor.parquetFooterInfo(conf, f)
    assert(!info.stats.contains("d"),
      s"partial numeric bounds recorded despite NaN row group: ${info.stats.get("d")}")
    assert(info.stats.contains("id"))
  }

  test("timestamp identity-partition values never const-prune (zone rendering)") {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("ts", TimestampType)))
    val f = graft.meta.FileEntry("/t/f.parquet", 1L, graft.meta.FileContent.Data, 10L, 1L,
      partitionValues = Map("ts" -> "2024-01-01 00:00:00"))
    val attr = AttributeReference("ts", TimestampType)()
    // a predicate that would be FALSE if the dir string were decoded in a
    // shifted zone must still KEEP the file
    val pred = EqualTo(attr, Literal(1704067200000000L, TimestampType)) // 2024-01-01T00Z micros
    assert(ZonePrune.mayMatch(pred, f, schema, Set("ts"), "America/Los_Angeles"))
    assert(ZonePrune.mayMatch(pred, f, schema, Set("ts"), "UTC"))
  }
}
