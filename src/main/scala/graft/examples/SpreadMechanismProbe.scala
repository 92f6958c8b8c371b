package graft.examples

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** A/B instrument for [[graft.ops.Spread]]'s exchange mechanism: keyless
  * round-robin `repartition(n)` pays a local sort of its input
  * (sortBeforeRepartition, SPARK-23207) so retried tasks reproduce their
  * row assignment; a DETERMINISTIC synthetic key (pmod of a full-row
  * xxhash64) gets the same retry safety from the key itself and skips
  * the sort. Times a noop-sink materialization of the winnow fingerprint
  * stage under both, on the d13 corpus shape. */
object SpreadMechanismProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val n = spark.sparkContext.defaultParallelism
    def noop(df: org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def fp(base: org.apache.spark.sql.DataFrame) = base
      .select(col("doc_id"),
        graft.functions.WinnowFunctions.winnow_fingerprint(
          lower(col("text")), 12, 5).as("f"))
    // warm codegen
    noop(fp(docs.limit(100)))
    for (round <- 1 to 3) {
      val rr = noop(fp(docs.repartition(n)))
      val hash = noop(fp(docs.repartition(n,
        pmod(xxhash64(struct(docs.columns.map(col): _*)), lit(100 * n)))))
      val none = noop(fp(docs))
      println(f"[spreadprobe] round $round: roundrobin=$rr%.2f hashkey=$hash%.2f nospread=$none%.2f")
    }
    spark.stop()
  }
}
