package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing for the winnow pair pipeline (perf diagnosis). */
object WinnowProfile {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }
    // the SAME seeded corpus the d13 benchmark query runs on — measuring
    // anything else would silently diverge from the workload under test
    val corpus = graft.queries.OpsQueries.corpus(spark, sf).repartition(32)

    // warmup
    corpus.count()
    time("corpus count")(corpus.count())
    val fpAll = graft.ops.TextAnalysis.winnowFingerprints(corpus, "doc_id", "text", 12, 5)
    time("fingerprints (full)")(fpAll.count())
    time("fingerprints (materialize)")(
      fpAll.select(col("id"), explode(col("fp_hashes")).as("h")).count())
    val fp = fpAll.select(col("id"), explode(col("fp_hashes")).as("h")).localCheckpoint(true)
    time("capped window")(fp.withColumn("__n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("h"))))
      .filter(col("__n") <= 64).count())
    time("full pairs")(graft.ops.Dedup.winnowNearDupPairs(
      corpus, "doc_id", "text", k = 12, minOverlapPpm = 500000L, maxBucketSize = 64).count())
    spark.stop()
  }
}
