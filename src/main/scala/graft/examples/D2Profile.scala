package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Stage-by-stage timing of the d2 MinHash pipeline at SPARK_GRAFT_SF_DIR
  * (diagnostic main; not part of the bench contract). */
object D2Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val d = spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text"))
    val corpus = d.unionAll(d.filter(col("doc_id") % 2 === 0)
        .select((col("doc_id") + 100000).as("doc_id"), concat(col("text"), lit(" extra")).as("text")))
      .unionAll(d.filter(col("doc_id") % 3 === 0)
        .select((col("doc_id") + 200000).as("doc_id"), col("text")))
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"STAGE $name%-22s ${(System.nanoTime()-t0)/1e9}%8.2f s  (rows=$n)")
    }
    // warmup
    corpus.count()
    time("corpus.count")(corpus.count())
    val grams = Dedup.wordShingles(corpus, "doc_id", "text", 3)
    time("shingles+distinct")(grams.count())
    val gramsCk = Dedup.wordShingles(corpus, "doc_id", "text", 3).localCheckpoint(false)
    time("checkpoint-grams")(gramsCk.count())
    val sig = Dedup.minHashSignatures(gramsCk, 16)
    time("signatures")(sig.count())
    val bands = Dedup.lshBands(sig, 16, 4)
    time("bands")(bands.count())
    val cand = Dedup.lshCandidatePairs(bands, 100)
    time("candidates")(cand.count())
    val sets = Dedup.wordShingleSets(corpus, "doc_id", "text", 3)
    time("per-row-sets")(sets.count())
    time("verify")(Dedup.verifyJaccardSets(cand, sets, 0.5).count())
    val sigSets = Dedup.minHashSignatureSets(corpus, "doc_id", "text", 3, 16)
    time("sig+sets-per-row")(sigSets.count())
    time("end-to-end")(Dedup.minHashNearDupPairs(corpus, "doc_id", "text").count())
    spark.stop()
  }
}
