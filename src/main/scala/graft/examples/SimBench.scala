package graft.examples
object SimBench {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    for (q <- Seq("d5_embed_neardup","s1_ann_topk","s2_ann_lsh_buckets","d2_minhash_pairs")) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, sf).count()
      println(f"SIMBENCH $q ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
