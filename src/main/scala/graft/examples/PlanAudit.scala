package graft.examples
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    for (q <- Seq("q10_projection","q14_pos_anti_join","q16_chained_deletes","q5_star_join","d2_minhash_pairs","s1_ann_topk")) {
      val plan = graft.SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString
      val nEx = "Exchange".r.findAllIn(plan).length
      val nBhj = "BroadcastHashJoin".r.findAllIn(plan).length
      val nSmj = "SortMergeJoin".r.findAllIn(plan).length
      val pushed = plan.linesIterator.filter(_.contains("PushedFilters: [")).take(2).mkString(" | ")
      println(s"PLAN $q exchanges=$nEx bhj=$nBhj smj=$nSmj")
      if (pushed.nonEmpty) println(s"   $pushed")
    }
    spark.stop()
  }
}
