package graft.examples

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-stage wall-time profile of a single SparkEntry query: runs the
  * query twice (cold + warm) and prints the warm run's slowest stages
  * with call sites, plus the stage count — the instrument for telling
  * "one heavy stage" from "a hundred 30 ms scheduler round trips" on the
  * commit-heavy lines. Usage:
  * {{{ sbt "runMain graft.examples.QueryJobProfile <query> [query...]" }}} */
object QueryJobProfile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QueryJobProfile <query> [query...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.util.SparkLogs.quietGlobalWindowWarning()

    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Int, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val ms = (for { a <- i.completionTime; b <- i.submissionTime } yield a - b)
          .getOrElse(-1L)
        stages.add((i.stageId, ms, i.numTasks, i.name.take(110)))
      }
    })
    // warmup
    graft.SparkEntry.queries("q10_projection")(spark, sfDir).count()

    import scala.jdk.CollectionConverters._
    args.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name, sys.error(s"unknown query: $name"))
      // cold
      val tc0 = System.nanoTime()
      fn(spark, sfDir).count()
      val cold = (System.nanoTime() - tc0) / 1e9
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      // warm, instrumented
      stages.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val warm = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      val all = stages.asScala.toSeq
      val total = all.map(_._2).sum
      println(f"[qprof] $name cold=$cold%.2f warm=$warm%.2f stages=${all.size} stage-ms-sum=$total")
      all.sortBy(-_._2).take(14).foreach { case (id, ms, nt, cs) =>
        println(f"[qprof]   stage $id%5d ${ms}%6d ms ($nt%3d tasks)  $cs")
      }
    }
    spark.stop()
  }
}
