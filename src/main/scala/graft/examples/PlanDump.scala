package graft.examples

import java.nio.file.{Files, Paths}

/** Dumps `.explain("formatted")` for named SparkEntry queries to files —
  * the plan evidence the optimization rounds commit under plans/rNN/.
  * Usage: runMain graft.examples.PlanDump <outDir> <query...>
  * Suffix (e.g. "_before"/"_after") via SPARK_GRAFT_PLAN_SUFFIX. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.head
    val names = args.tail.toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.util.SparkLogs.quietGlobalWindowWarning()
    Files.createDirectories(Paths.get(outDir))
    names.foreach { q =>
      try {
        val df = graft.SparkEntry.queries(q)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(outDir, s"$q$suffix.txt"), plan)
        println(s"[plandump] wrote $q$suffix (${plan.length} chars)")
      } catch {
        case e: Throwable => System.err.println(s"[plandump] $q failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
