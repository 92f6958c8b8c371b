package graft.examples

import org.apache.spark.sql.SparkSession

/** Times individual SparkEntry queries by name — the per-line profiling
  * probe the full Bench is too coarse for. Usage:
  * {{{ sbt "runMain graft.examples.QueryTime <sfDir> <query> [query...]" }}}
  * Each query runs twice (cold + warm) like the bench's best-of-2. */
object QueryTime {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: QueryTime <sfDir> <query> [query...]")
    val sfDir = args.head
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.tail.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val rows = fn(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        (sec, rows)
      }
      println(f"TIME $name first=${times.head._1}%.2fs best=${times.map(_._1).min}%.2fs rows=${times.head._2}")
    }
    spark.stop()
  }
}
