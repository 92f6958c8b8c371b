package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Graph
import graft.queries.CoreQueries

/** Event-analytics tour over the synthetic stream table — the product-
  * analytics story on top of the same engine: funnel, cohort retention,
  * growth curve, integer-exact anomaly flags, native session windows,
  * resample + LOCF gap fill, and a k-core of the user co-activity graph.
  * Every query here is DuckDB-oracle-checked in the driver sweep; this
  * demo just composes and prints them. Run with
  * {{{ sbt "runMain graft.examples.AnalyticsDemo" }}}.
  */
object AnalyticsDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-analytics-demo").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    def q(name: String) = CoreQueries.queries(name)(spark, sf)

    val funnel = q("q_funnel").collect().sortBy(_.getString(0))
    println("FUNNEL " + funnel.map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(" "))

    val ret = q("q_retention")
    println(s"RETENTION cells=${ret.count()} " +
      s"day0_users=${ret.filter(col("day_offset") === 0).agg(sum("n_users")).head.getLong(0)}")

    val growth = q("q_growth").orderBy(col("hour")).collect()
    println(s"GROWTH hours=${growth.length} " +
      s"final_cum=${growth.last.getLong(2)}")

    val anomalies = q("q_anomaly")
    println(s"ANOMALIES flagged=${anomalies.count()}")

    val sessions = q("q_session_window")
    println(s"SESSIONS n=${sessions.count()} " +
      s"max_len=${sessions.agg(max("n_events")).head.getLong(0)}")

    val locf = q("q_locf")
    println(s"LOCF grid_rows=${locf.count()} " +
      s"filled=${locf.filter(col("filled_cents") >= 0).count()}")

    // user co-activity graph: users who share a 5-minute activity bucket
    // link; the 2-core drops the loosely-connected fringe
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = CoreQueries.normalizeTsNanos(spark.read.parquet(s"$sf/events.parquet"))
      .select(col("user_id"), expr("ts div 300000000000").as("bucket"))
    val edges = ev.alias("a").join(ev.alias("b"), Seq("bucket"))
      .filter(col("a.user_id") < col("b.user_id"))
      .select(col("a.user_id").as("src"), col("b.user_id").as("dst")).distinct()
    val core = Graph.kCore(edges, "src", "dst", k = 2)
    println(s"KCORE users_in_2core=${core.count()}")

    spark.stop()
  }
}
