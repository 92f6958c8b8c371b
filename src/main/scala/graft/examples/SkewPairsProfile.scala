package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Scratch profiler for the skew_d2 / skew_d12 bench lines: phase-by-phase
  * wall time over the same planted-mega-bucket fixture Bench builds, plus
  * a broadcast-vs-shuffled A/B of the candidate-verify arm (the broadcast
  * arm re-broadcasts the pair-resolved GRAM SET ARRAYS, whose bytes scale
  * with candidates x set width — this instrument measures whether that
  * driver-built relation is the line's dominant cost). Not part of the
  * library surface. */
object SkewPairsProfile {
  def main(args: Array[String]): Unit = {
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

    val boiler = ("Licensed under the Apache License Version 2.0 you may not use " +
      "this file except in compliance with the License you may obtain a copy " +
      "of the License at http example com licenses and limitations ") * 3
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val nBase = base.count()
    val docs = base.crossJoin(spark.range(10).toDF("rep"))
      .select((col("doc_id") + col("rep") * nBase).as("doc_id"), col("text"))
    val planted = docs.withColumn("text",
      when(col("doc_id") % 3 === 0, lit(boiler)).otherwise(col("text")))
      .repartition(cpus.toInt * 2)
      .localCheckpoint(true)
    println(s"[prof] fixture ready: ${planted.count()} docs")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  (rows=$n)")
    }

    val keepIds = spark.sparkContext.getPersistentRDDs.keySet
    (1 to 2).foreach { it =>
      println(s"[prof] === iteration $it")
      time("skew_d2 end-to-end")(Dedup.minHashNearDupPairs(planted, "doc_id", "text",
        n = 3, k = 16, rowsPerBand = 4, threshold = 0.5, maxBucketSize = 100).count())
      time("skew_d12 end-to-end")(Dedup.minHashContainmentPairs(planted, "doc_id", "text",
        n = 3, k = 16, rowsPerBand = 4, threshold = 0.9, maxBucketSize = 100).count())
      // phase breakdown of d12 (localCheckpoint(true) is EAGER — time the
      // call itself, not a later count over the blocks)
      var sigSets: org.apache.spark.sql.DataFrame = null
      time("sig+sets checkpoint") {
        sigSets = Dedup.minHashSignatureSets(planted, "doc_id", "text", 3, 16)
          .localCheckpoint(true)
        sigSets.count()
      }
      var und: org.apache.spark.sql.DataFrame = null
      time("candidates checkpoint") {
        und = Dedup.lshCandidatePairs(Dedup.lshBands(sigSets, 16, 4), 100)
          .localCheckpoint(true)
        und.count()
      }
      val directed = und.unionAll(und.select(col("id2").as("id1"), col("id1").as("id2")))
      val sets = sigSets.select(col("id"), col("gset"))
      time("verify broadcast arm") {
        val withA = sets.select(col("id").as("id1"), col("gset").as("__g1"))
          .join(broadcast(directed), Seq("id1"))
        sets.select(col("id").as("id2"), col("gset").as("__g2"))
          .join(broadcast(withA), Seq("id2"))
          .filter(graft.functions.SetFunctions.containment_ge(col("__g1"), col("__g2"), 0.9))
          .count()
      }
      time("verify shuffled arm") {
        directed
          .join(sets.select(col("id").as("id1"), col("gset").as("__g1")), Seq("id1"))
          .join(sets.select(col("id").as("id2"), col("gset").as("__g2")), Seq("id2"))
          .filter(graft.functions.SetFunctions.containment_ge(col("__g1"), col("__g2"), 0.9))
          .count()
      }
      // undirected resolve + both orientations from one intersection pass
      time("verify both-dir one pass") {
        val withA = sets.select(col("id").as("id1"), col("gset").as("__g1"))
          .join(broadcast(und), Seq("id1"))
        sets.select(col("id").as("id2"), col("gset").as("__g2"))
          .join(broadcast(withA), Seq("id2"))
          .select(col("id1"), col("id2"),
            graft.functions.SetFunctions.containment_ge(col("__g1"), col("__g2"), 0.9).as("__ab"),
            graft.functions.SetFunctions.containment_ge(col("__g2"), col("__g1"), 0.9).as("__ba"))
          .select(explode(array(
            struct(col("id1"), col("id2"), col("__ab").as("ok")),
            struct(col("id2").as("id1"), col("id1").as("id2"), col("__ba").as("ok")))).as("e"))
          .filter(col("e.ok"))
          .count()
      }
      // release the iteration's own blocks WITHOUT dropping the planted
      // fixture the next iteration still reads (the Bench keepIds pattern)
      spark.sparkContext.getPersistentRDDs.foreach {
        case (id, r) => if (!keepIds.contains(id)) r.unpersist(false)
      }
    }
    spark.stop()
  }
}
