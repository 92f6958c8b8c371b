package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join/aggregate patterns for hot keys at scale.
  *
  * AQE's skew-join split handles most cases at runtime
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default here); these
  * explicit forms are for the pathological distributions AQE can't fix —
  * a single key holding >50% of rows, or skewed *aggregation* (AQE only
  * splits join partitions).
  */
object SkewJoins {

  /** Salted equi-join: the skewed (big) side gets a random salt in
    * [0, saltFactor), the small side is exploded saltFactor times so every
    * (key, salt) pair still matches. One hot key spreads over saltFactor
    * reducers. Results are identical to `big.join(small, keys)`. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String], saltFactor: Int): DataFrame = {
    require(saltFactor > 0)
    val salted = big.withColumn("__salt", (rand(seed = 42) * saltFactor).cast("int"))
    val exploded = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(exploded, keys :+ "__salt").drop("__salt")
  }

  /** Two-phase (salted) aggregation for skewed group-bys: partial
    * aggregate on (keys, salt), then final aggregate on keys. `sumCols`
    * are summed, row counts come back as `cnt`. Identical to the direct
    * groupBy; the hot key's partial states spread across reducers. */
  def saltedSumCount(df: DataFrame, keys: Seq[String], sumCols: Seq[String], saltFactor: Int): DataFrame = {
    require(saltFactor > 0)
    val salted = df.withColumn("__salt", (rand(seed = 42) * saltFactor).cast("int"))
    val partial = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(count(lit(1)).as("__cnt"), sumCols.map(c => sum(col(c)).as(s"__sum_$c")): _*)
    partial.groupBy(keys.map(col): _*)
      .agg(sum(col("__cnt")).as("cnt"), sumCols.map(c => sum(col(s"__sum_$c")).as(s"sum_$c")): _*)
  }
}
