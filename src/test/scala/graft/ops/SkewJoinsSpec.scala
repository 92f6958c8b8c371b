package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SkewJoinsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.001"

  test("salted join matches the plain join exactly") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"))
    val ord = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
    val plain = li.join(ord, Seq("l_orderkey"))
    val salted = SkewJoins.saltedJoin(li, ord, Seq("l_orderkey"), saltFactor = 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salted two-phase aggregation matches direct groupBy") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val direct = li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("cnt"), sum(col("l_quantity")).as("sum_l_quantity"))
    val salted = SkewJoins.saltedSumCount(li, Seq("l_returnflag"), Seq("l_quantity"), saltFactor = 16)
    val d = direct.collect().map(r => (r.getString(0), r.getLong(1), math.round(r.getDouble(2)))).toSet
    val s = salted.collect().map(r => (r.getString(0), r.getLong(1), math.round(r.getDouble(2)))).toSet
    assert(d == s)
  }
}
