package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Hashed-token linear classifier: hand-computed Laplace weights, floor
  * averaging, prior fallbacks, and the bounded-broadcast scoring shape.
  */
class ClassifierSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def bucketOf(tok: String, hexChars: Int = 3): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(tok.getBytes("UTF-8")).map(b => f"$b%02x").mkString.take(hexChars)
  }

  test("train: Laplace-smoothed per-bucket weights and the prior row, by hand") {
    val df = Seq(
      ("alpha alpha beta", 1),
      ("beta gamma", 0),
      ("alpha", 1)
    ).toDF("text", "label")
    val m = Classifier.train(df, "text", "label").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    // alpha: 3 occurrences, all label 1 -> (1e6 * 4) div 5 = 800000
    assert(m(bucketOf("alpha")) == 800000L)
    // beta: 2 occurrences, one of each -> (1e6 * 2) div 4 = 500000
    assert(m(bucketOf("beta")) == 500000L)
    // gamma: 1 occurrence, label 0 -> (1e6 * 1) div 3 = 333333
    assert(m(bucketOf("gamma")) == 333333L)
    // prior over 3 docs, 2 positive -> (1e6 * 3) div 5 = 600000
    assert(m(Classifier.PriorBucket) == 600000L)
    assert(m.size == 4)
  }

  test("score: floor average of matched weights; unseen tokens take the prior") {
    val train = Seq(("alpha alpha beta", 1), ("beta gamma", 0), ("alpha", 1))
      .toDF("text", "label")
    val model = Classifier.train(train, "text", "label")
    val docs = Seq(
      (1L, "alpha beta"),        // (800000 + 500000) div 2 = 650000
      (2L, "gamma"),             // 333333
      (3L, "zzz-unseen"),        // prior 600000
      (4L, ""),                  // token-free -> prior
      (5L, null.asInstanceOf[String]) // null -> prior
    ).toDF("doc_id", "text")
    val rows = Classifier.score(docs, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(rows(1L) == ((650000L, 1)))
    assert(rows(2L) == ((333333L, 0)))
    assert(rows(3L) == ((600000L, 1)))
    assert(rows(4L) == ((600000L, 1)))
    assert(rows(5L) == ((600000L, 1)))
  }

  test("scoring plan: model broadcast, corpus side never exchanges before the doc agg") {
    val train = Seq(("alpha beta", 1), ("gamma", 0)).toDF("text", "label")
    val model = Classifier.train(train, "text", "label")
    val docs = Seq((1L, "alpha gamma")).toDF("doc_id", "text")
    val plan = Classifier.score(docs, "doc_id", "text", model)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"model side must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus must not shuffle into the join:\n$plan")
  }

  test("held-out accuracy on a separable corpus (distinct vocabularies + shared noise)") {
    // two class vocabularies plus shared filler; deterministic construction
    val posVocab = Vector("crisp", "bright", "lucid", "clean", "sharp")
    val negVocab = Vector("murky", "noisy", "garbled", "broken", "stale")
    val shared = Vector("the", "a", "data", "table", "row")
    def doc(id: Int, positive: Boolean): (Long, String, Int) = {
      val vocab = if (positive) posVocab else negVocab
      val words = (0 until 12).map { k =>
        val pool = if ((id + k) % 3 == 0) shared else vocab
        pool((id * 7 + k * 13) % pool.size)
      }
      (id.toLong, words.mkString(" "), if (positive) 1 else 0)
    }
    val all = (0 until 200).map(i => doc(i, i % 2 == 0))
    val df = all.toDF("doc_id", "text", "label")
    val model = Classifier.train(df.filter(col("doc_id") % 3 =!= 0), "text", "label")
    val scored = Classifier.score(
      df.filter(col("doc_id") % 3 === 0), "doc_id", "text", model)
      .join(df.select(col("doc_id"), col("label").as("truth")), "doc_id")
    val agg = scored.agg(
      sum((col("label") === col("truth")).cast("int")).as("correct"),
      count(lit(1)).as("n")).head()
    assert(agg.getLong(0) == agg.getLong(1),
      s"separable corpus must classify perfectly: ${agg.getLong(0)}/${agg.getLong(1)}")
  }
}
