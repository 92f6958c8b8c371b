package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Pins Spark's session_window boundary rule: a session's end is
  * last_event + gap, and UpdatingSessionsIterator MERGES when the next
  * event's start <= the current session end — so an event at EXACTLY gap
  * distance CONTINUES the session. The q_session_window oracle therefore
  * splits only on strict gap >; this fixture is the case synthetic
  * microsecond-grain data never lands on. */
class SessionBoundarySpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("an event at exactly gap distance extends the session; one past it splits") {
    val gapS = 1800L // 30 min
    val events = Seq(
      (1L, 0L),            // session A start
      (1L, gapS),          // EXACTLY 30 min later -> still session A
      (1L, gapS + gapS),   // exactly 30 min after that -> still session A
      (2L, 0L),
      (2L, gapS + 1L)      // one second PAST the gap -> new session
    ).toDF("user_id", "t_s")
      .withColumn("__t", expr("timestamp_seconds(t_s)"))

    val got = events
      .groupBy($"user_id", session_window($"__t", "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id", unix_micros($"sw.start").as("start_us"),
        unix_micros($"sw.end").as("end_us"), $"n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

    val gapUs = gapS * 1000000L
    assert(got === Set(
      (1L, 0L, 2 * gapUs + gapUs, 3L),       // merged: end = last + gap
      (2L, 0L, gapUs, 1L),                   // split at gap + 1s
      (2L, gapUs + 1000000L, 2 * gapUs + 1000000L, 1L)))
  }
}
