package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** WARC container encode/parse: pinned byte format, gzip member
  * chaining, malformed quarantine. */
class WarcSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def filesDf(rows: (Long, Array[Byte])*) = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      rows.map { case (id, p) => Row(id, p) }.asJava,
      StructType(Seq(StructField("file_id", LongType),
        StructField("payload", BinaryType))))
  }

  private def parsed(rows: (Long, Array[Byte])*) =
    Warc.parse(spark, filesDf(rows: _*)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getLong(5), new String(r.getAs[Array[Byte]](6), "UTF-8")))
      .sortBy(t => (t._1, t._2)).toSeq

  test("warcBytes emits the pinned WARC/1.0 layout byte for byte") {
    val got = new String(
      Warc.warcBytes(Seq(("http://a/1", "text/plain", "hello".getBytes("UTF-8")))),
      "US-ASCII")
    val expected =
      "WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      "WARC-Target-URI: http://a/1\r\n" +
      "WARC-Date: 2026-01-01T00:00:00Z\r\n" +
      "Content-Type: text/plain\r\n" +
      "Content-Length: 5\r\n" +
      "\r\n" +
      "hello\r\n\r\n"
    assert(got == expected)
  }

  test("parse round-trips multi-record archives, preserving order and bodies") {
    val bytes = Warc.warcBytes(Seq(
      ("http://a/1", "text/plain", "first body".getBytes("UTF-8")),
      ("http://a/2", "text/html", "<p>two</p>".getBytes("UTF-8"))))
    val got = parsed(7L -> bytes)
    assert(got == Seq(
      (7L, 0L, "response", "http://a/1", 10L, "first body"),
      (7L, 1L, "response", "http://a/2", 10L, "<p>two</p>")))
  }

  test("gzipped archives parse identically, including concatenated members") {
    val a = Warc.warcBytes(Seq(("http://g/1", "text/plain", "alpha".getBytes("UTF-8"))))
    val b = Warc.warcBytes(Seq(("http://g/2", "text/plain", "beta".getBytes("UTF-8"))))
    // per-record gzip members concatenated — the real .warc.gz layout
    val gz = Warc.gzip(a) ++ Warc.gzip(b)
    val got = parsed(1L -> gz)
    assert(got == Seq(
      (1L, 0L, "response", "http://g/1", 5L, "alpha"),
      (1L, 1L, "response", "http://g/2", 4L, "beta")))
  }

  test("malformed tail yields parsed records plus one __malformed marker; empty payload yields nothing") {
    val good = Warc.warcBytes(Seq(("http://m/1", "text/plain", "ok".getBytes("UTF-8"))))
    val bad = good ++ "NOT A WARC HEADER".getBytes("US-ASCII")
    val got = parsed(3L -> bad, 4L -> Array.empty[Byte])
    assert(got.map(t => (t._1, t._2, t._3)) ==
      Seq((3L, 0L, "response"), (3L, 1L, "__malformed")))
    // a Content-Length pointing past end-of-file quarantines, not throws
    val truncated = good.dropRight(6)
    val t = parsed(5L -> truncated)
    assert(t.map(_._3) == Seq("__malformed"))
  }

  test("short trailing garbage quarantines; a truncated CRLF separator is tolerated") {
    val good = Warc.warcBytes(Seq(("http://m/1", "text/plain", "ok".getBytes("UTF-8"))))
    // separator replaced by 4 junk bytes (could be a truncated record):
    // must NOT vanish silently
    val junk4 = parsed(1L -> (good.dropRight(4) ++ "WARC".getBytes("US-ASCII")))
    assert(junk4.map(_._3) == Seq("response", "__malformed"))
    // 2 junk bytes that are not a CRLF prefix: same
    val junk2 = parsed(2L -> (good.dropRight(4) ++ "XY".getBytes("US-ASCII")))
    assert(junk2.map(_._3) == Seq("response", "__malformed"))
    // a genuinely truncated separator (file cut mid-CRLFCRLF) is fine
    val cut = parsed(3L -> good.dropRight(2))
    assert(cut.map(_._3) == Seq("response"))
  }
}
