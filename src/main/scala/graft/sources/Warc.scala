package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WARC (Web ARChive, ISO 28500) container ingest — the format web-crawl
  * corpora (Common Crawl among them) actually arrive in: each archive
  * file is a concatenation of records, every record a `WARC/1.0` header
  * block (CRLF-terminated `Name: value` lines, `Content-Length`
  * mandatory) followed by exactly that many payload bytes and a blank
  * CRLF CRLF separator. Archives are commonly gzipped per record with
  * the members concatenated — a shape `java.util.zip.GZIPInputStream`
  * decompresses transparently (it chains concatenated members), so one
  * code path covers plain and .warc.gz payloads.
  *
  * Parsing is `mapPartitions` over (file_id, payload) rows — the same
  * batch shape as the media decoders (`ops.Multimodal`): a WARC file is
  * the natural unit of parallelism (Common Crawl ships ~1 GiB files;
  * 100 TB is ~100k files spread across the cluster), records explode
  * into rows inside the task, and no shuffle happens at all — parse is
  * a narrow transform; whatever aggregation follows pays its own.
  *
  * Malformed input follows the quarantine philosophy of
  * [[Ingest.jsonl]]: a file whose byte stream stops parsing yields the
  * records parsed so far plus ONE `__malformed` marker row carrying the
  * byte offset — bad crawl data neither kills the job nor vanishes
  * silently. */
object Warc {

  private val Crlf = "\r\n".getBytes("US-ASCII")

  /** Assemble a plain WARC/1.0 file from (targetUri, contentType, body)
    * response records — the fixture-side encoder (tests and the m5
    * oracle query build archives from constants with it; a crawler
    * would, too). The WARC-Date is fixed by the caller for determinism. */
  def warcBytes(records: Seq[(String, String, Array[Byte])],
      date: String = "2026-01-01T00:00:00Z"): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    records.foreach { case (uri, contentType, body) =>
      val header =
        s"WARC/1.0\r\n" +
        s"WARC-Type: response\r\n" +
        s"WARC-Target-URI: $uri\r\n" +
        s"WARC-Date: $date\r\n" +
        s"Content-Type: $contentType\r\n" +
        s"Content-Length: ${body.length}\r\n" +
        "\r\n"
      bos.write(header.getBytes("US-ASCII"))
      bos.write(body)
      bos.write(Crlf); bos.write(Crlf)
    }
    bos.toByteArray
  }

  /** gzip a byte array (one member) — chain calls to build the
    * concatenated-member .warc.gz shape. */
  def gzip(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(bytes); gz.close()
    bos.toByteArray
  }

  private def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val bos = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](64 * 1024)
    var n = in.read(buf)
    while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
    bos.toByteArray
  }

  private val OutSchema = StructType(Seq(
    StructField("file_id", LongType),
    StructField("rec_idx", LongType),
    StructField("warc_type", StringType),
    StructField("target_uri", StringType),
    StructField("content_type", StringType),
    StructField("content_length", LongType),
    StructField("body", BinaryType)))

  /** One CRLF-terminated ASCII line starting at `pos`, or null if no CRLF
    * before end-of-bytes (header truncation). */
  private def readLine(bytes: Array[Byte], pos: Int): (String, Int) = {
    var i = pos
    while (i + 1 < bytes.length && !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
    if (i + 1 >= bytes.length) (null, bytes.length)
    else (new String(bytes, pos, i - pos, "US-ASCII"), i + 2)
  }

  /** Parse one file's bytes into record Rows (and at most one trailing
    * `__malformed` marker). */
  private def parseFile(fileId: Long, payload: Array[Byte]): Iterator[Row] = {
    if (payload == null || payload.isEmpty) return Iterator.empty
    val bytes =
      if (payload.length >= 2 && (payload(0) & 0xff) == 0x1f && (payload(1) & 0xff) == 0x8b)
        try gunzipAll(payload)
        catch { case _: Exception =>
          // cap the marker body like every other malformed path — a 1 GiB
          // corrupt archive must not ride along as a single row field
          return Iterator.single(Row(fileId, 0L, "__malformed", null, null, 0L,
            java.util.Arrays.copyOfRange(payload, 0, math.min(payload.length, 256)))) }
      else payload
    val out = scala.collection.mutable.ArrayBuffer.empty[Row]
    var pos = 0
    var idx = 0L
    var bad = false
    while (!bad && pos < bytes.length) {
      val start = pos
      val (version, p1) = readLine(bytes, pos)
      if (version == null || !version.startsWith("WARC/")) { bad = true; pos = start }
      else {
        // header block: Name: value lines until the blank line
        var p = p1
        val headers = scala.collection.mutable.Map.empty[String, String]
        var headerDone = false
        var headerBad = false
        while (!headerDone && !headerBad) {
          val (line, pn) = readLine(bytes, p)
          if (line == null) headerBad = true
          else if (line.isEmpty) { headerDone = true; p = pn }
          else line.indexOf(':') match {
            case -1 => headerBad = true
            case c =>
              headers(line.substring(0, c).trim.toLowerCase) = line.substring(c + 1).trim
              p = pn
          }
        }
        val len = headers.get("content-length").flatMap(_.toLongOption)
        if (headerBad || len.isEmpty || len.get < 0
            || p.toLong + len.get > bytes.length) { bad = true; pos = start }
        else {
          val body = java.util.Arrays.copyOfRange(bytes, p, p + len.get.toInt)
          out += Row(fileId, idx, headers.getOrElse("warc-type", null),
            headers.getOrElse("warc-target-uri", null),
            headers.getOrElse("content-type", null), len.get, body)
          idx += 1
          p += len.get.toInt
          // tolerate a truncated separator at end-of-file — but ONLY a
          // true prefix of CRLF CRLF; arbitrary trailing bytes must
          // quarantine, not vanish (they may be a truncated next record)
          if (p + 4 <= bytes.length && bytes(p) == '\r' && bytes(p + 1) == '\n'
              && bytes(p + 2) == '\r' && bytes(p + 3) == '\n') pos = p + 4
          else {
            val sep = Array[Byte]('\r', '\n', '\r', '\n')
            val rem = bytes.length - p
            if (rem < 4 && (0 until rem).forall(i => bytes(p + i) == sep(i)))
              pos = bytes.length
            else { bad = true; pos = p }
          }
        }
      }
      if (bad) out += Row(fileId, idx, "__malformed", null, null, pos.toLong,
        java.util.Arrays.copyOfRange(bytes, pos, math.min(bytes.length, pos + 256)))
    }
    out.iterator
  }

  /** Distributed WARC parse: (file_id, payload) -> one row per record,
    * `(file_id, rec_idx, warc_type, target_uri, content_type,
    * content_length, body)`, plus one `__malformed` row (content_length
    * = byte offset, body = the first 256 offending bytes) where a file's
    * stream stops parsing. Gzipped payloads (magic-sniffed) decompress
    * member-chained. Narrow transform — zero shuffles. */
  def parse(spark: SparkSession, files: DataFrame,
      fileIdCol: String = "file_id", payloadCol: String = "payload"): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(OutSchema)
    files.select(col(fileIdCol).cast("long"), col(payloadCol))
      .mapPartitions { rows =>
        rows.flatMap(r => parseFile(r.getLong(0), r.getAs[Array[Byte]](1)))
      }(enc)
  }
}
