package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus the decode / feature-extract
  * stage shapes a training pipeline needs.
  *
  * The Spark-side plumbing is real and tested — schema, partitioning,
  * batch iteration via `mapPartitions` (the JVM analogue of a pandas-batch
  * UDF: one iterator per partition, amortized per-batch setup). All three
  * modalities decode for REAL, library-free: images via JDK ImageIO
  * ([[decodeImage]]), audio via javax.sound.sampled ([[decodeWav]]), and
  * video via a pure-Scala AVI/RIFF container parser + ImageIO keyframe
  * decode ([[decodeAvi]] — container stats for any AVI, pixel features
  * for MJPEG-style frames). [[decodeBytes]] dispatches payloads to those
  * decoders on magic bytes, with a deterministic byte-stat fallback for
  * opaque formats with no JDK codec.
  */
object Multimodal {

  /** typed metadata carried next to every payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType),
    StructField("meta", mediaMetaType)))

  /** Wraps a text table as fake media rows: payload = utf-8 bytes, typed
    * metadata derived deterministically. Stand-in for `spark.read.format
    * ("binaryFile")` over an object store at scale. */
  def asMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit("fake/raw").as("format"),
        (length(col(textCol)) % 640).cast("int").as("width"),
        (length(col(textCol)) % 480).cast("int").as("height"),
        length(encode(col(textCol), "UTF-8")).cast("long").as("n_bytes")).as("meta"))

  /** Byte-stat featurizer — the FALLBACK branch of [[decodeBytes]] for
    * formats with no JDK codec (and for payloads whose codec dispatch
    * failed to parse): (length, mean byte value). Deterministic and
    * oracle-expressible, which is what keeps the whole mapPartitions
    * pipeline hash-checkable end to end. */
  private def byteStats(payload: Array[Byte]): Array[Double] = {
    if (payload == null || payload.isEmpty) Array(0.0, 0.0, 0.0)
    else {
      var sum = 0L; var i = 0
      while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
      Array(0.0, payload.length.toDouble, sum.toDouble / payload.length)
    }
  }

  /** Modality tags leading every [[decodeBytes]] feature vector. */
  val TagBytes = 0.0
  val TagImage = 1.0
  val TagWav = 2.0
  val TagAvi = 3.0

  /** REAL decode dispatch on magic bytes — no stub left: PNG/JPEG/GIF/BMP
    * route to the ImageIO decoder, RIFF/WAVE to the javax.sound PCM
    * decoder, RIFF/AVI to the pure-Scala container parser; anything else
    * (or a payload whose codec fails to parse) falls back to the
    * deterministic byte stats, so dispatch can only ADD information,
    * never lose rows. Vectors lead with a modality tag:
    *  - image: [1, width, height, mean_luma]
    *  - wav:   [2, sample_rate, channels, frames, rms]
    *  - avi:   [3, width, height, n_frames, us_per_frame]
    *  - bytes: [0, length, mean_byte]
    */
  private[ops] def decodeBytes(payload: Array[Byte]): Array[Double] = {
    if (payload == null || payload.length < 12) return byteStats(payload)
    def at(i: Int) = payload(i) & 0xff
    val isPng = at(0) == 0x89 && at(1) == 'P' && at(2) == 'N' && at(3) == 'G'
    val isJpeg = at(0) == 0xff && at(1) == 0xd8
    val isGif = at(0) == 'G' && at(1) == 'I' && at(2) == 'F'
    val isBmp = at(0) == 'B' && at(1) == 'M'
    def fourcc(off: Int) = new String(payload, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    val isRiff = fourcc(0) == "RIFF"
    if (isPng || isJpeg || isGif || isBmp)
      decodeImage(payload)
        .map { case (w, h, luma) => Array(TagImage, w.toDouble, h.toDouble, luma) }
        .getOrElse(byteStats(payload))
    else if (isRiff && fourcc(8) == "WAVE")
      decodeWav(payload)
        .map { case (rate, ch, frames, rms) =>
          Array(TagWav, rate.toDouble, ch.toDouble, frames.toDouble, rms) }
        .getOrElse(byteStats(payload))
    else if (isRiff && fourcc(8).startsWith("AVI"))
      decodeAvi(payload)
        .map { case (w, h, n, uspf, _) =>
          Array(TagAvi, w.toDouble, h.toDouble, n.toDouble, uspf.toDouble) }
        .getOrElse(byteStats(payload))
    else byteStats(payload)
  }

  /** Per-partition batched "decode + featurize": mapPartitions keeps any
    * heavyweight codec init per-partition, not per-row — the same batch
    * shape a pandas UDF gives PySpark. Output: (media_id, feat array),
    * feature layout per modality documented on [[decodeBytes]]. */
  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("features", ArrayType(DoubleType))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        // per-partition codec init would happen here
        rows.map { r =>
          Row(r.getLong(0), decodeBytes(r.getAs[Array[Byte]](1)))
        }
      }(enc)
  }

  /** REAL image decode — no stub: `javax.imageio` ships in the JDK, so
    * PNG/JPEG/BMP/GIF payloads decode without any external library.
    * Returns None for undecodable bytes (schema-level: null columns).
    * Mean luminance uses the standard Rec.601 weights, sampled with a
    * stride so pathological resolutions stay O(10^6) per image. */
  /** payload -> BufferedImage, or null for empty/undecodable bytes — the
    * shared preamble of every image path. */
  private def readImage(payload: Array[Byte]): java.awt.image.BufferedImage = {
    if (payload == null || payload.isEmpty) return null
    try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    catch { case _: Exception => null }
  }

  private[ops] def decodeImage(payload: Array[Byte]): Option[(Int, Int, Double)] = {
    val img = readImage(payload)
    if (img == null) return None
    val w = img.getWidth; val h = img.getHeight
    val stride = math.max(1, math.max(w, h) / 1024)
    var sum = 0.0; var n = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
        sum += 0.299 * r + 0.587 * g + 0.114 * b
        n += 1
        x += stride
      }
      y += stride
    }
    Some((w, h, if (n == 0) 0.0 else sum / n))
  }

  /** Per-partition batched IMAGE decode over binary payloads: one
    * ImageIO/codec context per partition, rows -> (media_id, width,
    * height, mean_luma), nulls for undecodable payloads. The real-decoder
    * counterpart of [[extractFeatures]]'s byte-stat stub — same
    * mapPartitions batch shape, actual pixels. */
  def extractImageFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("mean_luma", DoubleType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          decodeImage(r.getAs[Array[Byte]](1)) match {
            case Some((w, h, luma)) => Row(r.getLong(0), w, h, luma)
            case None               => Row(r.getLong(0), null, null, null)
          }
        }
      }(enc)
  }

  private[ops] def resizeImage(payload: Array[Byte], w: Int, h: Int): Option[Array[Byte]] = {
    val img = readImage(payload)
    if (img == null) return None
    val out = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, w, h, null)
    } finally g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(out, "png", bos)
    Some(bos.toByteArray)
  }

  /** REAL image resize to a fixed (width, height) — the normalization
    * step before any vision featurizer: JDK-only (java.awt bilinear
    * redraw + PNG re-encode), same per-partition batch shape as
    * [[extractImageFeatures]]. Rows -> (media_id, payload, width,
    * height); undecodable payloads yield null payload. The output
    * payload is a lossless PNG, so downstream decodes see exactly the
    * resampled pixels. */
  def resizeImages(spark: SparkSession, media: DataFrame,
      width: Int, height: Int): DataFrame = {
    require(width >= 1 && height >= 1, s"bad target size ${width}x$height")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType),
      StructField("width", IntegerType),
      StructField("height", IntegerType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          resizeImage(r.getAs[Array[Byte]](1), width, height) match {
            case Some(bytes) => Row(r.getLong(0), bytes, width, height)
            case None        => Row(r.getLong(0), null, null, null)
          }
        }
      }(enc)
  }

  /** Deterministic gray BMP payload: pixel (x, y) carries luma
    * `f(x, y) & 0xff` on all three channels. BMP is lossless, so a
    * decode sees exactly these values — the fixture half of the
    * encode -> REAL-decode -> hash round trip [[imageDHashes]] is
    * oracle-checked on. */
  def grayBmpBytes(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = f(x, y) & 0xff
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    bos.toByteArray
  }

  /** Difference-hash (dHash) of an image payload: REAL decode, integer
    * Rec.601 luma (`(299r + 587g + 114b) div 1000` — exact on gray
    * pixels), area-averaged down to a 9x8 grid unless the image already
    * is one, then 64 bits of "right neighbor brighter". Returned as two
    * unsigned 32-bit halves (lo = bits 0..31, bit k = y*8+x) so the
    * value stays nonnegative in engines without unsigned int64.
    * The canonical image near-dup fingerprint (LAION-style pipelines):
    * near-identical images differ in a few bits, so Hamming top-k over
    * the halves ([[graft.functions]] s9 path) finds them. */
  private[ops] def dHash(payload: Array[Byte]): Option[(Long, Long)] = {
    val img = readImage(payload)
    if (img == null) return None
    val (gw, gh) = (9, 8)
    val w = img.getWidth; val h = img.getHeight
    if (w < gw || h < gh) return None
    // integer area average per grid cell (identity when already 9x8)
    val grid = Array.ofDim[Int](gh, gw)
    var gy = 0
    while (gy < gh) {
      val y0 = gy * h / gh; val y1 = math.max((gy + 1) * h / gh, y0 + 1)
      var gx = 0
      while (gx < gw) {
        val x0 = gx * w / gw; val x1 = math.max((gx + 1) * w / gw, x0 + 1)
        var sum = 0L; var n = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
            sum += (299L * r + 587L * g + 114L * b) / 1000L
            n += 1
            x += 1
          }
          y += 1
        }
        grid(gy)(gx) = (sum / n).toInt
        gx += 1
      }
      gy += 1
    }
    var lo = 0L; var hi = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        val k = y * 8 + x
        if (grid(y)(x + 1) > grid(y)(x)) {
          if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
        }
        x += 1
      }
      y += 1
    }
    Some((lo, hi))
  }

  /** Per-partition batched dHash over binary image payloads — same
    * mapPartitions batch shape as [[extractImageFeatures]]. Rows ->
    * (media_id, dhash_lo, dhash_hi); undecodable payloads yield nulls. */
  def imageDHashes(spark: SparkSession, media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("dhash_lo", LongType),
      StructField("dhash_hi", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    // no Spread here: repartitioning would shuffle the media PAYLOADS —
    // the one thing a media pipeline must never move twice (guide §8);
    // measured a net loss even on tiny fixtures
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          dHash(r.getAs[Array[Byte]](1)) match {
            case Some((lo, hi)) => Row(r.getLong(0), lo, hi)
            case None           => Row(r.getLong(0), null, null)
          }
        }
      }(enc)
  }

  /** Image near-duplicate pairs via banded Hamming LSH over [[dHash]]
    * fingerprints — the full LAION-shaped image dedup path, same LSH
    * skeleton as the MinHash text path ([[Dedup.lshCandidatePairs]]):
    * the 64-bit hash splits into four 16-bit bands, and any two hashes
    * within Hamming distance 3 agree EXACTLY on at least one band
    * (pigeonhole: 3 differing bits cannot touch all 4 bands), so the
    * bucket join on (band, value) loses nothing at `maxHamming <= 3`.
    * Candidates verify with codegen'd `bit_count(xor)` on the halves.
    *
    * Shuffle profile: per-partition decode+hash (no pixel ever shuffles),
    * one (band, value)-keyed exchange for the bucket join with the same
    * bucket-size cap as the text path (a solid-color meme template is the
    * hot bucket here), one id-keyed join back to the hash table for the
    * verify. Returns (id1, id2, hamming), id1 < id2. */
  def imageNearDupPairs(spark: SparkSession, media: DataFrame,
      maxHamming: Int = 3, maxBucketSize: Int = 1000): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"banding guarantees recall only for maxHamming <= 3, got $maxHamming")
    val hashes = imageDHashes(spark, media)
      .filter(col("dhash_lo").isNotNull).localCheckpoint(true)
    val banded = hashes.select(col("media_id").as("id"), explode(array(
      struct(lit(0).as("band"), (col("dhash_lo").bitwiseAND(0xffffL)).as("bh")),
      struct(lit(1).as("band"), shiftright(col("dhash_lo"), 16).as("bh")),
      struct(lit(2).as("band"), (col("dhash_hi").bitwiseAND(0xffffL)).as("bh")),
      struct(lit(3).as("band"), shiftright(col("dhash_hi"), 16).as("bh")))).as("b"))
      .select(col("id"), col("b.band").as("band"), col("b.bh").as("bh"))
    val pairs = Dedup.lshCandidatePairs(banded, maxBucketSize)
    val h1 = hashes.select(col("media_id").as("id1"),
      col("dhash_lo").as("__lo1"), col("dhash_hi").as("__hi1"))
    val h2 = hashes.select(col("media_id").as("id2"),
      col("dhash_lo").as("__lo2"), col("dhash_hi").as("__hi2"))
    pairs.join(h1, Seq("id1")).join(h2, Seq("id2"))
      .withColumn("hamming",
        bit_count(col("__lo1").bitwiseXOR(col("__lo2"))) +
          bit_count(col("__hi1").bitwiseXOR(col("__hi2"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id1"), col("id2"), col("hamming").cast("long").as("hamming"))
  }

  /** End-to-end image dedup: [[imageNearDupPairs]] -> star connected
    * components -> best-per-cluster keeper selection — the image-side
    * twin of the text path's pairs -> [[Dedup.clusterPairsStar]] ->
    * [[Dedup.keepBestPerCluster]] compose. `scoreCol` ranks keepers
    * (e.g. resolution, source priority); undecodable payloads carry no
    * hash, join no cluster, and are always kept. Returns `media` minus
    * the dominated near-duplicates. */
  def imageDedupKeepBest(spark: SparkSession, media: DataFrame,
      scoreCol: String, maxHamming: Int = 3,
      maxBucketSize: Int = 1000): DataFrame = {
    val pairs = imageNearDupPairs(spark, media, maxHamming, maxBucketSize)
      .select(col("id1"), col("id2"))
    val clusters = Dedup.clusterPairsStar(pairs)
    Dedup.keepBestPerCluster(media, "media_id", scoreCol, clusters)
  }

  /** REAL audio decode — no stub: `javax.sound.sampled` ships in the JDK,
    * so PCM WAV payloads decode without any external library (the same
    * pattern as [[decodeImage]]'s ImageIO move; video remains the one
    * stubbed codec, [[decodeBytes]]). Returns (sampleRate, channels,
    * frames, rms) or None for undecodable bytes. RMS pools all channels'
    * samples, normalized to [-1, 1] (16-bit signed /32768, 8-bit unsigned
    * biased /128) — the standard loudness proxy a filtering pipeline
    * thresholds on. */
  private[ops] def decodeWav(payload: Array[Byte]): Option[(Int, Int, Long, Double)] = {
    if (payload == null || payload.isEmpty) return None
    val ais =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      catch { case _: Exception => return None }
    try {
      val fmt = ais.getFormat
      val bits = fmt.getSampleSizeInBits
      val enc = fmt.getEncoding
      val ok = (enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED && bits == 16) ||
        (enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED && bits == 8)
      if (!ok) return None
      val frames = ais.getFrameLength
      val data = ais.readAllBytes()
      var sumSq = 0.0
      var n = 0L
      if (bits == 16) {
        var i = 0
        val le = !fmt.isBigEndian
        while (i + 1 < data.length) {
          val lo = data(i) & 0xff; val hi = data(i + 1) & 0xff
          val s = (if (le) (hi << 8) | lo else (lo << 8) | hi).toShort
          val x = s / 32768.0
          sumSq += x * x; n += 1
          i += 2
        }
      } else {
        var i = 0
        while (i < data.length) {
          val x = ((data(i) & 0xff) - 128) / 128.0
          sumSq += x * x; n += 1
          i += 1
        }
      }
      Some((fmt.getSampleRate.toInt, fmt.getChannels, frames,
        if (n == 0) 0.0 else math.sqrt(sumSq / n)))
    } catch { case _: Exception => None }
    finally ais.close()
  }

  /** Per-partition batched AUDIO decode: rows -> (media_id, sample_rate,
    * channels, duration_ms, rms_e6), nulls for undecodable payloads.
    * duration_ms and rms_e6 are integer-rounded so the values are stable
    * across engines and hashable by the oracle. */
  def extractAudioFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType),
      StructField("duration_ms", LongType),
      StructField("rms_e6", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          decodeWav(r.getAs[Array[Byte]](1)) match {
            case Some((rate, ch, frames, rms)) =>
              Row(r.getLong(0), rate, ch,
                math.round(1000.0 * frames / rate), math.round(rms * 1e6))
            case None => Row(r.getLong(0), null, null, null, null)
          }
        }
      }(enc)
  }

  /** Decodes a PCM WAV payload to raw integer samples (interleaved) —
    * shared parse for the signal-level extractors. Returns (sampleRate,
    * channels, frames, samples, fullScale) where samples are 16-bit
    * signed values or 8-bit values re-biased to signed (-128..127), and
    * fullScale is 32768 / 128 accordingly. */
  private[ops] def decodeWavSamples(
      payload: Array[Byte]): Option[(Int, Int, Long, Array[Int], Int)] = {
    if (payload == null || payload.isEmpty) return None
    val ais =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      catch { case _: Exception => return None }
    try {
      val fmt = ais.getFormat
      val bits = fmt.getSampleSizeInBits
      val enc = fmt.getEncoding
      val ok = (enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED && bits == 16) ||
        (enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED && bits == 8)
      if (!ok) return None
      val frames = ais.getFrameLength
      val data = ais.readAllBytes()
      val (samples, fullScale) =
        if (bits == 16) {
          val le = !fmt.isBigEndian
          val out = new Array[Int](data.length / 2)
          var i = 0
          while (i + 1 < data.length) {
            val lo = data(i) & 0xff; val hi = data(i + 1) & 0xff
            out(i / 2) = (if (le) (hi << 8) | lo else (lo << 8) | hi).toShort.toInt
            i += 2
          }
          (out, 32768)
        } else {
          (data.map(b => (b & 0xff) - 128), 128)
        }
      Some((fmt.getSampleRate.toInt, fmt.getChannels, frames, samples, fullScale))
    } catch { case _: Exception => None }
    finally ais.close()
  }

  /** Signal-level WAV stats — the three cheap gates an audio curation
    * pipeline applies before any expensive model:
    *
    *  - `zc_e6`: zero-crossing rate in ppm of consecutive same-channel
    *    sample pairs — a noisiness/voicing proxy (white noise ~500000,
    *    voiced speech far lower). A crossing is a sign-bit change
    *    (`(a < 0) != (b < 0)`), counted per channel over frame-adjacent
    *    samples; integer-exact, no float anywhere.
    *  - `silence_e6`: ppm of samples within 1% of full scale
    *    (|s| <= floor(0.01*FS): 327 for 16-bit, 1 for 8-bit) — the
    *    dead-air detector.
    *  - `peak_e6`: max |sample| / fullScale in ppm (floor) — clipping
    *    (~1e6) and too-quiet recordings in one number.
    *
    * Per-row mapPartitions decode, no shuffle; nulls for undecodable
    * payloads, zeros for zero-length audio. */
  def audioSignalStats(spark: SparkSession, media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("zc_e6", LongType),
      StructField("silence_e6", LongType),
      StructField("peak_e6", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          decodeWavSamples(r.getAs[Array[Byte]](1)) match {
            case Some((_, ch, frames, s, fs)) =>
              val silenceCut = fs / 100 // floor(0.01 * FS)
              var crossings = 0L; var silent = 0L; var maxAbs = 0L
              var i = 0
              while (i < s.length) {
                val v = s(i)
                if (math.abs(v) <= silenceCut) silent += 1
                if (math.abs(v.toLong) > maxAbs) maxAbs = math.abs(v.toLong)
                if (i >= ch && ((s(i - ch) < 0) != (v < 0))) crossings += 1
                i += 1
              }
              val pairs = if (frames < 2) 0L else (frames - 1) * ch
              Row(r.getLong(0),
                if (pairs == 0) 0L else 1000000L * crossings / pairs,
                if (s.length == 0) 0L else 1000000L * silent / s.length,
                1000000L * maxAbs / fs)
            case None => Row(r.getLong(0), null, null, null)
          }
        }
      }(enc)
  }

  /** 64-bit envelope-delta audio fingerprint — the audio twin of
    * [[dHash]]: the track's frames split into 65 equal windows, each
    * window's mean |amplitude| (all channels pooled) becomes one envelope
    * level, and bit i records whether level i+1 > level i. Comparing
    * ADJACENT windows (not absolute levels) makes the code invariant to
    * volume scaling and encoding headroom, exactly as dHash's
    * adjacent-pixel comparison survives brightness shifts. Tracks with
    * fewer than 65 frames carry no code (too short to fingerprint). */
  private[ops] def audioEnvelopeHash(payload: Array[Byte]): Option[Long] = {
    decodeWavSamples(payload).flatMap { case (_, ch, declaredFrames, s, _) =>
      val windows = 65
      // trust the bytes actually present, not the header's declared frame
      // count — a truncated payload would otherwise index past s.length
      val frames = if (ch <= 0) 0L else math.min(declaredFrames, s.length.toLong / ch)
      if (frames < windows || ch <= 0) None
      else {
        val env = new Array[Long](windows)
        var w = 0
        while (w < windows) {
          // frame range [lo, hi) for this window — exact integer split
          val lo = (frames * w / windows).toInt
          val hi = (frames * (w + 1) / windows).toInt
          var sum = 0L; var i = lo * ch; val end = hi * ch
          while (i < end) { sum += math.abs(s(i).toLong); i += 1 }
          val cnt = (hi - lo) * ch
          env(w) = if (cnt == 0) 0L else sum * 1000000L / cnt
          w += 1
        }
        var code = 0L; var b = 0
        while (b < 64) {
          if (env(b + 1) > env(b)) code |= (1L << b)
          b += 1
        }
        Some(code)
      }
    }
  }

  /** Per-payload envelope fingerprints: one mapPartitions decode pass, no
    * shuffle; null for undecodable or too-short audio. */
  def audioEnvelopeHashes(spark: SparkSession, media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("ahash", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          audioEnvelopeHash(r.getAs[Array[Byte]](1)) match {
            case Some(code) => Row(r.getLong(0), code)
            case None       => Row(r.getLong(0), null)
          }
        }
      }(enc)
  }

  /** AUDIO near-duplicate pairs via banded Hamming LSH over
    * [[audioEnvelopeHash]] codes — the re-upload / re-levelled-copy
    * detector, sharing [[imageNearDupPairs]]'s skeleton exactly: the
    * 64-bit code splits into four 16-bit bands (pigeonhole: <= 3
    * differing bits cannot touch all 4 bands, so recall is lossless at
    * `maxHamming <= 3`), candidates come from the capped bucket join,
    * and the verify is codegen'd `bit_count(xor)`. Decode cost is one
    * per-partition pass; the only exchanges carry (band, code, id) rows
    * and the candidate pairs. Returns (id1, id2, hamming), id1 < id2. */
  def audioNearDupPairs(spark: SparkSession, media: DataFrame,
      maxHamming: Int = 3, maxBucketSize: Int = 1000): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"banding guarantees recall only for maxHamming <= 3, got $maxHamming")
    val hashes = audioEnvelopeHashes(spark, media)
      .filter(col("ahash").isNotNull).localCheckpoint(true)
    val banded = hashes.select(col("media_id").as("id"), explode(array(
      struct(lit(0).as("band"), (col("ahash").bitwiseAND(0xffffL)).as("bh")),
      struct(lit(1).as("band"), shiftright(col("ahash"), 16).bitwiseAND(0xffffL).as("bh")),
      struct(lit(2).as("band"), shiftright(col("ahash"), 32).bitwiseAND(0xffffL).as("bh")),
      struct(lit(3).as("band"), shiftright(col("ahash"), 48).bitwiseAND(0xffffL).as("bh")))).as("b"))
      .select(col("id"), col("b.band").as("band"), col("b.bh").as("bh"))
    val pairs = Dedup.lshCandidatePairs(banded, maxBucketSize)
    val h1 = hashes.select(col("media_id").as("id1"), col("ahash").as("__a1"))
    val h2 = hashes.select(col("media_id").as("id2"), col("ahash").as("__a2"))
    pairs.join(h1, Seq("id1")).join(h2, Seq("id2"))
      .withColumn("hamming", bit_count(col("__a1").bitwiseXOR(col("__a2"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id1"), col("id2"), col("hamming").cast("long").as("hamming"))
  }

  /** Pure-Scala PCM WAV encoder (the 44-byte RIFF header is a public
    * format): 16-bit signed little-endian samples, interleaved when
    * `channels > 1`. Deliberately NOT javax.sound — fixtures encode here
    * and [[decodeWav]] decodes with the JDK stack, so the round trip
    * crosses two independent implementations. */
  def wavBytes(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(channels >= 1 && samples.length % channels == 0,
      "samples must be a whole number of interleaved frames")
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort)  // block align
      .putShort(16)                      // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Pure-Scala minimal AVI (RIFF) encoder for fixtures: one 'avih' main
    * header + a 'movi' list of pre-encoded JPEG frames ('00dc' chunks).
    * The AVI container layout is a public spec; fixtures encode HERE and
    * [[decodeAvi]] parses independently, with the embedded JPEG decoded
    * by the JDK's ImageIO — so the round trip crosses implementations at
    * the frame-codec boundary. */
  def aviBytes(width: Int, height: Int, microSecPerFrame: Int,
      jpegFrames: Seq[Array[Byte]]): Array[Byte] = {
    def chunk(fourcc: String, data: Array[Byte]): Array[Byte] = {
      val pad = data.length & 1
      val bb = java.nio.ByteBuffer.allocate(8 + data.length + pad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(fourcc.getBytes("US-ASCII")).putInt(data.length).put(data)
      bb.array()
    }
    def list(listType: String, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(12 + body.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("LIST".getBytes("US-ASCII")).putInt(4 + body.length)
        .put(listType.getBytes("US-ASCII")).put(body)
      bb.array()
    }
    val avih = {
      val bb = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(microSecPerFrame).putInt(0).putInt(0).putInt(0)
        .putInt(jpegFrames.size) // dwTotalFrames
        .putInt(0).putInt(1).putInt(0)
        .putInt(width).putInt(height)
      bb.array() // trailing reserved dwords stay zero
    }
    val hdrl = list("hdrl", chunk("avih", avih))
    val movi = list("movi", jpegFrames.flatMap(f => chunk("00dc", f)).toArray)
    val body = hdrl ++ movi
    val bb = java.nio.ByteBuffer.allocate(12 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + body.length)
      .put("AVI ".getBytes("US-ASCII")).put(body)
    bb.array()
  }

  /** REAL video decode — no stub: parses the AVI RIFF container (public
    * spec — 'avih' main header for geometry / frame count / frame
    * interval, 'movi' list for frame chunks) in pure Scala, then decodes
    * the FIRST keyframe ('00dc'/'00db', typically MJPEG) with the JDK's
    * ImageIO. Returns (width, height, totalFrames, microSecPerFrame,
    * firstFrameMeanLuma) or None for undecodable bytes. Codecs ImageIO
    * cannot read yield None luma but still surface container metadata —
    * at scale that is the normal triage split: container stats for every
    * file, pixel features where a frame codec exists. */
  /** Full RIFF walk: ('avih' header fields, every coded frame payload in
    * stream order). Shared by the header-level decode and the per-frame
    * fingerprint path. */
  private def aviParse(
      payload: Array[Byte],
      /** stop copying frame payloads after this many — the header-level
        * decode needs only the first frame, and copying every chunk of a
        * large video for it would double per-row memory in the decode
        * mapPartitions. */
      maxFrames: Int = Int.MaxValue): Option[(Option[(Int, Int, Long, Long)], Vector[Array[Byte]])] = {
    if (payload == null || payload.length < 12) return None
    def fourcc(pos: Int): String = new String(payload, pos, 4, "US-ASCII")
    def u32(pos: Int): Long =
      ((payload(pos) & 0xffL)) | ((payload(pos + 1) & 0xffL) << 8) |
        ((payload(pos + 2) & 0xffL) << 16) | ((payload(pos + 3) & 0xffL) << 24)
    try {
      if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return None
      var avih: Option[(Int, Int, Long, Long)] = None
      val frames = Vector.newBuilder[Array[Byte]]
      var nFrames = 0
      def walk(from: Int, until: Int): Unit = {
        var pos = from
        while (pos + 8 <= until) {
          val cc = fourcc(pos)
          val size = u32(pos + 4).toInt
          if (size < 0 || pos + 8 + size > until) return // malformed: stop
          if (cc == "LIST" && size >= 4) {
            val listType = fourcc(pos + 8)
            if (listType == "hdrl" || listType == "movi")
              walk(pos + 12, pos + 8 + size)
          } else if (cc == "avih" && size >= 40) {
            avih = Some((u32(pos + 8 + 32).toInt, u32(pos + 8 + 36).toInt,
              u32(pos + 8 + 16), u32(pos + 8)))
          } else if ((cc == "00dc" || cc == "00db") && size > 0 && nFrames < maxFrames) {
            frames += java.util.Arrays.copyOfRange(payload, pos + 8, pos + 8 + size)
            nFrames += 1
          }
          pos += 8 + size + (size & 1)
        }
      }
      walk(12, math.min(payload.length, 8 + u32(4).toInt))
      Some((avih, frames.result()))
    } catch { case _: Exception => None }
  }

  private[ops] def decodeAvi(
      payload: Array[Byte]): Option[(Int, Int, Long, Long, Option[Double])] =
    aviParse(payload, maxFrames = 1).flatMap { case (avih, frames) =>
      avih.map { case (w, h, n, uspf) =>
        (w, h, n, uspf, frames.headOption.flatMap(decodeImage).map(_._3))
      }
    }

  /** Every `everyK`-th coded frame payload with its stream index; None
    * for undecodable containers. */
  private[ops] def decodeAviFrames(
      payload: Array[Byte], everyK: Int = 1): Option[Seq[(Int, Array[Byte])]] =
    aviParse(payload).map(_._2.zipWithIndex.collect {
      case (b, i) if i % everyK == 0 => (i, b)
    })

  /** Per-partition batched VIDEO decode: rows -> (media_id, width,
    * height, n_frames, fps_e3, first_frame_luma), nulls for undecodable
    * payloads. fps_e3 = round(1e9 / microSecPerFrame) — integer so the
    * container metadata is oracle-hashable; luma is the pixel-level
    * feature (spec-checked against a direct ImageIO decode). */
  def extractVideoFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", LongType),
      StructField("fps_e3", LongType),
      StructField("first_frame_luma", DoubleType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          decodeAvi(r.getAs[Array[Byte]](1)) match {
            case Some((w, h, frames, uspf, luma)) =>
              Row(r.getLong(0), w, h, frames,
                if (uspf > 0) Long.box(math.round(1e9 / uspf)) else null,
                luma.map(Double.box).orNull)
            case None => Row(r.getLong(0), null, null, null, null, null)
          }
        }
      }(enc)
  }

  /** Per-frame perceptual fingerprints: (media_id, frame_idx, dhash_lo,
    * dhash_hi) for every `everyK`-th coded frame that decodes — the
    * video-side [[imageDHashes]]. One mapPartitions pass, no shuffle;
    * undecodable containers and frames contribute nothing (flatMap, not
    * nulls: a video is its surviving frame set). */
  def videoFrameHashes(spark: SparkSession, media: DataFrame,
      everyK: Int = 1): DataFrame = {
    require(everyK >= 1, s"everyK must be >= 1, got $everyK")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("dhash_lo", LongType),
      StructField("dhash_hi", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          decodeAviFrames(r.getAs[Array[Byte]](1), everyK).toSeq.flatMap(_.flatMap {
            case (idx, frame) => dHash(frame).map { case (lo, hi) => Row(id, idx, lo, hi) }
          })
        }
      }(enc)
  }

  /** VIDEO near-duplicate pairs by shared frame fingerprints — the
    * re-upload/re-mux detector: two videos link when the distinct frame
    * dHashes they share cover `minOverlapPpm` of the SMALLER video's
    * distinct-frame set (containment, so a clip inside a longer cut
    * still links). Candidates come from an equi-join keyed by the exact
    * 64-bit fingerprint — at corpus scale that is one keyed shuffle of
    * (hash, id) rows, never all-pairs — with a hot-frame cap dropping
    * fingerprints shared by more than `maxBucketSize` videos (black
    * frames, standard intro cards: the text path's boilerplate-bucket
    * trade, same knob). Frame sampling (`everyK`) scales the per-video
    * cost; exact-hash matching is robust to remuxing (identical coded
    * frames), while re-encoded uploads pair via [[imageNearDupPairs]]'s
    * banded-Hamming machinery on keyframes if needed.
    * Returns (id1, id2, overlap_ppm), id1 < id2. */
  def videoNearDupPairs(spark: SparkSession, media: DataFrame,
      everyK: Int = 1, minOverlapPpm: Long = 400000L,
      maxBucketSize: Int = 1000): DataFrame = {
    val hashes = videoFrameHashes(spark, media, everyK)
      .select(col("media_id"), col("dhash_lo"), col("dhash_hi")).distinct()
      .localCheckpoint(true)
    val sizes = hashes.groupBy(col("media_id")).agg(count(lit(1)).as("n"))
    // skew-immune cap: grouped count -> tiny over-cap hash list -> broadcast
    // anti join drops hot rows map-side (see Dedup.dropHotBuckets)
    val capped = Dedup.dropHotBuckets(hashes, Seq("dhash_lo", "dhash_hi"), maxBucketSize)
    val shared = capped.select(col("media_id").as("id1"), col("dhash_lo"), col("dhash_hi"))
      .join(capped.select(col("media_id").as("id2"), col("dhash_lo"), col("dhash_hi")),
        Seq("dhash_lo", "dhash_hi"))
      .filter(col("id1") < col("id2"))
      .groupBy(col("id1"), col("id2")).agg(count(lit(1)).as("__shared"))
    shared
      .join(sizes.select(col("media_id").as("id1"), col("n").as("__n1")), Seq("id1"))
      .join(sizes.select(col("media_id").as("id2"), col("n").as("__n2")), Seq("id2"))
      .withColumn("overlap_ppm",
        lit(1000000L) * col("__shared") / least(col("__n1"), col("__n2")))
      .filter(col("overlap_ppm") >= minOverlapPpm)
      .select(col("id1"), col("id2"), col("overlap_ppm").cast("long").as("overlap_ppm"))
  }

  /** "Frame sampling" stub: every k-th byte window of the payload — the
    * partition-preserving slice shape of real video frame extraction. */
  def sampleFrames(media: DataFrame, frameBytes: Int = 16, everyK: Int = 4): DataFrame =
    media.select(col("media_id"), col("meta"),
      posexplode(expr(
        s"transform(sequence(0, greatest(cast(meta.n_bytes as int) div ($frameBytes * $everyK) - 1, 0)), " +
          s"i -> substring(payload, i * $frameBytes * $everyK + 1, $frameBytes))"))
        .as(Seq("frame_idx", "frame_bytes")))
}
