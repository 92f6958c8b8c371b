package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** extractFeatures' magic-byte dispatch: each modality's payload routes
  * to its REAL decoder (tag + decoded values), unknown bytes take the
  * byte-stat fallback, and a payload that LOOKS like a codec but fails
  * to parse falls back instead of dropping. Pins the m2 path per
  * modality — the oracle covers only the fallback branch (text). */
class MediaDispatchSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def mediaRow(id: Long, payload: Array[Byte]) = {
    import spark.implicits._
    Seq((id, payload)).toDF("media_id", "payload")
  }

  private def featuresOf(payload: Array[Byte]): Seq[Double] =
    Multimodal.extractFeatures(spark, mediaRow(1L, payload))
      .head().getSeq[Double](1)

  test("BMP payload routes to the image decoder: tag, size, exact luma") {
    // constant gray 77 -> mean luma exactly 77 under Rec.601 on gray
    val bmp = Multimodal.grayBmpBytes(16, 12, (_, _) => 77)
    val f = featuresOf(bmp)
    assert(f(0) == Multimodal.TagImage)
    assert(f(1) == 16.0 && f(2) == 12.0)
    assert(math.abs(f(3) - 77.0) < 1e-9)
  }

  test("WAV payload routes to the audio decoder: tag, rate, channels, frames") {
    val samples = Array.tabulate(800)(i => (1000 * math.sin(i / 10.0)).toShort)
    val wav = Multimodal.wavBytes(8000, 1, samples)
    val f = featuresOf(wav)
    assert(f(0) == Multimodal.TagWav)
    assert(f(1) == 8000.0 && f(2) == 1.0 && f(3) == 800.0)
    assert(f(4) > 0.0 && f(4) < 1.0) // rms of a bounded sine
  }

  test("AVI payload routes to the container parser: tag, geometry, frame count") {
    def frame: Array[Byte] = {
      val img = new java.awt.image.BufferedImage(9, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val avi = Multimodal.aviBytes(9, 8, 40000, Seq(frame, frame, frame))
    val f = featuresOf(avi)
    assert(f(0) == Multimodal.TagAvi)
    assert(f(1) == 9.0 && f(2) == 8.0 && f(3) == 3.0 && f(4) == 40000.0)
  }

  test("unknown bytes and corrupt codec headers take the byte-stat fallback") {
    val text = "just some document text".getBytes("UTF-8")
    val ft = featuresOf(text)
    assert(ft(0) == Multimodal.TagBytes)
    assert(ft(1) == text.length.toDouble)
    assert(ft(2) == text.map(_ & 0xff).sum.toDouble / text.length)

    // JPEG magic followed by garbage: dispatch tries ImageIO, decode
    // fails, and the row must survive on the fallback branch
    val fakeJpeg = Array[Byte](0xff.toByte, 0xd8.toByte) ++
      Array.fill[Byte](64)(0x41)
    val fj = featuresOf(fakeJpeg)
    assert(fj(0) == Multimodal.TagBytes)
    assert(fj(1) == fakeJpeg.length.toDouble)

    // "RIFF....WAVE" framing with no parsable fmt chunk: same fallback
    val fakeWav = "RIFF0000WAVEgarbagegarbage".getBytes("US-ASCII")
    assert(featuresOf(fakeWav)(0) == Multimodal.TagBytes)
  }
}
