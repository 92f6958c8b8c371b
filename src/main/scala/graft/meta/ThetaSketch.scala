package graft.meta

import java.nio.{ByteBuffer, ByteOrder}

/** KMV theta sketch for distinct-value estimation, serialized in the
  * Apache DataSketches COMPACT ordered format — the payload of Iceberg's
  * `apache-datasketches-theta-v1` statistics blob (Puffin spec), which is
  * what external engines' CBOs read for NDV on Iceberg tables.
  *
  * Math: values hash through MurmurHash3 x64-128 (seed 9001, the
  * DataSketches default) over Iceberg's single-value binary encoding
  * (ints promoted to long little-endian, strings as UTF-8, decimals as
  * the minimal big-endian two's complement of the unscaled value — the
  * same encoding [[graft.functions.IcebergBucketUtil]] hashes for the
  * bucket transform). The sketch keeps the `nominal` smallest distinct
  * 63-bit hashes; below saturation the estimate is EXACT (retained
  * count), above it `retained / (theta / 2^63)`. Unions take the min
  * theta and re-shrink — the classic KMV estimator, which is the theta
  * sketch's estimation mode.
  *
  * Serialization follows the published compact-sketch layout (serial
  * version 3, family 3): 1 preamble long when empty, 2 in exact mode
  * (retained count at bytes 8-11), 3 in estimation mode (thetaLong at
  * long 2), then the retained hashes ascending. Blob READERS should
  * treat the `ndv` blob property as authoritative (Iceberg's own stats
  * handler and Trino do exactly that); the sketch bytes carry the
  * mergeable form. */
final class ThetaSketch private (
    val nominal: Int,
    private var thetaLong: Long,
    private val retained: java.util.TreeSet[java.lang.Long]) {

  def update(hash: Long): Unit = {
    val h = hash >>> 1 // 63-bit positive, 0 excluded below
    if (h != 0L && h < thetaLong && retained.add(h) && retained.size > nominal) {
      // saturated: the largest retained hash becomes the exclusive bound
      thetaLong = retained.pollLast()
    }
  }

  def updateBytes(v: Array[Byte]): Unit = update(ThetaSketch.hash128(v)._1)
  def updateLong(v: Long): Unit = {
    val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(v)
    updateBytes(b.array())
  }
  def updateString(v: String): Unit =
    updateBytes(v.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  def isEmpty: Boolean = retained.isEmpty && thetaLong == ThetaSketch.MaxTheta
  def retainedCount: Int = retained.size

  /** Distinct-value estimate: exact below saturation. */
  def estimate: Long =
    if (thetaLong == ThetaSketch.MaxTheta) retained.size.toLong
    else math.round(retained.size.toDouble / (thetaLong.toDouble / ThetaSketch.MaxTheta))

  def merge(other: ThetaSketch): ThetaSketch = {
    val out = ThetaSketch.empty(math.min(nominal, other.nominal))
    out.thetaLong = math.min(thetaLong, other.thetaLong)
    val it = retained.iterator(); while (it.hasNext) { val h = it.next(); if (h < out.thetaLong) out.retained.add(h) }
    val it2 = other.retained.iterator(); while (it2.hasNext) { val h = it2.next(); if (h < out.thetaLong) out.retained.add(h) }
    while (out.retained.size > out.nominal) out.thetaLong = out.retained.pollLast()
    out
  }

  /** Compact ordered serialization (DataSketches serial v3, family 3). */
  def serialize: Array[Byte] = {
    val flagsByte: Int = // BIG_ENDIAN=0 unset | READ_ONLY | EMPTY? | COMPACT | ORDERED
      0x02 | (if (isEmpty) 0x04 else 0) | 0x08 | 0x10
    val preLongs = if (isEmpty) 1 else if (thetaLong == ThetaSketch.MaxTheta) 2 else 3
    val buf = ByteBuffer.allocate(preLongs * 8 + retained.size * 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put(preLongs.toByte)
    buf.put(3.toByte) // serial version
    buf.put(3.toByte) // family: COMPACT
    buf.put(0.toByte); buf.put(0.toByte) // unused lg sizes in compact form
    buf.put(flagsByte.toByte)
    buf.putShort(ThetaSketch.SeedHash)
    if (preLongs >= 2) { buf.putInt(retained.size); buf.putInt(0) }
    if (preLongs >= 3) buf.putLong(thetaLong)
    val it = retained.iterator(); while (it.hasNext) buf.putLong(it.next())
    buf.array()
  }
}

object ThetaSketch {
  val MaxTheta: Long = Long.MaxValue
  val DefaultNominal: Int = 4096
  val DefaultSeed: Long = 9001L

  /** DataSketches seed hash: murmur of the seed itself (seed 0), low 16
    * bits — stored in the preamble so mismatched seeds refuse to merge. */
  val SeedHash: Short = {
    val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(DefaultSeed)
    (hash128(b.array(), 0L)._1 & 0xFFFFL).toShort
  }

  def empty(nominal: Int = DefaultNominal): ThetaSketch =
    new ThetaSketch(nominal, MaxTheta, new java.util.TreeSet[java.lang.Long]())

  def deserialize(bytes: Array[Byte]): ThetaSketch = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val preLongs = buf.get().toInt
    val serVer = buf.get().toInt
    val family = buf.get().toInt
    require(serVer == 3 && family == 3,
      s"not a compact theta sketch (serVer=$serVer family=$family)")
    buf.get(); buf.get()
    val flags = buf.get().toInt
    val seedHash = buf.getShort()
    require(seedHash == SeedHash, s"seed-hash mismatch: $seedHash != $SeedHash")
    val out = empty()
    if ((flags & 0x04) != 0 || preLongs == 1) return out
    val n = buf.getInt(); buf.getInt()
    out.thetaLong = if (preLongs >= 3) buf.getLong() else MaxTheta
    var i = 0
    while (i < n) { out.retained.add(buf.getLong()); i += 1 }
    out
  }

  /** MurmurHash3 x64-128 (public algorithm; DataSketches hashes with
    * seed 9001). Returns (h1, h2). */
  def hash128(data: Array[Byte], seed: Long = DefaultSeed): (Long, Long) = {
    val c1 = 0x87c37b91114253d5L
    val c2 = 0x4cf5ad432745937fL
    var h1 = seed
    var h2 = seed
    val nBlocks = data.length / 16
    val bb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < nBlocks) {
      var k1 = bb.getLong(i * 16)
      var k2 = bb.getLong(i * 16 + 8)
      k1 *= c1; k1 = java.lang.Long.rotateLeft(k1, 31); k1 *= c2; h1 ^= k1
      h1 = java.lang.Long.rotateLeft(h1, 27); h1 += h2; h1 = h1 * 5 + 0x52dce729L
      k2 *= c2; k2 = java.lang.Long.rotateLeft(k2, 33); k2 *= c1; h2 ^= k2
      h2 = java.lang.Long.rotateLeft(h2, 31); h2 += h1; h2 = h2 * 5 + 0x38495ab5L
      i += 1
    }
    var k1 = 0L
    var k2 = 0L
    val tail = nBlocks * 16
    val rem = data.length & 15
    if (rem > 8) {
      var j = rem - 1
      while (j >= 8) { k2 = (k2 << 8) | (data(tail + j) & 0xffL); j -= 1 }
      k2 *= c2; k2 = java.lang.Long.rotateLeft(k2, 33); k2 *= c1; h2 ^= k2
    }
    if (rem > 0) {
      var j = math.min(rem, 8) - 1
      while (j >= 0) { k1 = (k1 << 8) | (data(tail + j) & 0xffL); j -= 1 }
      k1 *= c1; k1 = java.lang.Long.rotateLeft(k1, 31); k1 *= c2; h1 ^= k1
    }
    h1 ^= data.length.toLong; h2 ^= data.length.toLong
    h1 += h2; h2 += h1
    h1 = fmix64(h1); h2 = fmix64(h2)
    h1 += h2; h2 += h1
    (h1, h2)
  }

  private def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }
}
