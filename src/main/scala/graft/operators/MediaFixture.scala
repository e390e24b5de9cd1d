package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** Deterministic REAL media binaries for the multimodal oracle gate
  * (VERDICT r6 "Next round" #7: the driver testdata has no binary column,
  * so the engine ships its own fixture). Every builder emits structurally
  * valid container bytes — PNG signature+IHDR, JPEG SOI/APPn/SOFn, GIF
  * screen descriptor, RIFF/WAVE fmt+data, ISO-BMFF ftyp+moov/mvhd — so the
  * q102 query exercises the real header decoders end-to-end through a
  * parquet binary-column roundtrip, not the ASCII stub path q44 covers.
  * Corrupt/truncated rows pin the rejection paths (including the short-mvhd
  * bounds check).
  *
  * Expected decode results are fully determined by the construction
  * parameters below; the q102 oracle is the literal table of those values.
  */
object MediaFixture {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  /** PNG: 8-byte signature + IHDR chunk (len 13) with the given dims. */
  def png(w: Int, h: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(33).order(ByteOrder.BIG_ENDIAN)
    bb.put(bytes(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a))
    bb.putInt(13); bb.put("IHDR".getBytes("US-ASCII"))
    bb.putInt(w); bb.putInt(h)
    bb.put(bytes(8, 6, 0, 0, 0)) // depth 8, RGBA, deflate, adaptive, none
    bb.putInt(0x1f15c489) // CRC not validated by the header decoder
    bb.array()
  }

  /** JPEG: SOI, APP0 (skipped), SOF0 or SOF2 frame header with dims. */
  def jpeg(w: Int, h: Int, progressive: Boolean = false): Array[Byte] = {
    val sof = if (progressive) 0xc2 else 0xc0
    bytes(0xff, 0xd8, 0xff, 0xe0, 0x00, 0x04, 0x00, 0x00,
      0xff, sof, 0x00, 0x11, 0x08,
      (h >> 8) & 0xff, h & 0xff, (w >> 8) & 0xff, w & 0xff,
      0x03, 0x01, 0x22, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01)
  }

  /** GIF89a logical screen descriptor (little-endian dims). */
  def gif(w: Int, h: Int): Array[Byte] =
    "GIF89a".getBytes("US-ASCII") ++
      bytes(w & 0xff, (w >> 8) & 0xff, h & 0xff, (h >> 8) & 0xff, 0x00, 0x00, 0x00)

  /** RIFF/WAVE with PCM fmt chunk + data chunk (and optionally an odd-sized
    * LIST chunk to exercise word alignment).
    */
  def wav(ch: Int, rate: Int, bits: Int, nSamples: Int,
      extraChunk: Boolean = false): Array[Byte] = {
    val ba = ch * bits / 8
    val dataLen = nSamples * ba
    val bb = ByteBuffer.allocate(200 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(0); bb.put("WAVE".getBytes)
    if (extraChunk) { bb.put("LIST".getBytes); bb.putInt(5); bb.put(bytes(1, 2, 3, 4, 5, 0)) }
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1.toShort); bb.putShort(ch.toShort); bb.putInt(rate)
    bb.putInt(rate * ba); bb.putShort(ba.toShort); bb.putShort(bits.toShort)
    bb.put("data".getBytes); bb.putInt(dataLen)
    bb.put(new Array[Byte](dataLen))
    java.util.Arrays.copyOf(bb.array(), bb.position())
  }

  /** ISO-BMFF: ftyp(major brand) + moov(mvhd v0|v1) with standard box
    * sizes (mvhd v0 = 108 bytes, v1 = 120 bytes).
    */
  def mp4(brand: String, timescale: Long, duration: Long,
      version: Int = 0): Array[Byte] = {
    require(brand.length == 4)
    val mvhdSize = if (version == 0) 108 else 120
    val bb = ByteBuffer.allocate(16 + 8 + mvhdSize).order(ByteOrder.BIG_ENDIAN)
    bb.putInt(16); bb.put("ftyp".getBytes("US-ASCII"))
    bb.put(brand.getBytes("US-ASCII")); bb.putInt(0) // minor version
    bb.putInt(8 + mvhdSize); bb.put("moov".getBytes("US-ASCII"))
    bb.putInt(mvhdSize); bb.put("mvhd".getBytes("US-ASCII"))
    bb.putInt(version << 24) // version + flags
    if (version == 0) {
      bb.putInt(0); bb.putInt(0) // ctime, mtime
      bb.putInt(timescale.toInt); bb.putInt(duration.toInt)
    } else {
      bb.putLong(0L); bb.putLong(0L)
      bb.putInt(timescale.toInt); bb.putLong(duration)
    }
    bb.putInt(0x00010000); bb.putShort(0x0100.toShort); bb.putShort(0) // rate, volume, reserved
    bb.put(new Array[Byte](8 + 36 + 24)) // reserved, matrix, pre_defined
    bb.putInt(1) // next_track_ID
    bb.array()
  }

  /** ftyp + moov whose mvhd claims csize=20 — too short for v0 fields; the
    * decoder must reject it (bounds are the box's OWN size, not moov's).
    */
  def mp4ShortMvhd: Array[Byte] = {
    val bb = ByteBuffer.allocate(16 + 8 + 20).order(ByteOrder.BIG_ENDIAN)
    bb.putInt(16); bb.put("ftyp".getBytes("US-ASCII"))
    bb.put("isom".getBytes("US-ASCII")); bb.putInt(0)
    bb.putInt(28); bb.put("moov".getBytes("US-ASCII"))
    bb.putInt(20); bb.put("mvhd".getBytes("US-ASCII"))
    bb.putInt(0); bb.putInt(600); bb.putInt(1200) // version, then junk the decoder must not read as fields
    bb.array()
  }

  /** The fixture: (id, bytes). ids 1–9 decode; 10–15 must reject. */
  def rows: Seq[(Long, Array[Byte])] = Seq(
    1L -> png(1, 1),
    2L -> png(640, 480),
    3L -> jpeg(3, 2),
    4L -> jpeg(400, 300, progressive = true),
    5L -> gif(7, 5),
    6L -> wav(2, 44100, 16, 1000),
    7L -> wav(1, 16000, 8, 320, extraChunk = true),
    8L -> mp4("isom", 600L, 1200L, version = 0),
    9L -> mp4("mp42", 90000L, 450000L, version = 1),
    10L -> png(1, 1).take(20), // cut mid-IHDR
    11L -> "plain ascii text, not a media container".getBytes("US-ASCII"),
    12L -> Array.emptyByteArray,
    13L -> bytes(0xff, 0xd8, 0xff, 0xe0, 0x00, 0x04, 0x41, 0x41), // JPEG, no SOF
    14L -> wav(2, 44100, 16, 100).take(20),
    15L -> mp4ShortMvhd)
}
