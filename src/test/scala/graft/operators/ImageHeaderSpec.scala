package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Real image-container header decode (VERDICT r2 "Next round" #9): PNG
  * IHDR, JPEG SOFn, GIF screen descriptor, parsed from raw bytes with no
  * codec; everything non-image falls back to the deterministic stub so the
  * q44 oracle (ASCII payloads — never a valid image signature) is unchanged.
  */
class ImageHeaderSpec extends AnyFunSuite {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  // 1×1 RGBA PNG: signature, IHDR length 13, "IHDR", w=1, h=1, bit depth 8,
  // color type 6, then compression/filter/interlace + CRC (unchecked).
  private val png1x1 = bytes(
    0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a,
    0x00, 0x00, 0x00, 0x0d, 0x49, 0x48, 0x44, 0x52,
    0x00, 0x00, 0x00, 0x01, 0x00, 0x00, 0x00, 0x01,
    0x08, 0x06, 0x00, 0x00, 0x00, 0x1f, 0x15, 0xc4, 0x89)

  // SOI, APP0 (len 4, payload skipped), SOF0: len 17, precision 8,
  // height 2, width 3, 3 components.
  private val jpeg3x2 = bytes(
    0xff, 0xd8, 0xff, 0xe0, 0x00, 0x04, 0x00, 0x00,
    0xff, 0xc0, 0x00, 0x11, 0x08, 0x00, 0x02, 0x00, 0x03,
    0x03, 0x01, 0x22, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01)

  // GIF89a, logical screen 7×5 (little-endian u16).
  private val gif7x5 = bytes(
    'G', 'I', 'F', '8', '9', 'a', 0x07, 0x00, 0x05, 0x00, 0x00, 0x00, 0x00)

  test("decodeImageHeader parses PNG IHDR, JPEG SOF0, GIF screen descriptor") {
    assert(Multimodal.decodeImageHeader(png1x1).contains(("png", 1, 1)))
    assert(Multimodal.decodeImageHeader(jpeg3x2).contains(("jpg", 3, 2)))
    assert(Multimodal.decodeImageHeader(gif7x5).contains(("gif", 7, 5)))
  }

  test("decodeImageHeader finds SOF behind standalone markers and fill bytes") {
    // SOI, fill byte before RST-style standalone marker, then SOF2
    // (progressive), height 300, width 400.
    val b = bytes(0xff, 0xd8, 0xff, 0xff, 0x01,
      0xff, 0xc2, 0x00, 0x11, 0x08, 0x01, 0x2c, 0x01, 0x90, 0x03)
    assert(Multimodal.decodeImageHeader(b).contains(("jpg", 400, 300)))
  }

  test("decodeImageHeader rejects truncated, desynced, and non-image bytes") {
    assert(Multimodal.decodeImageHeader(null).isEmpty)
    assert(Multimodal.decodeImageHeader(Array.emptyByteArray).isEmpty)
    assert(Multimodal.decodeImageHeader(png1x1.take(20)).isEmpty) // cut mid-IHDR
    assert(Multimodal.decodeImageHeader(bytes(0xff, 0xd8, 0xff, 0xe0, 0x00, 0x04, 0x41, 0x41)).isEmpty) // JPEG, no SOF
    assert(Multimodal.decodeImageHeader("GIF8 not really".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeImageHeader("plain ascii text".getBytes("UTF-8")).isEmpty)
    // DHT (0xC4) must not be read as a frame header
    assert(Multimodal.decodeImageHeader(
      bytes(0xff, 0xd8, 0xff, 0xc4, 0x00, 0x08, 0x08, 0x00, 0x02, 0x00, 0x03, 0x00)).isEmpty)
  }

  test("extractFeatures routes image bytes to the real header, text to the stub") {
    val spark = TestSpark.spark
    import spark.implicits._
    val d = Seq(
      (1L, png1x1),
      (2L, jpeg3x2),
      (3L, "hello".getBytes("UTF-8"))).toDF("doc_id", "media")
    val r = Multimodal.extractFeatures(d, "doc_id", "media").collect()
      .map(f => f.id -> f).toMap
    assert(r(1L).fmt == "png" && r(1L).width == 1 && r(1L).height == 1 && r(1L).n_frames == 1)
    assert(r(2L).fmt == "jpg" && r(2L).width == 3 && r(2L).height == 2 && r(2L).n_frames == 1)
    // stub path unchanged: strlen-derived fake dims (q44 oracle semantics)
    val n = "hello".length
    assert(r(3L).width == 1 + n % 64 && r(3L).height == 1 + (n * 7) % 64)
  }

  test("planImagePatches: ceil grid, exact-fit padding zero, non-image nulls") {
    import TestSpark.spark.implicits._
    val d = Seq(
      (1L, png1x1),             // 1x1 -> 1 patch, pad 3,3 at patch=4
      (2L, jpeg3x2),            // 3x2 -> 1 patch, pad 1,2
      (3L, "nope".getBytes)).toDF("doc_id", "media")
    val r = Multimodal.planImagePatches(d, "doc_id", "media", patch = 4)
      .orderBy("id").collect()
    assert(r(0).getInt(4) == 1 && r(0).getLong(6) == 1L &&
      r(0).getInt(7) == 3 && r(0).getInt(8) == 3)
    assert(r(1).getInt(7) == 1 && r(1).getInt(8) == 2)
    assert(r(2).isNullAt(1) && r(2).isNullAt(6))
  }
}
