package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pins the MediaFixture construction parameters to the decoder outputs the
  * q102 oracle hard-codes — if a builder or decoder drifts, this fails
  * before the driver gate does.
  */
class MediaFixtureSpec extends AnyFunSuite {

  test("fixture rows decode to exactly the q102 oracle values") {
    val byId = MediaFixture.rows.toMap
    assert(Multimodal.decodeImageHeader(byId(1L)).contains(("png", 1, 1)))
    assert(Multimodal.decodeImageHeader(byId(2L)).contains(("png", 640, 480)))
    assert(Multimodal.decodeImageHeader(byId(3L)).contains(("jpg", 3, 2)))
    assert(Multimodal.decodeImageHeader(byId(4L)).contains(("jpg", 400, 300)))
    assert(Multimodal.decodeImageHeader(byId(5L)).contains(("gif", 7, 5)))
    assert(Multimodal.decodeWavHeader(byId(6L)).contains((2, 44100, 16, 1000L)))
    assert(Multimodal.decodeWavHeader(byId(7L)).contains((1, 16000, 8, 320L)))
    assert(Multimodal.decodeMp4Header(byId(8L)).contains(("isom", 600L, 1200L)))
    assert(Multimodal.decodeMp4Header(byId(9L)).contains(("mp42", 90000L, 450000L)))
    for (id <- 10L to 15L) {
      assert(Multimodal.decodeImageHeader(byId(id)).isEmpty, s"id=$id image")
      assert(Multimodal.decodeWavHeader(byId(id)).isEmpty, s"id=$id wav")
      assert(Multimodal.decodeMp4Header(byId(id)).isEmpty, s"id=$id mp4")
    }
  }

  test("fixture media binaries are structurally standard sizes") {
    val byId = MediaFixture.rows.toMap
    assert(byId(1L).length == 33) // PNG signature + IHDR chunk
    assert(byId(8L).length == 16 + 8 + 108) // ftyp + moov(mvhd v0)
    assert(byId(9L).length == 16 + 8 + 120) // ftyp + moov(mvhd v1)
  }
}
