package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the codec facade itself (the mm_* oracle verifies
  * it end-to-end through Spark; these pin the per-row contracts the
  * oracle formulas rely on, with real decoder round-trips). */
class MediaCodecSpec extends AnyFunSuite {

  private def bytes(n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((i * 37 + 11) % 251).toByte)

  test("image decode round-trips the generated dimensions through a real PNG parse") {
    for (n <- Seq(1, 17, 100, 577, 1234)) {
      val m = MediaCodec.decode(MediaFile(n.toLong, "image", bytes(n)))
      assert(m.width == (64 + n % 577) && m.height == (64 + (n * 31) % 449),
        s"len=$n decoded ${m.width}x${m.height}")
      assert(m.channels == 1 && m.durationMs == 0L && m.byteLen == n)
    }
  }

  test("audio decode reports PCM16 mono duration from the real WAV parser") {
    for (n <- Seq(2, 15, 16000, 48001)) {
      val m = MediaCodec.decode(MediaFile(n.toLong, "audio", bytes(n)))
      // frames = len div 2 (odd trailing byte dropped), 8 kHz mono.
      assert(m.durationMs == (n / 2) * 1000L / 8000L, s"len=$n -> ${m.durationMs}")
      assert(m.channels == 1 && m.width == 0 && m.height == 0)
    }
  }

  test("resize preserves aspect ratio into the box and reports actual raster dims") {
    for (n <- Seq(33, 600, 2048)) {
      val (meta, ow, oh) = MediaCodec.resizeImage(MediaFile(n.toLong, "image", bytes(n)), 256)
      val mx = math.max(meta.width, meta.height)
      assert(ow == meta.width * 256 / mx && oh == meta.height * 256 / mx)
      assert(math.max(ow, oh) == 256) // longest side fills the box exactly
    }
  }

  test("video stays the documented stub (deterministic arithmetic)") {
    val m = MediaCodec.decode(MediaFile(9L, "video", bytes(500)))
    assert(m.width == 64 + 500 % 577 && m.channels == 3 && m.durationMs == 4000L)
    val frames = MediaCodec.sampleFrames(m)
    assert(frames.size == 5 && frames.map(_._2) == (0L until 5L))
  }
}
