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

  test("block sums read the exact generated pixels back off the decoded raster") {
    // Generator contract: payload bytes fill raster row 0 (truncated at
    // w), all other pixels 0 — so the total over all blocks must equal
    // the sum of the first min(w, len) payload bytes, every block
    // outside grid row 0 must be empty, and each row-0 block must sum
    // exactly its column range. PNG 8-bit grayscale is lossless; any
    // diff means the decode path stopped being pixel-exact.
    for (n <- Seq(17, 100, 577, 1234)) {
      val payload = bytes(n)
      val (w, h, sums) = MediaCodec.grayBlockSums(
        MediaFile(n.toLong, "image", payload), 8)
      assert(w == 64 + n % 577 && h == 64 + (n * 31) % 449)
      val expTotal = payload.take(math.min(w, n)).map(_ & 0xff).map(_.toLong).sum
      assert(sums.sum == expTotal, s"len=$n total")
      for (j <- 1 until 8; i <- 0 until 8)
        assert(sums(j * 8 + i) == 0L, s"len=$n block($i,$j) nonzero")
      for (i <- 0 until 8) {
        val cLo = i * w / 8; val cHi = (i + 1) * w / 8
        val exp = (cLo until math.min(cHi, n)).map(x => (payload(x) & 0xff).toLong).sum
        assert(sums(i) == exp, s"len=$n block($i,0)")
      }
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

  test("JPEG container round-trips header dims and grayscale model through a real parse") {
    for (n <- Seq(1, 17, 100, 577, 1234)) {
      val jpg = MediaCodec.containerFor(MediaFile(n.toLong, "jpeg", bytes(n)))
      // SOI + segment marker: FF D8 FF — the binary magic the ingest
      // sniffer dispatches on.
      assert((jpg(0) & 0xff) == 0xff && (jpg(1) & 0xff) == 0xd8 &&
        (jpg(2) & 0xff) == 0xff)
      val (magic, w, h, ch, nf, dur) = MediaCodec.parseContainer(jpg)
      // Lossy format: only HEADER promises — exact dims, 1-component
      // grayscale, single frame. (Pixel round-trips are PNG-only.)
      assert(magic == "JPEG" && w == 64 + n % 577 && h == 64 + (n * 31) % 449)
      assert(ch == 1 && nf == 1L && dur == 0L)
    }
  }

  test("video decode round-trips frame count, dims and timing through a real GIF parse") {
    for (n <- Seq(47, 250, 500, 1234)) {
      val m = MediaCodec.decode(MediaFile(9L, "video", bytes(n)))
      val nf = math.min(5, n / 100 + 1)
      assert(m.width == 64 + n % 577 && m.height == 64 + (n * 31) % 449,
        s"len=$n decoded ${m.width}x${m.height}")
      // 3 components: the decoded GIF palette's RGB color model.
      assert(m.channels == 3)
      // duration = frames x per-frame GCE delay, read back from metadata.
      assert(m.durationMs == nf.toLong * (n % 100 + 1) * 10, s"len=$n -> ${m.durationMs}")
    }
  }

  test("frame sampling decodes every GIF frame: dims, delay, and payload pixel") {
    val n = 500
    val p = bytes(n)
    val frames = MediaCodec.sampleFrames(MediaFile(9L, "video", p))
    assert(frames.size == 5 && frames.map(_._2) == (0L until 5L))
    frames.foreach { case (docId, idx, fw, fh, delayCs, px0) =>
      assert(docId == 9L && fw == 64 + n % 577)
      assert(fh == (if (idx == 0L) 64 + (n * 31) % 449 else 1))
      assert(delayCs == n % 100 + 1)
      // First pixel of frame i carries payload byte i (row rotated by i),
      // round-tripped through the encoder's gray palette.
      assert(px0 == (p(idx.toInt % n) & 0xff))
    }
  }
}
