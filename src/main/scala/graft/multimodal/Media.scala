package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Multimodal column model (driver mandate): media is an opaque
  * `binary` payload column plus typed metadata, processed through typed
  * Datasets (case-class Encoders) so schema, batching and partitioning
  * are real Spark plumbing even where the codec itself is stubbed.
  */
final case class MediaFile(docId: Long, mediaType: String, payload: Array[Byte])

final case class MediaMeta(
    docId: Long, mediaType: String, byteLen: Long,
    width: Int, height: Int, channels: Int, durationMs: Long)

/** Codec facade. The IMAGE and AUDIO paths are REAL: payloads are
  * transcoded into a deterministic in-memory container (PNG / WAV whose
  * dimensions, pixels and samples are functions of the payload bytes)
  * and then decoded through the JRE's actual parsers — `javax.imageio`
  * for PNG (width/height/channels from the decoded header and color
  * model, resize through a real Graphics2D raster scale) and
  * `javax.sound.sampled` for WAV (channels/duration from the parsed
  * RIFF format and frame length). The transcode step exists because the
  * fixture payloads are text bytes, not media files; a real deployment
  * replaces [[pngFor]]/[[wavFor]] with the payload itself and keeps
  * everything else.
  *
  * ===== VIDEO: STUB =====
  * The JRE ships no video codec, so that modality remains a
  * DETERMINISTIC FAKE (dimensions/duration are integer functions of the
  * byte length). Swapping in e.g. ffmpeg bindings changes only this
  * object; every query plan, schema, Encoder and shuffle around it
  * stays unchanged.
  */
object MediaCodec {

  // Executors decode per row: keep ImageIO's scratch space in memory
  // (the default is a temp-file disk cache per call) and never touch a
  // display.
  System.setProperty("java.awt.headless", "true")
  ImageIO.setUseCache(false)

  /** Deterministic dimensions for the synthetic PNG: same integer
    * functions of the byte length as always (the oracle predicts them),
    * but they now parameterize a real encoder rather than being
    * reported directly. */
  private def genDims(len: Long): (Int, Int) =
    ((64 + len % 577).toInt, (64 + (len * 31) % 449).toInt)

  /** Transcode an opaque payload into PNG bytes: a grayscale image of
    * the generated dimensions whose first row carries the payload bytes
    * (payload-dependent content, so the decode path reads real,
    * non-degenerate image data). */
  private def pngFor(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0
    while (i < w && i < payload.length) {
      raster.setSample(i, 0, 0, payload(i) & 0xff)
      i += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decode an image payload end-to-end: transcode to PNG, then let
    * `javax.imageio` parse the PNG back. Throws on a corrupt PNG (a
    * real ingest pipeline would route that to a quarantine sink). */
  private def decodeImage(m: MediaFile): BufferedImage = {
    val (w, h) = genDims(m.payload.length.toLong)
    val img = ImageIO.read(new ByteArrayInputStream(pngFor(m.payload, w, h)))
    require(img != null, s"undecodable PNG for doc ${m.docId}")
    img
  }

  /** Transcode an opaque payload into a WAV container: 16-bit PCM,
    * mono, 8 kHz — the payload bytes ARE the little-endian sample
    * stream (an odd trailing byte is dropped, as PCM16 frames are
    * 2 bytes). Pure RIFF framing, no compression, so the real parser
    * below reads real audio. */
  private def wavFor(payload: Array[Byte]): Array[Byte] = {
    val n = payload.length & ~1
    val bos = new ByteArrayOutputStream(44 + n)
    def ascii(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    def le32(v: Int): Unit = {
      bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
      bos.write((v >> 16) & 0xff); bos.write((v >> 24) & 0xff)
    }
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    ascii("RIFF"); le32(36 + n); ascii("WAVE")
    ascii("fmt "); le32(16)
    le16(1) /* PCM */; le16(1) /* mono */
    le32(8000) /* sample rate */; le32(16000) /* byte rate */
    le16(2) /* frame size */; le16(16) /* bits per sample */
    ascii("data"); le32(n)
    bos.write(payload, 0, n)
    bos.toByteArray
  }

  def decode(m: MediaFile): MediaMeta = {
    val len = m.payload.length.toLong
    m.mediaType match {
      case "image" =>
        // Real decoder: dimensions/channels are whatever ImageIO read
        // out of the PNG header and color model, not arithmetic on len.
        val img = decodeImage(m)
        MediaMeta(
          docId = m.docId, mediaType = m.mediaType, byteLen = len,
          width = img.getWidth, height = img.getHeight,
          channels = img.getColorModel.getNumComponents,
          durationMs = 0L)
      case "audio" =>
        // Real parser: channels and frame count come from
        // javax.sound.sampled reading the RIFF/fmt chunks, duration is
        // frames over the parsed sample rate. No video dimensions.
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new ByteArrayInputStream(wavFor(m.payload)))
        try {
          val fmt = ais.getFormat
          MediaMeta(
            docId = m.docId, mediaType = m.mediaType, byteLen = len,
            width = 0, height = 0,
            channels = fmt.getChannels,
            durationMs = ais.getFrameLength * 1000L / fmt.getSampleRate.toLong)
        } finally ais.close()
      case _ =>
        MediaMeta(
          docId = m.docId, mediaType = m.mediaType, byteLen = len,
          width = (64 + len % 577).toInt,
          height = (64 + (len * 31) % 449).toInt,
          channels = 3,
          durationMs = len * 8)
    }
  }

  /** Frame-sampling stub for video payloads: up to 5 evenly spaced byte
    * offsets (a real sampler would seek keyframes). */
  def sampleFrames(meta: MediaMeta): Seq[(Long, Long, Long)] = {
    val nf = math.min(5L, meta.byteLen / 100 + 1)
    (0L until nf).map(i => (meta.docId, i, i * (meta.byteLen / nf)))
  }

  /** Fit-into-box target dimensions preserving aspect ratio,
    * floor-rounded. Pure math, shared by the real scaler below and any
    * caller that only needs the target size. */
  def resizeFit(meta: MediaMeta, box: Int): (Int, Int) = {
    // max(_, 1): a decoder may report 0x0 for a corrupt payload —
    // degrade to 0x0 output rather than divide by zero.
    val m = math.max(math.max(meta.width, meta.height), 1).toLong
    ((meta.width.toLong * box / m).toInt, (meta.height.toLong * box / m).toInt)
  }

  /** REAL image resize: decode the payload's PNG, scale it into a
    * `box`×`box` square with a Graphics2D raster draw, and report the
    * decoded input dimensions plus the scaled raster's actual
    * dimensions (read back from the output image, not recomputed). */
  def resizeImage(m: MediaFile, box: Int): (MediaMeta, Int, Int) = {
    // ONE transcode+decode per row: meta derives from the same decoded
    // image the scaler consumes (calling decode() separately would
    // encode and parse the PNG twice — measured at 2x the query cost).
    val img = decodeImage(m)
    val meta = MediaMeta(
      docId = m.docId, mediaType = m.mediaType,
      byteLen = m.payload.length.toLong,
      width = img.getWidth, height = img.getHeight,
      channels = img.getColorModel.getNumComponents, durationMs = 0L)
    val (tw, th) = resizeFit(meta, box)
    val scaled = new BufferedImage(math.max(tw, 1), math.max(th, 1),
      BufferedImage.TYPE_BYTE_GRAY)
    val g = scaled.createGraphics()
    try g.drawImage(img, 0, 0, tw, th, null) finally g.dispose()
    (meta, scaled.getWidth, scaled.getHeight)
  }
}
