package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Multimodal column model (driver mandate): media is an opaque
  * `binary` payload column plus typed metadata, processed through typed
  * Datasets (case-class Encoders) so schema, batching and partitioning
  * are real Spark plumbing — and so are all three codec paths (see
  * [[MediaCodec]]).
  */
final case class MediaFile(docId: Long, mediaType: String, payload: Array[Byte])

final case class MediaMeta(
    docId: Long, mediaType: String, byteLen: Long,
    width: Int, height: Int, channels: Int, durationMs: Long)

/** Codec facade. ALL THREE modality paths are REAL: payloads are
  * transcoded into a deterministic in-memory container (PNG / WAV /
  * animated GIF whose dimensions, pixels, samples and frame timing are
  * functions of the payload bytes) and then decoded through the JRE's
  * actual parsers — `javax.imageio` for PNG (width/height/channels from
  * the decoded header and color model, resize through a real Graphics2D
  * raster scale), `javax.sound.sampled` for WAV (channels/duration from
  * the parsed RIFF format and frame length), and `javax.imageio`'s GIF
  * plugin for the VIDEO modality (the JRE ships no MP4 codec, but GIF
  * is a true multi-frame container it can both write and read: frame
  * count via `ImageReader.getNumImages(true)`, per-frame dimensions and
  * pixels via `read(i)`, per-frame timing via each frame's
  * GraphicControlExtension delay). The transcode step exists because
  * the fixture payloads are text bytes, not media files; a real
  * deployment replaces [[pngFor]]/[[wavFor]]/[[gifFor]] with the
  * payload itself (or an ffmpeg binding for real MP4s) and keeps every
  * query plan, schema, Encoder and shuffle unchanged.
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

  /** Transcode an opaque payload into JPEG bytes — same deterministic
    * grayscale image as [[pngFor]], through ImageIO's native JPEG
    * writer. JPEG is lossy, so PIXELS don't round-trip (only the PNG
    * path makes pixel-level promises); the container HEADER — exact
    * dimensions and the one-component grayscale color model — does,
    * which is what the ingest oracle predicts. */
  private def jpegFor(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0
    while (i < w && i < payload.length) {
      raster.setSample(i, 0, 0, payload(i) & 0xff)
      i += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", bos)
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

  /** Deterministic video-container parameters: frame count and the
    * per-frame delay (GIF GraphicControlExtension units: centiseconds).
    * Like [[genDims]] these are integer functions of the byte length the
    * oracle can predict — but they parameterize a real encoder, and the
    * decode side reads them back out of the parsed container. */
  private def gifParams(len: Long): (Int, Int) =
    (math.min(5L, len / 100 + 1).toInt, (len % 100 + 1).toInt)

  /** Per-frame GIF metadata carrying the frame delay (the piece the
    * default metadata omits; without a GraphicControlExtension a frame
    * has no timing and the container carries no duration). */
  private def gifFrameMeta(wr: javax.imageio.ImageWriter, img: BufferedImage,
      delayCs: Int): javax.imageio.metadata.IIOMetadata = {
    val md = wr.getDefaultImageMetadata(
      new javax.imageio.ImageTypeSpecifier(img), null)
    val fmt = md.getNativeMetadataFormatName // javax_imageio_gif_image_1.0
    val root = md.getAsTree(fmt).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
    val gce = new javax.imageio.metadata.IIOMetadataNode("GraphicControlExtension")
    gce.setAttribute("disposalMethod", "none")
    gce.setAttribute("userInputFlag", "FALSE")
    gce.setAttribute("transparentColorFlag", "FALSE")
    gce.setAttribute("delayTime", delayCs.toString)
    gce.setAttribute("transparentColorIndex", "0")
    root.appendChild(gce)
    md.setFromTree(fmt, root)
    md
  }

  /** Transcode an opaque payload into a multi-frame animated GIF: frame
    * 0 is the full `w`×`h` logical screen, frames 1..n−1 are `w`×1
    * strips (GIF frames may be smaller than the screen — and this keeps
    * the per-row pixel volume O(w·h + nf·w) instead of O(nf·w·h)). Each
    * frame's first row carries the payload bytes rotated by the frame
    * index, so frame content is payload-dependent and distinct per
    * frame; each frame carries the same GCE delay. */
  private def gifFor(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val (nf, delayCs) = gifParams(payload.length.toLong)
    val bos = new ByteArrayOutputStream()
    val wr = ImageIO.getImageWritersByFormatName("gif").next()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      wr.setOutput(ios)
      wr.prepareWriteSequence(null)
      var i = 0
      while (i < nf) {
        val img = new BufferedImage(w, if (i == 0) h else 1,
          BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var x = 0
        while (x < w && x < payload.length) {
          raster.setSample(x, 0, 0, payload((x + i) % payload.length) & 0xff)
          x += 1
        }
        wr.writeToSequence(
          new javax.imageio.IIOImage(img, null, gifFrameMeta(wr, img, delayCs)),
          null)
        i += 1
      }
      wr.endWriteSequence()
    } finally { ios.close(); wr.dispose() }
    bos.toByteArray
  }

  /** A positioned GIF reader over the transcoded payload (caller must
    * `dispose()`). `getNumImages(true)` / `read(i)` /
    * `getImageMetadata(i)` then come from the JRE's actual GIF parser. */
  private def gifReader(payload: Array[Byte]): javax.imageio.ImageReader = {
    val (w, h) = genDims(payload.length.toLong)
    val rd = ImageIO.getImageReadersByFormatName("gif").next()
    rd.setInput(ImageIO.createImageInputStream(
      new ByteArrayInputStream(gifFor(payload, w, h))))
    rd
  }

  /** The frame delay parsed back out of frame `i`'s
    * GraphicControlExtension (centiseconds; 0 if the frame carries no
    * GCE — a legal GIF, not an error). */
  private def frameDelayCs(rd: javax.imageio.ImageReader, i: Int): Int = {
    val md = rd.getImageMetadata(i)
    val root = md.getAsTree(md.getNativeMetadataFormatName)
      .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
    val gces = root.getElementsByTagName("GraphicControlExtension")
    if (gces.getLength == 0) 0
    else gces.item(0).asInstanceOf[org.w3c.dom.Element]
      .getAttribute("delayTime").toInt
  }

  /** The transcoded container BYTES for a payload — what a real
    * deployment would already have on disk. Exposed so the ingest
    * fixture (mm_ingest) can write actual .png/.wav/.gif FILES and
    * close the loop: file → binaryFile scan → [[parseContainer]], with
    * no transcode anywhere on the read path. */
  def containerFor(m: MediaFile): Array[Byte] = {
    val (w, h) = genDims(m.payload.length.toLong)
    m.mediaType match {
      case "image" => pngFor(m.payload, w, h)
      case "jpeg"  => jpegFor(m.payload, w, h)
      case "audio" => wavFor(m.payload)
      case _       => gifFor(m.payload, w, h)
    }
  }

  /** Canonical file extension per modality (`"jpeg"` is the image
    * modality in its second container format — mm_ingest writes both). */
  def extensionFor(mediaType: String): String = mediaType match {
    case "image" => "png"
    case "jpeg"  => "jpg"
    case "audio" => "wav"
    case _       => "gif"
  }

  /** Parse REAL container bytes (e.g. read from disk through Spark's
    * `binaryFile` source) with format sniffed from the magic number —
    * no payload, no transcode, no generator arithmetic anywhere on this
    * path; every returned value comes out of the JRE parser. Returns
    * (containerMagic, width, height, channels, nFrames, durationMs);
    * audio reports its PCM frame count as nFrames and no dimensions.
    * Unknown magic throws — a real ingest routes that to quarantine. */
  def parseContainer(bytes: Array[Byte]): (String, Int, Int, Int, Long, Long) = {
    def magicIs(s: String, off: Int): Boolean =
      bytes.length >= off + s.length &&
        s.indices.forall(i => (bytes(off + i) & 0xff) == s.charAt(i).toInt)
    if (magicIs("PNG", 1)) {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      require(img != null, "undecodable PNG")
      ("PNG", img.getWidth, img.getHeight,
        img.getColorModel.getNumComponents, 1L, 0L)
    } else if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xff &&
        (bytes(1) & 0xff) == 0xd8 && (bytes(2) & 0xff) == 0xff) {
      // JPEG: SOI marker FF D8 followed by a segment marker FF xx (no
      // ASCII magic — binary markers, unlike the other containers).
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      require(img != null, "undecodable JPEG")
      ("JPEG", img.getWidth, img.getHeight,
        img.getColorModel.getNumComponents, 1L, 0L)
    } else if (magicIs("RIFF", 0)) {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        ("RIFF", 0, 0, fmt.getChannels, ais.getFrameLength,
          ais.getFrameLength * 1000L / fmt.getSampleRate.toLong)
      } finally ais.close()
    } else if (magicIs("GIF8", 0)) {
      val rd = ImageIO.getImageReadersByFormatName("gif").next()
      rd.setInput(ImageIO.createImageInputStream(new ByteArrayInputStream(bytes)))
      try {
        val nf = rd.getNumImages(true)
        val f0 = rd.read(0)
        var durCs = 0L
        var i = 0
        while (i < nf) { durCs += frameDelayCs(rd, i); i += 1 }
        ("GIF8", f0.getWidth, f0.getHeight,
          f0.getColorModel.getNumComponents, nf.toLong, durCs * 10L)
      } finally rd.dispose()
    } else throw new IllegalArgumentException(
      s"unknown container magic: ${bytes.take(4).map(b => f"${b & 0xff}%02x").mkString}")
  }

  /** Decode an audio payload's PCM16 sample values through the REAL
    * RIFF parser: the AudioInputStream's decoded byte stream (not the
    * raw payload) is paired little-endian into signed 16-bit samples —
    * so a framing bug in the container path would surface here, not be
    * papered over by rereading the input. On this fixture the payload
    * is ASCII, so every hi byte < 0x80 and all samples are
    * non-negative; the oracle replays the identical pairing from the
    * text bytes. */
  def pcmSamples(m: MediaFile): Array[Int] = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new ByteArrayInputStream(wavFor(m.payload)))
    try {
      val bytes = ais.readAllBytes()
      val out = new Array[Int](bytes.length / 2)
      var i = 0
      while (i < out.length) {
        val lo = bytes(2 * i) & 0xff
        val hi = bytes(2 * i + 1).toInt
        out(i) = (hi << 8) | lo
        i += 1
      }
      out
    } finally ais.close()
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
        // Real container parse: frame count from getNumImages(true)
        // (the reader walks every image descriptor), screen dimensions
        // and channels from the decoded first frame and its palette
        // color model, duration by summing each frame's parsed GCE
        // delay — none of it arithmetic on len.
        val rd = gifReader(m.payload)
        try {
          val nf = rd.getNumImages(true)
          val f0 = rd.read(0)
          var durCs = 0L
          var i = 0
          while (i < nf) { durCs += frameDelayCs(rd, i); i += 1 }
          MediaMeta(
            docId = m.docId, mediaType = m.mediaType, byteLen = len,
            width = f0.getWidth, height = f0.getHeight,
            channels = f0.getColorModel.getNumComponents,
            durationMs = durCs * 10L)
        } finally rd.dispose()
    }
  }

  /** REAL frame sampling for video payloads: decode every frame of the
    * GIF container and report what the parser read — per-frame
    * dimensions (frame 0 is the full screen, later frames are strips),
    * the GCE delay, and the first pixel's gray value (which round-trips
    * `payload(idx % len)` through the encoder's palette). A real
    * deployment seeking keyframes in an MP4 changes only this method's
    * body. */
  def sampleFrames(m: MediaFile): Seq[(Long, Long, Int, Int, Int, Int)] = {
    val rd = gifReader(m.payload)
    try {
      (0 until rd.getNumImages(true)).map { i =>
        val f = rd.read(i)
        (m.docId, i.toLong, f.getWidth, f.getHeight,
          frameDelayCs(rd, i), f.getRGB(0, 0) & 0xff)
      }
    } finally rd.dispose()
  }

  /** Adjacent-frame L1 pixel delta over each frame's row 0 (the row
    * every frame of the container populates): the temporal-difference
    * signal scene-cut/keyframe detectors threshold. Reads the REAL
    * decoded rasters of consecutive frames — an MP4 deployment changes
    * only the decode, the delta math is the operator. Returns one row
    * per adjacent pair: (docId, pairIdx, Σ_x |f_i(x,0) − f_{i+1}(x,0)|). */
  def frameRowDeltas(m: MediaFile): Seq[(Long, Long, Long)] = {
    val rd = gifReader(m.payload)
    try {
      val n = rd.getNumImages(true)
      val rows = (0 until n).map { i =>
        val f = rd.read(i)
        Array.tabulate(f.getWidth)(x => (f.getRGB(x, 0) & 0xff).toLong)
      }
      (0 until n - 1).map { i =>
        val (a, b) = (rows(i), rows(i + 1))
        var d = 0L
        var x = 0
        while (x < a.length && x < b.length) {
          d += math.abs(a(x) - b(x)); x += 1
        }
        (m.docId, i.toLong, d)
      }
    } finally rd.dispose()
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

  /** Per-block grayscale pixel sums over the DECODED raster on a g×g
    * grid with truncating-integer boundaries (block (i, j) covers cols
    * [i·w/g, (i+1)·w/g) × rows [j·h/g, (j+1)·h/g)) — the exact-integer
    * core of an average-hash, kept as raw sums so the hash comparison
    * can stay in cross-multiplied BIGINTs (no float mean anywhere).
    * Row-major g×g output. PNG 8-bit grayscale is lossless, so these
    * sums are exact functions of the payload the oracle can predict. */
  def grayBlockSums(m: MediaFile, g: Int): (Int, Int, Array[Long]) = {
    val img = decodeImage(m)
    val (w, h) = (img.getWidth, img.getHeight)
    val raster = img.getRaster
    val sums = new Array[Long](g * g)
    var j = 0
    while (j < g) {
      val rLo = j.toLong * h / g; val rHi = (j + 1).toLong * h / g
      var i = 0
      while (i < g) {
        val cLo = i.toLong * w / g; val cHi = (i + 1).toLong * w / g
        var s = 0L
        var y = rLo
        while (y < rHi) {
          var x = cLo
          while (x < cHi) {
            s += raster.getSample(x.toInt, y.toInt, 0)
            x += 1
          }
          y += 1
        }
        sums(j * g + i) = s
        i += 1
      }
      j += 1
    }
    (w, h, sums)
  }
}
