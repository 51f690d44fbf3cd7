package graft.multimodal

/** Multimodal column model (driver mandate): media is an opaque
  * `binary` payload column plus typed metadata, processed through typed
  * Datasets (case-class Encoders) so schema, batching and partitioning
  * are real Spark plumbing even where the codec itself is stubbed.
  */
final case class MediaFile(docId: Long, mediaType: String, payload: Array[Byte])

final case class MediaMeta(
    docId: Long, mediaType: String, byteLen: Long,
    width: Int, height: Int, channels: Int, durationMs: Long)

/** ===== STUB CODEC =====
  * The container ships no image/audio/video libraries, so `decode` is a
  * DETERMINISTIC FAKE: dimensions/duration are integer functions of the
  * byte length. A real deployment swaps only this object for one backed
  * by an actual codec (e.g. javax.imageio / ffmpeg bindings); every
  * query plan, schema, Encoder and shuffle around it stays unchanged —
  * that Spark-side plumbing is the tested artifact here.
  */
object MediaCodec {

  def decode(m: MediaFile): MediaMeta = {
    val len = m.payload.length.toLong
    MediaMeta(
      docId = m.docId,
      mediaType = m.mediaType,
      byteLen = len,
      width = (64 + len % 577).toInt,
      height = (64 + (len * 31) % 449).toInt,
      channels = 3,
      durationMs = if (m.mediaType == "image") 0L else len * 8)
  }

  /** Frame-sampling stub for video payloads: up to 5 evenly spaced byte
    * offsets (a real sampler would seek keyframes). */
  def sampleFrames(meta: MediaMeta): Seq[(Long, Long, Long)] = {
    val nf = math.min(5L, meta.byteLen / 100 + 1)
    (0L until nf).map(i => (meta.docId, i, i * (meta.byteLen / nf)))
  }

  /** Resize-to-fit stub: target dimensions preserving aspect ratio
    * inside a `box`×`box` square, floor-rounded (a real implementation
    * calls the codec's scaler — the dimension math and the Spark
    * plumbing around it are the tested artifact). */
  def resizeFit(meta: MediaMeta, box: Int): (Int, Int) = {
    // max(_, 1): a real decoder may report 0x0 for a corrupt payload —
    // degrade to 0x0 output rather than divide by zero.
    val m = math.max(math.max(meta.width, meta.height), 1).toLong
    ((meta.width.toLong * box / m).toInt, (meta.height.toLong * box / m).toInt)
  }
}
