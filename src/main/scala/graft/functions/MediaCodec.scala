package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

/** REAL media codecs (SURVEY F2): images via the JDK's `javax.imageio`
  * (PNG/JPEG/BMP/GIF/TIFF readers ship in the JDK and run headless),
  * audio via a conformant RIFF/WAVE chunk parser/writer in this file —
  * hand-rolled because `javax.sound.sampled.AudioSystem`'s provider
  * registry serializes concurrent callers (measured ~10 ms/row across
  * 32 executor threads; ratio100 65 vs the ImageIO row's 6 before the
  * switch), and spec-pinned conformant in BOTH directions against
  * `javax.sound` itself. No external codec library — the one modality
  * the JDK genuinely cannot decode is VIDEO, which is the only place
  * [[graft.operators.Multimodal]] still stubs.
  *
  * Two kinds of entry points live here:
  *
  *   - `pngPayload` / `wavPayload`: CLOSED-FORM synthetic payloads —
  *     real container bytes (a real PNG, a real WAV) whose decoded
  *     content is a pure integer function of `docId`. The test corpus
  *     has no binary column, so the mm queries synthesize payloads
  *     in-plan (the established mediaFrame pattern); making the
  *     synthetic payload a REAL container means the decode path under
  *     test is the production one, and the DuckDB oracle can replay
  *     the decoded statistics from the closed form without any codec
  *     — a hash match proves encode → real decode → features
  *     end-to-end.
  *   - `decodeImage` / `decodeWav` / `imageAHash64`: the decode
  *     kernels themselves, total functions (None/null on undecodable
  *     bytes — a corrupt payload must quarantine, not kill a 100 TB
  *     job).
  *
  * All derived statistics use exact integer sums with one final IEEE
  * division (`sum.toDouble / count`), so engine and oracle agree
  * bit-for-bit.
  */
object MediaCodec {

  // ImageIO's default stream cache writes a temp FILE per encode and
  // decode — per-row disk IO in an executor hot path; disable once.
  // Headless is forced so executors without a display never try to
  // touch AWT's windowing side.
  locally {
    if (System.getProperty("java.awt.headless") == null)
      System.setProperty("java.awt.headless", "true")
    ImageIO.setUseCache(false)
  }

  /** Image dims closed form: width 16..32, height 16..28. Small enough
    * that the sf0.1 corpus decodes in milliseconds, big enough that
    * every 4x2 feature cell and 8x8 aHash cell holds >= 4 pixels. */
  def imageWidth(docId: Long): Int = (16 + math.floorMod(docId, 17)).toInt
  def imageHeight(docId: Long): Int =
    (16 + math.floorMod(docId / 17, 13)).toInt

  /** Pixel closed form (8-bit gray): (docId*31 + 7x + 13y) mod 256.
    * The doc_id term shifts brightness, the x/y terms tilt a gradient
    * with per-doc wraparound seams — distinct docs get distinct
    * images. Shared verbatim with the mm_decode / mm_phash_image
    * DuckDB replays. */
  def imagePixel(docId: Long, x: Int, y: Int): Int =
    math.floorMod(docId * 31 + 7L * x + 13L * y, 256).toInt

  /** A REAL grayscale PNG whose pixels follow [[imagePixel]]. */
  def pngPayload(docId: Long): Array[Byte] =
    pngOf(imageWidth(docId), imageHeight(docId), imagePixel(docId, _, _))

  /** PNG encoder over an arbitrary pixel function — the spec uses it
    * to render edited near-duplicates of a [[pngPayload]] image. */
  def pngOf(w: Int, h: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, pixel(x, y) & 0xFF)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decoded image: real dimensions plus an 8-cell (4 wide x 2 high)
    * mean-luma feature grid, each cell `sum.toDouble / count` over its
    * pixel block in 0..255. */
  final case class ImageFeatures(width: Int, height: Int,
                                 features: Array[Double])

  /** Integer luma of a raster position: band 0 for gray images, the
    * ITU-R 601 integer weights (299r + 587g + 114b) / 1000 for >= 3
    * bands — raster samples, NOT getRGB, because getRGB runs a
    * gray-to-sRGB colorspace conversion that is neither lossless nor
    * SQL-replayable. */
  private def lumaAt(raster: java.awt.image.Raster, x: Int, y: Int,
                     bands: Int): Int =
    if (bands >= 3)
      (299 * raster.getSample(x, y, 0) + 587 * raster.getSample(x, y, 1) +
        114 * raster.getSample(x, y, 2)) / 1000
    else raster.getSample(x, y, 0)

  /** REAL image decode via ImageIO. None when the bytes are not a
    * decodable image (unknown container, truncated file). */
  def decodeImage(payload: Array[Byte]): Option[ImageFeatures] =
    try {
      val img = ImageIO.read(new ByteArrayInputStream(payload))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val raster = img.getRaster
        val bands = raster.getNumBands
        val sums = new Array[Long](8)
        val cnts = new Array[Long](8)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val g = (y * 2 / h) * 4 + (x * 4 / w)
            sums(g) += lumaAt(raster, x, y, bands)
            cnts(g) += 1
            x += 1
          }
          y += 1
        }
        val feats = Array.tabulate(8)(g =>
          if (cnts(g) == 0) 0.0 else sums(g).toDouble / cnts(g))
        Some(ImageFeatures(w, h, feats))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** aHash over REAL decoded pixels: mean luma per 8x8 cell grid,
    * bit g set iff cell mean > global mean, compared in exact integer
    * cross-multiplied form (`s_g * N > T * c_g`; N = w*h, T = total
    * luma sum) so the DuckDB replay can never drift on a float
    * threshold. Null (boxed) when the bytes do not decode — an
    * Expression null, not an exception, so one corrupt payload
    * quarantines instead of killing the job. Complements
    * [[MediaHashes.avgHash64]], which hashes raw payload BYTES (the
    * right first pass for opaque payloads); this one hashes what the
    * image LOOKS like, so a re-encoded copy (different bytes, same
    * pixels) still lands at hamming 0. */
  def imageAHash64(payload: Array[Byte]): java.lang.Long =
    try {
      val img = ImageIO.read(new ByteArrayInputStream(payload))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) null
      else {
        val w = img.getWidth
        val h = img.getHeight
        val raster = img.getRaster
        val bands = raster.getNumBands
        val sums = new Array[Long](64)
        val cnts = new Array[Long](64)
        var total = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val g = (y * 8 / h) * 8 + (x * 8 / w)
            val l = lumaAt(raster, x, y, bands)
            sums(g) += l
            cnts(g) += 1
            total += l
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        var sig = 0L
        var g = 0
        while (g < 64) {
          if (cnts(g) > 0 && sums(g) * n > total * cnts(g)) sig |= 1L << g
          g += 1
        }
        java.lang.Long.valueOf(sig)
      }
    } catch { case scala.util.control.NonFatal(_) => null }

  /** Audio closed form: 16-bit signed PCM, mono, 8 kHz, little-endian;
    * 64..127 samples per doc; sample(i) = (docId*131 + 17i) mod 4096
    * - 2048. Shared verbatim with the mm_decode_audio replay. */
  def audioSamples(docId: Long): Int = (64 + math.floorMod(docId, 64)).toInt
  def audioSample(docId: Long, i: Int): Int =
    math.floorMod(docId * 131 + 17L * i, 4096).toInt - 2048

  /** Sample rate of the synthetic WAVs (and the `width` slot of their
    * decoded feature rows). */
  val AudioRateHz = 8000

  /** A REAL RIFF/WAVE container whose PCM frames follow
    * [[audioSample]]: the canonical 44-byte header (RIFF size, `fmt `
    * PCM/mono/16-bit/8kHz, `data`) + little-endian PCM — written
    * directly, NOT through `javax.sound.sampled.AudioSystem.write`:
    * AudioSystem's provider registry serializes concurrent callers
    * (a measured 10 ms/row across 32 executor threads — the
    * mm_decode_audio scale run hit ratio100 65 where the ImageIO row
    * sat at 6), and a per-row synthesis kernel cannot afford a global
    * lock. Conformance is spec-pinned the strong way: `AudioSystem`
    * itself parses these bytes back to the exact format and samples. */
  def wavPayload(docId: Long): Array[Byte] = {
    val n = audioSamples(docId)
    val dataLen = n * 2
    val out = new Array[Byte](44 + dataLen)
    def le16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xFF).toByte
      out(off + 1) = ((v >> 8) & 0xFF).toByte
    }
    def le32(off: Int, v: Int): Unit = { le16(off, v); le16(off + 2, v >>> 16) }
    def tag(off: Int, s: String): Unit =
      s.getBytes("US-ASCII").copyToArray(out, off)
    tag(0, "RIFF"); le32(4, 36 + dataLen); tag(8, "WAVE")
    tag(12, "fmt "); le32(16, 16)
    le16(20, 1) /* PCM */ ; le16(22, 1) /* mono */
    le32(24, AudioRateHz); le32(28, AudioRateHz * 2) /* byte rate */
    le16(32, 2) /* block align */ ; le16(34, 16) /* bits */
    tag(36, "data"); le32(40, dataLen)
    var i = 0
    while (i < n) {
      le16(44 + 2 * i, audioSample(docId, i) & 0xFFFF)
      i += 1
    }
    out
  }

  /** Decoded audio: container-parsed format plus 8 segment-mean
    * amplitude features (segment g = samples with i*8/n == g, mean =
    * exact integer sum / count). */
  final case class AudioFeatures(sampleRate: Int, bits: Int,
                                 nSamples: Int, features: Array[Double])

  /** REAL RIFF/WAVE container decode — a conformant chunk walker
    * (RIFF/WAVE magic, `fmt ` parsed wherever it sits, unknown chunks
    * skipped by their declared size with word padding, `data` bounded
    * by both its declared size and the physical payload). Accepts the
    * 16-bit signed mono PCM interchange profile (WAV PCM is
    * little-endian by definition); anything else — or undecodable
    * bytes — is None. Hand-rolled instead of
    * `AudioSystem.getAudioInputStream` for the same reason
    * [[wavPayload]] writes its own header: AudioSystem's provider
    * probing serializes across threads (measured 10 ms/row on 32
    * threads — a decode kernel with a global lock is not a 100 TB
    * operator). The spec cross-validates BOTH directions against
    * `javax.sound.sampled`: this parser decodes an
    * AudioSystem-written WAV identically, and AudioSystem parses
    * [[wavPayload]]'s bytes back to the same format and samples. */
  def decodeWav(payload: Array[Byte]): Option[AudioFeatures] =
    try {
      if (payload.length < 12) return None
      def tag(off: Int): String = new String(payload, off, 4, "US-ASCII")
      def le16(off: Int): Int =
        (payload(off) & 0xFF) | ((payload(off + 1) & 0xFF) << 8)
      def le32(off: Int): Int = le16(off) | (le16(off + 2) << 16)
      if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
      var fmtOk = false
      var rate = 0
      var dataOff = -1
      var dataLen = 0
      var off = 12
      while (off + 8 <= payload.length) {
        val id = tag(off)
        val len = le32(off + 4)
        if (len < 0 || off + 8 + len > payload.length) {
          // declared size overruns the physical payload: tolerate it
          // ONLY for a final data chunk (truncated tail tools emit);
          // truncate to what is actually there
          if (id == "data") { dataOff = off + 8; dataLen = payload.length - dataOff }
          off = payload.length
        } else {
          if (id == "fmt " && len >= 16) {
            // PCM(1), mono, 16-bit — the interchange profile
            fmtOk = le16(off + 8) == 1 && le16(off + 10) == 1 &&
              le16(off + 22) == 16
            rate = le32(off + 12)
          } else if (id == "data") {
            dataOff = off + 8; dataLen = len
          }
          off += 8 + len + (len & 1) // chunks are word-aligned
        }
      }
      val n = dataLen / 2
      if (!fmtOk || rate <= 0 || dataOff < 0 || n == 0) None
      else {
        val sums = new Array[Long](8)
        val cnts = new Array[Long](8)
        var i = 0
        while (i < n) {
          val v = le16(dataOff + 2 * i).toShort.toInt
          val g = (i.toLong * 8 / n).toInt
          sums(g) += v
          cnts(g) += 1
          i += 1
        }
        val feats = Array.tabulate(8)(g =>
          if (cnts(g) == 0) 0.0 else sums(g).toDouble / cnts(g))
        Some(AudioFeatures(rate, 16, n, feats))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
}
