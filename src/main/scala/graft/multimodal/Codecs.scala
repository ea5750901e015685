package graft.multimodal

/**
 * REAL decoders for the formats a pure JVM can parse without native
 * codec libraries: RIFF/WAVE PCM-16 audio and BMP (BITMAPINFOHEADER,
 * 24bpp, BI_RGB) images via hand-written spec parsers, plus JPEG and
 * PNG via the JDK's own `javax.imageio` plugins (shipped with every
 * JDK — no external jar; PNG decode is lossless and therefore exactly
 * reproducible from the encoded pixels, JPEG decode is deterministic
 * per decoder implementation). These replace `Media.decodeStub` for
 * their formats — the stub remains only for compressed AUDIO/VIDEO
 * codecs (opus/h264) that genuinely need native libs absent from this
 * container. Parsers are defensive: any structural violation (bad
 * magic, truncated chunk, unsupported bpp/compression) yields None and
 * the row degrades to format="unknown" rather than throwing mid-stage.
 *
 * WAV/BMP byte order little-endian per both specs†.
 */
object Codecs {

  /** Decoded PCM audio summary. `rms`/`zcr` are rounded to 6 decimals
    * (single IEEE ops on exact integer sums — deterministic across
    * partitionings; samples are counted across channels, interleaved). */
  final case class WavInfo(sampleRate: Int, channels: Int, bits: Int,
      nSamples: Long, durationSec: Double, peak: Int, rms: Double,
      zeroCrossings: Long)

  /** Decoded BMP summary; means are exact integer sums / (w·h). */
  final case class BmpInfo(width: Int, height: Int, bits: Int,
      meanR: Double, meanG: Double, meanB: Double)

  private[multimodal] def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  private def ascii(b: Array[Byte], o: Int, s: String): Boolean =
    o + s.length <= b.length && s.indices.forall(i => b(o + i) == s.charAt(i).toByte)

  /** Container sniff by magic bytes:
    * "wav" | "avi" | "bmp" | "png" | "jpeg" | "unknown". */
  def detect(b: Array[Byte]): String =
    if (b == null) "unknown"
    else if (ascii(b, 0, "RIFF") && b.length >= 12 && ascii(b, 8, "WAVE")) "wav"
    else if (ascii(b, 0, "RIFF") && b.length >= 12 && ascii(b, 8, "AVI ")) "avi"
    else if (ascii(b, 0, "BM") && b.length >= 54) "bmp"
    else if (b.length >= 8 && (b(0) & 0xff) == 0x89 && ascii(b, 1, "PNG")) "png"
    else if (b.length >= 3 && (b(0) & 0xff) == 0xff &&
      (b(1) & 0xff) == 0xd8 && (b(2) & 0xff) == 0xff) "jpeg"
    else "unknown"

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Validated WAV geometry: (channels, rate, dataOff, dataLen) for
    * PCM-16 payloads — the chunk walk shared by [[parseWav]] and
    * AudioHash so neither duplicates the RIFF framing rules. The walk
    * offset is a Long: a hostile chunk declaring size ~2^31 would wrap
    * an Int offset negative, keep the loop guard true, and index the
    * array out of bounds — the same class of overflow bmpHeader guards
    * against; every Int cast below is bounded by `off + 8 <= b.length`. */
  private[multimodal] def wavHeader(b: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    if (detect(b) != "wav") return None
    var off = 12L
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    var data: Option[(Int, Int)] = None     // (offset, len)
    while (off + 8 <= b.length && data.isEmpty) {
      val size = le32(b, off.toInt + 4)
      if (size < 0) return None
      val body = off + 8 // <= b.length, so Int-safe where cast
      if (ascii(b, off.toInt, "fmt ")) {
        if (size < 16 || body + 16 > b.length) return None
        val audioFormat = le16(b, body.toInt)
        if (audioFormat != 1) return None // PCM only
        fmt = Some((le16(b, body.toInt + 2), le32(b, body.toInt + 4),
          le16(b, body.toInt + 14)))
      } else if (ascii(b, off.toInt, "data")) {
        data = Some((body.toInt,
          math.min(size.toLong, b.length - body).toInt))
      }
      off = body + size + (size & 1) // odd chunks carry a pad byte
    }
    (fmt, data) match {
      case (Some((ch, rate, bits)), Some((dOff, dLen)))
          if ch > 0 && rate > 0 && bits == 16 =>
        Some((ch, rate, dOff, dLen))
      case _ => None
    }
  }

  /**
   * Parse a RIFF/WAVE file with 16-bit PCM samples. Walks the chunk
   * list properly — skips unknown chunks (LIST, fact, …) with the
   * spec's odd-size pad byte, takes `fmt ` before `data`, and clamps a
   * data chunk that claims more bytes than the file carries (common in
   * streamed writes). A "data" BYTE SEQUENCE inside another chunk's
   * payload is never mistaken for the data chunk (length-driven walk,
   * not marker search — the Warc.readWarc lesson).
   */
  def parseWav(b: Array[Byte]): Option[WavInfo] =
    wavHeader(b) match {
      case Some((ch, rate, dOff, dLen)) =>
        val n = dLen / 2
        var i = 0
        var ss = 0L
        var peak = 0
        var zc = 0L
        var prevNonNeg = true
        while (i < n) {
          val s = le16(b, dOff + 2 * i).toShort.toInt
          ss += s.toLong * s
          val a = math.abs(s)
          if (a > peak) peak = a
          val nonNeg = s >= 0
          if (i > 0 && nonNeg != prevNonNeg) zc += 1
          prevNonNeg = nonNeg
          i += 1
        }
        val rms = if (n == 0) 0.0 else math.sqrt(ss.toDouble / n)
        Some(WavInfo(rate, ch, 16, n.toLong,
          round6(n.toDouble / ch / rate), peak, round6(rms), zc))
      case _ => None
    }

  /** Validated BMP geometry: (pixelOff, w, hRaw, stride). ONE source of
    * truth for "is this a BMP we decode" — shared by [[parseBmp]] and
    * [[pixels]] so neither pays the other's pixel pass. All arithmetic
    * on header fields is Long: hostile headers can carry
    * height = Int.MinValue (whose abs is still negative — it slipped
    * the old `h == 0` check and made `new Array(w*h)` throw) or a width
    * whose `w*3` wraps Int and corrupts the stride/bounds check into
    * admitting out-of-range reads. `need <= b.length < 2^31` bounds
    * every later Int index. */
  private def bmpHeader(b: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    if (detect(b) != "bmp") return None
    val pixelOff = le32(b, 10)
    val dibSize = le32(b, 14)
    if (dibSize < 40) return None // BITMAPCOREHEADER unsupported
    val w = le32(b, 18)
    val hRaw = le32(b, 22)
    val h = math.abs(hRaw.toLong)
    val bpp = le16(b, 28)
    val compression = le32(b, 30)
    if (w <= 0 || h <= 0 || bpp != 24 || compression != 0) return None
    val stride = ((w.toLong * 3 + 3) / 4) * 4
    val need = pixelOff.toLong + stride * h
    if (pixelOff < 14 + dibSize || need > b.length) return None
    Some((pixelOff, w, hRaw, stride.toInt))
  }

  /**
   * Parse a BMP with a BITMAPINFOHEADER (or larger V4/V5 header),
   * 24bpp, BI_RGB (no compression). Handles both bottom-up (positive
   * height) and top-down (negative height) layouts and the 4-byte row
   * padding; channel means don't depend on row order, so both layouts
   * share one accumulation pass.
   */
  def parseBmp(b: Array[Byte]): Option[BmpInfo] = bmpHeader(b).map {
    case (pixelOff, w, hRaw, stride) =>
      val h = math.abs(hRaw)
      var sr = 0L; var sg = 0L; var sb = 0L
      var row = 0
      while (row < h) {
        var x = 0
        val base = pixelOff + row * stride
        while (x < w) {
          val p = base + 3 * x // BGR order per spec
          sb += b(p) & 0xff; sg += b(p + 1) & 0xff; sr += b(p + 2) & 0xff
          x += 1
        }
        row += 1
      }
      val n = w.toLong * h
      BmpInfo(w, hRaw, 24,
        round6(sr.toDouble / n), round6(sg.toDouble / n), round6(sb.toDouble / n))
  }

  /** Validated AVI video geometry + frame index: width/height/bits from
    * the first 'vids' stream's BITMAPINFOHEADER, the codec fourcc
    * ("DIB " for uncompressed bottom-up DIB frames, "MJPG" for
    * motion-JPEG where every frame is a standalone JPEG — the two
    * codecs a pure JVM decodes), and the (offset, length) of every
    * video frame chunk in the 'movi' list. */
  final case class AviInfo(width: Int, height: Int, bits: Int,
      codec: String, frames: IndexedSeq[(Int, Int)])

  private val MJPG = 0x47504A4D // 'MJPG' fourcc, little-endian

  /**
   * AVI container walk (RIFF 'AVI '† — the same length-driven chunk
   * discipline as [[wavHeader]], recursing into LIST bodies): 'hdrl'
   * carries the main header and per-stream 'strh'/'strf' pairs; 'movi'
   * carries the frame chunks, named `NNdb` (uncompressed DIB) / `NNdc`
   * (compressed) where NN is the zero-based stream number — matched
   * against the index of the first 'vids' stream, so an AVI whose audio
   * stream is listed first still yields its video frames. A decoy
   * "00db" byte sequence inside a JUNK/INFO payload is never mistaken
   * for a frame (length walk, not marker search — the Warc lesson).
   * All offsets are Long and every chunk is bounds-checked, so hostile
   * sizes (negative, Int-wrapping) degrade to None, never index OOB.
   * None unless the video stream is 24bpp BI_RGB DIB or MJPG.
   */
  private[graft] def aviScan(b: Array[Byte]): Option[AviInfo] = {
    if (detect(b) != "avi") return None
    var w = 0; var h = 0; var bits = 0; var codec: String = null
    var streamIdx = -1     // streams seen so far (strl lists)
    var videoStream = -1   // index of the first vids stream
    var pendingVids = false // last strh in the current strl was vids
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var bad = false
    // depth cap: walk() recurses per LIST nesting level, and a hostile
    // few-KB payload of thousands of nested 'rec ' LISTs would otherwise
    // throw StackOverflowError — an Error no decode guard catches, so it
    // would kill the stage instead of degrading. Real AVIs nest ≤ 3
    // (RIFF → movi → rec); 16 is generous, beyond it the walk refuses.
    val maxDepth = 16
    def walk(start: Long, end: Long, depth: Int, inMovi: Boolean): Unit = {
      if (depth > maxDepth) { bad = true; return }
      var off = start
      while (!bad && off + 8 <= end) {
        val size = le32(b, off.toInt + 4)
        if (size < 0 || off + 8 + size > end) { bad = true; return }
        val body = off + 8
        if (ascii(b, off.toInt, "LIST")) {
          if (size >= 4) {
            val lt = off.toInt + 8
            // 'rec ' sublists: interleaved AVIs group each chunk-of-frames
            // inside LIST('rec ') within movi — descend like movi itself.
            // ADVICE r5: frame chunks count ONLY inside movi (or a 'rec '
            // within it) — a crafted container planting 'NNdb' chunks in
            // hdrl or at RIFF top level must not get them decoded/hashed
            if (ascii(b, lt, "movi")) {
              walk(body + 4, body + size, depth + 1, inMovi = true)
            } else if (ascii(b, lt, "hdrl") || ascii(b, lt, "rec ")) {
              walk(body + 4, body + size, depth + 1, inMovi)
            } else if (ascii(b, lt, "strl")) {
              streamIdx += 1; pendingVids = false
              walk(body + 4, body + size, depth + 1, inMovi)
            }
            // other list types (INFO, odml …) are skipped by length
          }
        } else if (ascii(b, off.toInt, "strh")) {
          if (size >= 8) {
            pendingVids = ascii(b, body.toInt, "vids")
            if (pendingVids && videoStream < 0) videoStream = streamIdx
          }
        } else if (ascii(b, off.toInt, "strf")) {
          // first vids stream's BITMAPINFOHEADER wins
          if (pendingVids && codec == null && size >= 40) {
            w = le32(b, body.toInt + 4)
            h = le32(b, body.toInt + 8)
            bits = le16(b, body.toInt + 14)
            codec = le32(b, body.toInt + 16) match {
              case 0 => if (bits == 24) "DIB " else null
              case MJPG => "MJPG"
              case _ => null
            }
            if (codec == null) bad = true
          }
        } else if (inMovi && videoStream >= 0 && off + 4 <= end &&
            b(off.toInt) == ('0' + videoStream / 10).toByte &&
            b(off.toInt + 1) == ('0' + videoStream % 10).toByte &&
            b(off.toInt + 2) == 'd'.toByte &&
            (b(off.toInt + 3) == 'b'.toByte || b(off.toInt + 3) == 'c'.toByte)) {
          frames += ((body.toInt, size))
        }
        off = body + size + (size & 1) // odd chunks carry a pad byte
      }
    }
    walk(12L, b.length.toLong, 0, inMovi = false)
    if (bad || codec == null || w <= 0 || h <= 0 || frames.isEmpty) None
    else Some(AviInfo(w, h, bits, codec, frames.toIndexedSeq))
  }

  /**
   * Decode one AVI video frame to a top-down pixel grid. DIB frames are
   * raw bottom-up 24bpp pixel data with the BMP 4-byte row padding (no
   * per-frame header — geometry comes from the stream's
   * BITMAPINFOHEADER); MJPG frames are standalone JPEGs routed through
   * the capped ImageIO path, with a geometry check against the declared
   * stream dims so a hostile oversized frame can't bypass the
   * header-level bomb guard. None on any structural violation.
   */
  private[multimodal] def aviFramePixels(b: Array[Byte], info: AviInfo,
      frame: Int, maxPixels: Long = maxPixelsForDecode): Option[Pixels] = {
    if (frame < 0 || frame >= info.frames.length) return None
    val (fOff, fLen) = info.frames(frame)
    val w = info.width; val h = info.height
    if (w.toLong * h > maxPixels) return None
    info.codec match {
      case "DIB " =>
        val stride = ((w.toLong * 3 + 3) / 4) * 4
        if (stride * h > fLen || fOff.toLong + fLen > b.length) None
        else {
          val out = new Array[Int](w * h)
          var row = 0
          while (row < h) {
            val dispRow = h - 1 - row // AVI DIBs are bottom-up
            val base = fOff + row * stride.toInt
            var x = 0
            while (x < w) {
              val p = base + 3 * x // BGR per spec
              out(dispRow * w + x) =
                ((b(p + 2) & 0xff) << 16) | ((b(p + 1) & 0xff) << 8) | (b(p) & 0xff)
              x += 1
            }
            row += 1
          }
          Some(Pixels(w, h, out))
        }
      case "MJPG" =>
        if (fOff.toLong + fLen > b.length) None
        else pixels(java.util.Arrays.copyOfRange(b, fOff, fOff + fLen), maxPixels)
          // ADVICE r5: enforce the documented geometry check — a frame
          // whose decoded dims differ from the stream header is a
          // structural violation, not a bigger/smaller frame to hash
          .filter(p => p.width == w && p.height == h)
      case _ => None
    }
  }

  /** Decoded pixel grid: packed 0xRRGGBB ints, row-major TOP-DOWN
    * regardless of the container's storage order (bottom-up BMPs are
    * flipped), so spatial hashes see the same geometry per format. */
  final case class Pixels(width: Int, height: Int, rgb: Array[Int])

  /** Pixel cap for [[pixels]]: beyond ~67M pixels (8192×8192) the
    * integer cross-multiplication in ImageHash's exact box-mean compare
    * could overflow a Long; a crawl pipeline downscales before hashing
    * anyway, so larger payloads degrade to None like any parse failure. */
  val maxPixelsForDecode: Long = 1L << 26

  /**
   * ImageIO decode with the dimension check BEFORE pixel allocation:
   * a hostile web payload can be a decompression bomb — a few hundred
   * bytes of PNG declaring 30000×30000 pixels would make a naive
   * `ImageIO.read` allocate gigabytes per row. The reader API exposes
   * the header dimensions without decoding, so oversized payloads are
   * rejected for the cost of a header parse. None on any failure.
   */
  private def readImageCapped(b: Array[Byte],
      maxPixels: Long): Option[java.awt.image.BufferedImage] =
    try {
      // MemoryCacheImageInputStream explicitly: the createImageInputStream
      // factory defaults to a FILE-cache stream, which would write every
      // in-memory payload to a tmpdir file per row — needless disk and
      // file-handle churn on a path that runs millions of times per stage
      val in = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(b))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        if (!readers.hasNext) return None
        val reader = readers.next()
        try {
          reader.setInput(in, true, true)
          val w = reader.getWidth(0); val h = reader.getHeight(0)
          if (w <= 0 || h <= 0 || w.toLong * h > maxPixels) return None
          Some(reader.read(0))
        } finally reader.dispose()
      } finally in.close()
    } catch { case _: java.io.IOException | _: RuntimeException => None }

  /**
   * Decode a JPEG or PNG through the JDK's ImageIO plugins (headless-
   * safe; no native libs). Channel means are exact integer sums over
   * `getRGB` (sRGB-converted pixels) divided once — deterministic
   * across partitionings; PNG roundtrips its encoded pixels exactly
   * (lossless), so fixture means are hand-computable a priori. `bits`
   * reports the decoded color model's pixel size (24 for opaque RGB,
   * 32 with alpha). Any parse failure (truncated stream, unsupported
   * variant) or a payload declaring more than `maxPixels` pixels
   * (decompression-bomb guard, see [[readImageCapped]]) → None →
   * format="unknown" upstream.
   */
  def parseImageIO(b: Array[Byte],
      maxPixels: Long = maxPixelsForDecode): Option[BmpInfo] = {
    val kind = detect(b)
    if (kind != "png" && kind != "jpeg") return None
    try {
      val img = readImageCapped(b, maxPixels).orNull
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) return None
      val w = img.getWidth; val h = img.getHeight
      var sr = 0L; var sg = 0L; var sb = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      Some(BmpInfo(w, h, img.getColorModel.getPixelSize,
        round6(sr.toDouble / n), round6(sg.toDouble / n),
        round6(sb.toDouble / n)))
    } catch { case _: java.io.IOException | _: RuntimeException => None }
  }

  /**
   * Full pixel-grid decode for every image format this container can
   * parse (BMP via the spec parser's field validation, PNG/JPEG via
   * ImageIO) — the input to perceptual hashing, where spatial layout
   * matters, unlike the order-free channel means above. Output rows are
   * always top-down (bottom-up BMPs flipped here, once), packed
   * 0xRRGGBB. None for non-images, structural violations, and payloads
   * past `maxPixels` — checked from the HEADER dimensions before any
   * pixel allocation on every format (BMP dims live in the DIB header;
   * ImageIO dims come from [[readImageCapped]]'s metadata read), so a
   * decompression bomb costs a header parse, not gigabytes.
   */
  def pixels(b: Array[Byte],
      maxPixels: Long = maxPixelsForDecode): Option[Pixels] = detect(b) match {
    case "bmp" =>
      bmpHeader(b).flatMap { case (pixelOff, w, hRaw, stride) =>
        val h = math.abs(hRaw)
        if (w.toLong * h > maxPixels) None
        else {
          val out = new Array[Int](w * h)
          var row = 0
          while (row < h) {
            // storage row `row` lands at display row `row` (top-down) or
            // `h-1-row` (bottom-up, positive header height)
            val dispRow = if (hRaw < 0) row else h - 1 - row
            val base = pixelOff + row * stride
            var x = 0
            while (x < w) {
              val p = base + 3 * x // BGR per spec
              out(dispRow * w + x) =
                ((b(p + 2) & 0xff) << 16) | ((b(p + 1) & 0xff) << 8) | (b(p) & 0xff)
              x += 1
            }
            row += 1
          }
          Some(Pixels(w, h, out))
        }
      }
    case "png" | "jpeg" =>
      try {
        val img = readImageCapped(b, maxPixels).orNull
        if (img == null || img.getWidth <= 0 || img.getHeight <= 0) return None
        val w = img.getWidth; val h = img.getHeight
        val out = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            out(y * w + x) = img.getRGB(x, y) & 0xffffff
            x += 1
          }
          y += 1
        }
        Some(Pixels(w, h, out))
      } catch { case _: java.io.IOException | _: RuntimeException => None }
    case _ => None
  }
}
