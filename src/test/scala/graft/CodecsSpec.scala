package graft

import graft.fixtures.MediaGen
import graft.multimodal.{Codecs, Media}

/** Real WAV-PCM/BMP/PNG/JPEG decoders (multimodal/Codecs) against
  * hand-computed signal/pixel math on spec-conformant writer output
  * (MediaGen; PNG/JPEG through the JDK's own ImageIO encoders). */
class CodecsSpec extends SparkSpec {
  import spark.implicits._

  private val wavMono = MediaGen.wav(Seq[Short](0, 1000, -1000, 0), 8000, 1)
  private val wavStereo =
    MediaGen.wav(Seq[Short](100, -100, 200, -200), 44100, 2, extraChunk = true)
  private val bmpUp = MediaGen.bmp(2, 2,
    Seq((10, 20, 30), (40, 50, 60), (70, 80, 90), (100, 110, 120)))
  private val bmpDown = MediaGen.bmp(3, 1,
    Seq((1, 2, 3), (4, 5, 6), (7, 8, 9)), topDown = true)

  test("mono PCM: duration, peak, rms, zero crossings hand-checked") {
    val w = Codecs.parseWav(wavMono).get
    assert(w.sampleRate == 8000 && w.channels == 1 && w.bits == 16)
    assert(w.nSamples == 4L && w.durationSec == 0.0005 && w.peak == 1000)
    assert(w.rms == 707.106781) // sqrt(2_000_000 / 4) to 6 decimals
    assert(w.zeroCrossings == 2L)
  }

  test("stereo PCM behind a decoy LIST chunk whose payload contains 'data'") {
    val w = Codecs.parseWav(wavStereo).get
    assert(w.sampleRate == 44100 && w.channels == 2)
    assert(w.nSamples == 4L && w.durationSec == 0.000045) // 4/2/44100
    assert(w.peak == 200 && w.rms == 158.113883) // sqrt(100_000 / 4)
    assert(w.zeroCrossings == 3L)
  }

  test("truncated data chunk clamps to the bytes actually present") {
    val w = Codecs.parseWav(wavMono.dropRight(2)).get
    assert(w.nSamples == 3L && w.durationSec == 0.000375)
    assert(w.rms == 816.496581) // sqrt(2_000_000 / 3)
    assert(w.zeroCrossings == 1L)
  }

  test("bottom-up BMP with row padding: exact channel means") {
    val m = Codecs.parseBmp(bmpUp).get
    assert(m.width == 2 && m.height == 2 && m.bits == 24)
    assert(m.meanR == 55.0 && m.meanG == 65.0 && m.meanB == 75.0)
  }

  test("top-down BMP (negative height)") {
    val m = Codecs.parseBmp(bmpDown).get
    assert(m.width == 3 && m.height == -1)
    assert(m.meanR == 4.0 && m.meanG == 5.0 && m.meanB == 6.0)
  }

  test("structural violations degrade to None, never throw") {
    assert(Codecs.parseWav("not media at all".getBytes).isEmpty)
    assert(Codecs.parseBmp(wavMono).isEmpty)
    val bpp32 = bmpUp.clone(); bpp32(28) = 32
    assert(Codecs.parseBmp(bpp32).isEmpty)
    val nonPcm = wavMono.clone(); nonPcm(20) = 3 // IEEE-float format tag
    assert(Codecs.parseWav(nonPcm).isEmpty)
    assert(Codecs.parseWav(wavMono.take(20)).isEmpty) // mid-header truncation
  }

  test("decodeTable dispatches by magic and degrades unknowns") {
    val media = Seq(
      (1L, wavMono), (2L, wavStereo), (3L, bmpUp), (4L, bmpDown),
      (5L, "plain text payload".getBytes)).toDF("media_id", "bytes")
    val out = Media.decodeTable(media).orderBy("media_id").collect()
    assert(out.map(_.getString(1)).toSeq ==
      Seq("wav", "wav", "bmp", "bmp", "unknown"))
    assert(out(0).getDouble(10) == 707.106781) // rms column
    assert(out(2).getDouble(12) == 55.0)       // mean_r column
    assert(out(4).isNullAt(10) && out(4).isNullAt(12))
  }

  test("PNG roundtrips pixels exactly through ImageIO (lossless)") {
    val px = Seq((10, 20, 30), (40, 50, 60), (70, 80, 90), (100, 110, 120))
    val bytes = MediaGen.png(2, 2, px)
    assert(Codecs.detect(bytes) == "png")
    val m = Codecs.parseImageIO(bytes).get
    assert(m.width == 2 && m.height == 2 && m.bits == 24)
    assert(m.meanR == 55.0 && m.meanG == 65.0 && m.meanB == 75.0)
  }

  test("solid-gray JPEG decodes to the exact color (DC-only blocks)") {
    val bytes = MediaGen.jpegSolid(16, 16, 128, 128, 128)
    assert(Codecs.detect(bytes) == "jpeg")
    val m = Codecs.parseImageIO(bytes).get
    assert(m.width == 16 && m.height == 16 && m.bits == 24)
    assert(m.meanR == 128.0 && m.meanG == 128.0 && m.meanB == 128.0,
      s"jpeg roundtrip drifted: ${(m.meanR, m.meanG, m.meanB)}")
  }

  test("truncated PNG/JPEG degrade to None, never throw") {
    val png = MediaGen.png(2, 2, Seq.fill(4)((1, 2, 3)))
    assert(Codecs.parseImageIO(png.take(20)).isEmpty)
    val jpg = MediaGen.jpegSolid(8, 8, 0, 0, 0)
    assert(Codecs.parseImageIO(jpg.take(8)).isEmpty)
    assert(Codecs.parseImageIO("not an image".getBytes).isEmpty)
  }

  test("hostile WAV chunk sizes degrade to None, never throw") {
    // a junk chunk declaring size ~2^31 used to wrap the Int walk
    // offset negative, keep the loop guard true, and index out of
    // bounds — crashing a Spark task instead of degrading
    def riff(chunkSize: Int): Array[Byte] = {
      val b = new Array[Byte](28)
      def le32(o: Int, v: Int): Unit = {
        b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
        b(o + 2) = (v >> 16).toByte; b(o + 3) = (v >> 24).toByte
      }
      "RIFF".zipWithIndex.foreach { case (c, i) => b(i) = c.toByte }
      le32(4, 20)
      "WAVE".zipWithIndex.foreach { case (c, i) => b(8 + i) = c.toByte }
      "JUNK".zipWithIndex.foreach { case (c, i) => b(12 + i) = c.toByte }
      le32(16, chunkSize)
      b
    }
    assert(Codecs.parseWav(riff(0x7ffffff0)).isEmpty)
    assert(graft.multimodal.AudioHash.ehash64(riff(0x7ffffff0)).isEmpty)
    assert(Codecs.parseWav(riff(-8)).isEmpty) // negative size: also None
  }

  test("hostile BMP headers degrade to None, never throw") {
    // hand-built 54-byte headers with adversarial geometry fields —
    // cases a crawl WILL deliver that MediaGen's honest writer can't
    def header(w: Int, h: Int): Array[Byte] = {
      val b = new Array[Byte](54)
      def le32(o: Int, v: Int): Unit = {
        b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
        b(o + 2) = (v >> 16).toByte; b(o + 3) = (v >> 24).toByte
      }
      b(0) = 'B'.toByte; b(1) = 'M'.toByte
      le32(2, 54); le32(10, 54); le32(14, 40)
      le32(18, w); le32(22, h); b(26) = 1; b(28) = 24
      b
    }
    // height = Int.MinValue: math.abs is STILL negative — slipped the
    // old h == 0 check, skipped the bounds walk, and made the pixel
    // path throw NegativeArraySizeException inside a Spark task
    assert(Codecs.parseBmp(header(1, Int.MinValue)).isEmpty)
    assert(Codecs.pixels(header(1, Int.MinValue)).isEmpty)
    // width whose w*3 wraps Int: the old Int stride corrupted the
    // bounds check into admitting out-of-range reads
    assert(Codecs.parseBmp(header(0x55555557, 1)).isEmpty)
    assert(Codecs.pixels(header(0x55555557, 1)).isEmpty)
    // negative width / zero height / negative pixel offset
    assert(Codecs.parseBmp(header(-4, 4)).isEmpty)
    assert(Codecs.parseBmp(header(4, 0)).isEmpty)
    val negOff = header(2, 2); negOff(10) = -1; negOff(13) = -1
    assert(Codecs.parseBmp(negOff).isEmpty && Codecs.pixels(negOff).isEmpty)
  }

  test("decodeTable handles png and jpeg rows") {
    val media = Seq(
      (1L, MediaGen.png(2, 2, Seq((10, 20, 30), (40, 50, 60),
        (70, 80, 90), (100, 110, 120)))),
      (2L, MediaGen.jpegSolid(16, 16, 128, 128, 128)))
      .toDF("media_id", "bytes")
    val out = Media.decodeTable(media).orderBy("media_id").collect()
    assert(out.map(_.getString(1)).toSeq == Seq("png", "jpeg"))
    assert(out(0).getInt(2) == 2 && out(0).getDouble(12) == 55.0)
    assert(out(1).getInt(2) == 16 && out(1).getDouble(13) == 128.0)
  }

  test("JPEG decoder identity: the JDK-bundled plugin serves the fixtures") {
    // the q_media_decode/q_image_dhash JPEG constants (means 128.0,
    // dhash 0) were derived under the container JDK (OpenJDK 17,
    // com.sun.imageio JPEG plugin). A swapped-in third-party ImageIO
    // reader with different IDCT rounding must fail HERE, at the named
    // assumption, not as an opaque oracle hash mismatch downstream.
    val in = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(MediaGen.jpegSolid(8, 8, 1, 2, 3)))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      assert(readers.hasNext, "no JPEG reader installed")
      val cls = readers.next().getClass.getName
      assert(cls == "com.sun.imageio.plugins.jpeg.JPEGImageReader",
        s"JPEG fixtures pinned to the JDK decoder, but reader is $cls")
    } finally in.close()
  }
}
