package graft

import graft.fixtures.MediaGen
import graft.multimodal.{AudioHash, Codecs, ImageHash, VideoHash}

/** Structured adversarial fuzz over every pure-JVM decoder: random
  * truncations and byte flips of every VALID fixture pushed through
  * decode / dhash / ehash / frame-hash must never throw — hostile
  * bytes degrade to None (or a shorter/different-but-well-formed
  * parse), the engine-wide hostile-input contract CodecsSpec pins
  * point-wise with hand-built cases. Seeded xorshift mutations: the
  * battery is deterministic, a failure reproduces. */
class CodecsFuzzSpec extends SparkSpec {

  private def gray9x8(vOf: Int => Int): Seq[(Int, Int, Int)] =
    (0 until 8).flatMap(_ => (0 until 9).map { x => val v = vOf(x); (v, v, v) })

  private val fixtures: Seq[(String, Array[Byte])] = Seq(
    "wav_mono" -> MediaGen.wav(Seq.tabulate(1040)(i => i.toShort), 8000, 1),
    "wav_stereo_decoy" -> MediaGen.wav(Seq.fill(1040)(500.toShort), 44100, 2,
      extraChunk = true),
    "bmp_up" -> MediaGen.bmp(9, 8, gray9x8(_ * 10)),
    "bmp_down" -> MediaGen.bmp(9, 8, gray9x8(x => (8 - x) * 10), topDown = true),
    "png" -> MediaGen.png(9, 8, gray9x8(_ * 10)),
    "jpeg" -> MediaGen.jpegSolid(16, 16, 128, 128, 128),
    "avi_dib" -> MediaGen.avi(9, 8, "DIB ",
      Seq(MediaGen.dibFrame(9, 8, gray9x8(_ * 10)),
        MediaGen.dibFrame(9, 8, Seq.fill(72)((128, 128, 128)))), junk = true),
    "avi_mjpg" -> MediaGen.avi(16, 16, "MJPG",
      Seq(MediaGen.jpegSolid(16, 16, 20, 30, 40)), audioFirst = true))

  /** Every decode surface a hostile payload can reach; each must be
    * total (no throw) on arbitrary bytes. */
  private def allDecoders(b: Array[Byte]): Unit = {
    Codecs.detect(b)
    Codecs.parseWav(b)
    Codecs.parseBmp(b)
    Codecs.parseImageIO(b)
    Codecs.pixels(b)
    ImageHash.dhash64(b)
    AudioHash.ehash64(b)
    VideoHash.frameHashes(b)
  }

  private final class XorShift(seed: Long) {
    private var s = seed * 0x9e3779b97f4a7c15L + 1
    def next(): Long = { s ^= s << 13; s ^= s >>> 7; s ^= s << 17; s }
    def nextInt(bound: Int): Int = (((next() >>> 1) % bound).toInt)
  }

  test("random truncations of every valid fixture never throw") {
    for ((name, bytes) <- fixtures) {
      val rnd = new XorShift(name.hashCode.toLong)
      // every short prefix + 200 random cut points
      val cuts = (0 to math.min(64, bytes.length)) ++
        Seq.fill(200)(rnd.nextInt(bytes.length + 1))
      for (cut <- cuts) {
        try allDecoders(java.util.Arrays.copyOf(bytes, cut))
        catch { case e: Throwable =>
          fail(s"$name truncated to $cut threw ${e.getClass.getName}: ${e.getMessage}")
        }
      }
    }
  }

  test("random byte flips of every valid fixture never throw") {
    for ((name, bytes) <- fixtures) {
      val rnd = new XorShift(name.hashCode.toLong ^ 0x5deece66dL)
      for (round <- 0 until 300) {
        val mutated = bytes.clone()
        // 1..4 flips per round, anywhere including length-critical headers
        val flips = 1 + rnd.nextInt(4)
        for (_ <- 0 until flips) {
          val at = rnd.nextInt(mutated.length)
          mutated(at) = (mutated(at) ^ (1 << rnd.nextInt(8)).toByte).toByte
        }
        try allDecoders(mutated)
        catch { case e: Throwable =>
          fail(s"$name round $round threw ${e.getClass.getName}: ${e.getMessage}")
        }
      }
    }
  }

  test("deeply nested LIST recursion is depth-capped, not stack-overflowed") {
    // a few-KB payload of thousands of nested 'rec ' LISTs would blow the
    // walk's stack without the depth cap - StackOverflowError is an Error
    // no decode guard catches, so this must degrade to None instead
    val o = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = { o.write(v & 0xff); o.write((v >> 8) & 0xff)
      o.write((v >> 16) & 0xff); o.write((v >> 24) & 0xff) }
    def asc(s: String): Unit = s.foreach(c => o.write(c.toInt))
    val depth = 20000
    asc("RIFF"); le32(4 + depth * 12); asc("AVI ")
    for (d <- depth to 1 by -1) { asc("LIST"); le32(4 + (d - 1) * 12); asc("rec ") }
    val hostile = o.toByteArray
    assert(VideoHash.frameHashes(hostile).isEmpty) // None, no throw
  }

  test("hostile length fields: saturated/negative sizes in RIFF and BMP headers") {
    for ((name, bytes) <- fixtures; if bytes.length > 8) {
      // overwrite each 4-byte aligned window with extreme LE values —
      // the chunk-size / dimension overflow class the Long walks guard
      for (v <- Seq(0x7fffffff, 0x80000000, -1, 0x40000000);
           off <- 2 until math.min(bytes.length - 4, 64)) {
        val mutated = bytes.clone()
        mutated(off) = v.toByte; mutated(off + 1) = (v >> 8).toByte
        mutated(off + 2) = (v >> 16).toByte; mutated(off + 3) = (v >> 24).toByte
        try allDecoders(mutated)
        catch { case e: Throwable =>
          fail(s"$name size=$v at $off threw ${e.getClass.getName}: ${e.getMessage}")
        }
      }
    }
  }
}
