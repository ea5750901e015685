package graft

import graft.fixtures.MediaGen
import graft.multimodal.{Codecs, ImageHash, Media, VideoHash}
import org.apache.spark.sql.functions._

/** Video keyframe dHash (multimodal/VideoHash over Codecs.aviScan)
  * against hand-derived constants on spec-conformant writer output:
  * the same analytic 9×8 patterns ImageHashSpec pins (gradient → -1,
  * solid → 0, alternating → 0x5555…) carried as AVI DIB / MJPEG
  * frames, the container walk's stream-number and decoy discipline,
  * and the clip-level near-dup fold. */
class VideoHashSpec extends SparkSpec {
  import spark.implicits._

  private def gray9x8(vOf: Int => Int): Seq[(Int, Int, Int)] =
    (0 until 8).flatMap(_ => (0 until 9).map { x => val v = vOf(x); (v, v, v) })

  private val grad = MediaGen.dibFrame(9, 8, gray9x8(_ * 10))
  private val solid = MediaGen.dibFrame(9, 8, Seq.fill(72)((128, 128, 128)))
  private val alt = MediaGen.dibFrame(9, 8,
    gray9x8(x => if (x % 2 == 0) 200 else 100))

  test("DIB frames hash to the analytic image constants, in frame order") {
    val b = MediaGen.avi(9, 8, "DIB ", Seq(grad, solid, alt))
    assert(Codecs.detect(b) == "avi")
    assert(VideoHash.frameHashes(b).contains(Seq(
      (0, Some(-1L)), (1, Some(0L)), (2, Some(0x5555555555555555L)))))
  }

  test("MJPEG frames route through ImageIO: solid frame hashes to 0") {
    val b = MediaGen.avi(16, 16, "MJPG",
      Seq(MediaGen.jpegSolid(16, 16, 128, 128, 128)))
    assert(VideoHash.frameHashes(b).contains(Seq((0, Some(0L)))))
  }

  test("stream numbering: an audio-first AVI's video frames are 01db") {
    val b = MediaGen.avi(9, 8, "DIB ", Seq(grad), audioFirst = true)
    assert(VideoHash.frameHashes(b).contains(Seq((0, Some(-1L)))))
  }

  test("interleaved layout: frames inside LIST('rec ') sublists are found") {
    val b = MediaGen.avi(9, 8, "DIB ", Seq(grad, solid), recWrap = true)
    assert(VideoHash.frameHashes(b).contains(Seq(
      (0, Some(-1L)), (1, Some(0L)))))
  }

  test("JUNK decoy carrying a 00db banner is skipped by chunk length") {
    val b = MediaGen.avi(9, 8, "DIB ", Seq(grad, solid), junk = true)
    assert(VideoHash.frameHashes(b).contains(Seq(
      (0, Some(-1L)), (1, Some(0L)))))
  }

  test("even sampling: 10 frames at maxFrames=4 take indices 0,2,5,7") {
    val b = MediaGen.avi(9, 8, "DIB ",
      (0 until 10).map(i => if (i == 5) grad else solid))
    val hs = VideoHash.frameHashes(b, maxFrames = 4).get
    assert(hs.map(_._1) == Seq(0, 2, 5, 7))
    assert(hs(2)._2.contains(-1L) && hs(0)._2.contains(0L))
  }

  test("hostile inputs degrade, never throw") {
    assert(VideoHash.frameHashes("not a video".getBytes("UTF-8")).isEmpty)
    val valid = MediaGen.avi(9, 8, "DIB ", Seq(grad))
    // truncation anywhere in the container → structural None
    assert(VideoHash.frameHashes(valid.take(valid.length - 10)).isEmpty)
    // a frame payload shorter than the declared geometry → that frame
    // degrades to a null hash; the container stays parseable
    val shortFrame = MediaGen.avi(9, 8, "DIB ", Seq(grad.take(10), solid))
    assert(VideoHash.frameHashes(shortFrame).contains(Seq(
      (0, None), (1, Some(0L)))))
    // h264-style fourcc is honestly not decodable here → None
    val h264 = MediaGen.avi(9, 8, "MJPG", Seq(grad))
    val idx = {
      val s = new String(h264.map(_.toChar))
      s.indexOf("MJPG", s.indexOf("strf"))
    }
    val mutated = h264.clone()
    Array('H', '2', '6', '4').map(_.toByte).copyToArray(mutated, idx)
    assert(VideoHash.frameHashes(mutated).isEmpty)
  }

  test("videoHashTable: frame-grain rows, null rows for other formats") {
    val media = Seq(
      (1L, MediaGen.avi(9, 8, "DIB ", Seq(grad, solid))),
      (2L, "not a video".getBytes("UTF-8")),
      (3L, MediaGen.wav(Seq[Short](0, 1, 2, 3), 8000, 1)))
      .toDF("media_id", "bytes")
    val rows = Media.videoHashTable(media).orderBy("media_id", "frame_idx")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1 else r.getInt(2),
        if (r.isNullAt(3)) null else r.getLong(3)))
    assert(rows.toSeq == Seq(
      (1L, "avi", 0, -1L), (1L, "avi", 1, 0L),
      (2L, "unknown", -1, null), (3L, "wav", -1, null)))
  }

  test("VideoScale pattern AVI hashes to its pattern (boundary-curve invariant)") {
    import graft.tools.{ImageScale, VideoScale}
    for (p <- Seq(0L, -1L, 0x123456789abcdefL, -987654321L, Long.MinValue)) {
      assert(VideoHash.frameHashes(VideoScale.patternAviBytes(p))
        .contains(Seq((0, Some(p)))))
      // and it agrees with the image-side construction of the same pattern
      assert(ImageHash.dhash64(ImageScale.patternBmpBytes(p)).contains(p))
    }
  }

  test("clip-level near-dup fold: matched frames count, self-pairs drop") {
    // B = A with one boundary-cell perturbation in frame 0 (hamming 1);
    // C shares no frame within distance 3 of anything
    val gradHam1 = MediaGen.dibFrame(9, 8,
      (0 until 8).flatMap(y => (0 until 9).map { x =>
        val v = if (y == 0 && x == 8) 70 else x * 10; (v, v, v) }))
    val media = Seq(
      (10L, MediaGen.avi(9, 8, "DIB ", Seq(grad, solid))),
      (20L, MediaGen.avi(9, 8, "DIB ", Seq(gradHam1, solid))),
      (30L, MediaGen.avi(9, 8, "DIB ", Seq(alt))))
      .toDF("media_id", "bytes")
    val pairs = Media.videoNearDupPairs(media, maxBucketSize = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3)))
    assert(pairs.toSeq == Seq((10L, 20L, 2L, 0)))
  }
}
