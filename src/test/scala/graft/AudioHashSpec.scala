package graft

import graft.fixtures.MediaGen
import graft.multimodal.{AudioHash, Media}

/** Perceptual audio eHash (multimodal/AudioHash) against hand-derived
  * bit patterns on spec-conformant WAV writer output, plus the
  * end-to-end media-table near-dup path. */
class AudioHashSpec extends SparkSpec {
  import spark.implicits._

  private def frames(ampOf: Int => Int): Seq[Short] =
    (0 until 65).flatMap(k => Seq.fill(16)(ampOf(k).toShort))

  test("ramp sets every bit, constant none, alternating frames 0x55 pattern") {
    assert(AudioHash.ehash64(
      MediaGen.wav(Seq.tabulate(1040)(i => i.toShort), 8000, 1)).contains(-1L))
    assert(AudioHash.ehash64(
      MediaGen.wav(Seq.fill(1040)(1000.toShort), 8000, 1)).contains(0L))
    assert(AudioHash.ehash64(MediaGen.wav(
      frames(k => if (k % 2 == 0) 2000 else 100), 8000, 1))
      .contains(0x5555555555555555L))
  }

  test("ramp-up-then-down sets exactly the top 32 bits (equal boundary)") {
    // frames 32 and 33 carry EQUAL energy (amp 960 both) — the
    // strictly-less comparison must leave bit 31 clear
    val h = AudioHash.ehash64(MediaGen.wav(
      frames(k => if (k <= 32) k * 30 else (65 - k) * 30), 8000, 1))
    assert(h.contains(-4294967296L))
  }

  test("frame slicing is sample-exact: one louder sample flips one bit") {
    // constant 100s with ONE sample at 101 inside frame 5: frame 5's
    // mean energy rises a fraction — cross-multiplication must see it
    val base = Array.fill[Short](1040)(100)
    val bumped = base.clone(); bumped(5 * 16 + 3) = 101
    assert(AudioHash.ehash64(
      MediaGen.wav(base.toSeq, 8000, 1)).contains(0L))
    val h = AudioHash.ehash64(MediaGen.wav(bumped.toSeq, 8000, 1)).get
    // bit for frames (4,5) at 63-4 set; bit for (5,6) at 63-5 clear
    assert(h == (1L << 59), f"got $h%016x")
  }

  test("gain invariance of the pattern, not the hash of silence") {
    // doubling every sample scales every frame energy by 4 — the
    // delta SIGNS, hence the hash, are unchanged (the robustness that
    // makes re-encoded copies near-dups)
    val pat = frames(k => (k * 7) % 90 + 10)
    val h1 = AudioHash.ehash64(MediaGen.wav(pat, 8000, 1))
    val h2 = AudioHash.ehash64(
      MediaGen.wav(pat.map(s => (s * 2).toShort), 8000, 1))
    assert(h1.isDefined && h1 == h2)
  }

  test("stereo behind a decoy LIST chunk; sub-frame, cap, non-audio are None") {
    assert(AudioHash.ehash64(MediaGen.wav(
      Seq.fill(1040)(500.toShort), 44100, 2, extraChunk = true)).contains(0L))
    assert(AudioHash.ehash64(
      MediaGen.wav(Seq.fill(64)(100.toShort), 8000, 1)).isEmpty)
    assert(AudioHash.ehash64("not audio".getBytes("UTF-8")).isEmpty)
    assert(AudioHash.ehash64(
      MediaGen.bmp(2, 2, Seq.fill(4)((9, 9, 9)))).isEmpty)
    assert(AudioHash.ehash64(Array.emptyByteArray).isEmpty)
  }

  test("audioNearDupPairs: three renders of one envelope pair up") {
    // same envelope at three gains -> identical hashes (hamming 0);
    // the reversed envelope and an image payload pair with nothing
    val pat = frames(k => (k % 13) * 7 + 5)
    def scaled(g: Int) = MediaGen.wav(pat.map(s => (s * g).toShort), 8000, 1)
    val media = Seq(
      (1L, scaled(1)), (2L, scaled(2)), (3L, scaled(3)),
      (4L, MediaGen.wav(pat.reverse, 8000, 1)),
      (5L, MediaGen.bmp(2, 2, Seq.fill(4)((9, 9, 9))))).toDF("media_id", "bytes")
    val got = Media.audioNearDupPairs(media)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((1L, 2L, 0), (1L, 3L, 0), (2L, 3L, 0)))
  }

  test("AudioScale pattern WAV hashes to its pattern (boundary-curve invariant)") {
    import graft.tools.AudioScale
    for (p <- Seq(0L, -1L, 0x123456789abcdefL, -987654321L, Long.MinValue))
      assert(AudioHash.ehash64(AudioScale.patternWavBytes(p)).contains(p))
  }

  test("stereo frames hold whole L/R pairs: channel swap never moves a bit") {
    // 131 multichannel samples: 65 ∤ 131, so frame boundaries fall at
    // odd interleaved indices — the exact case where slicing the raw
    // interleaved stream would split an L/R pair across two energy
    // frames. With pair-aligned framing, swapping the channels permutes
    // samples WITHIN frames only, so the energies (and the hash) are
    // invariant; the pre-fix slicing fails this for seeded random pairs.
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(131)((rnd.nextInt(4000) - 2000, rnd.nextInt(4000) - 2000))
    def wavOf(ps: Seq[(Int, Int)]) = MediaGen.wav(
      ps.flatMap { case (l, r) => Seq(l.toShort, r.toShort) }, 8000, 2)
    val a = AudioHash.ehash64(wavOf(pairs))
    val b = AudioHash.ehash64(wavOf(pairs.map(_.swap)))
    assert(a.nonEmpty && a == b)
  }
}
