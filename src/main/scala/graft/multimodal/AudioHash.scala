package graft.multimodal

/**
 * Perceptual audio fingerprinting — the audio-side analog of image
 * dHash, completing the modality triple (text simhash / image dHash /
 * audio eHash) over ONE shared near-dup join kernel
 * (`TextOps.hammingNearDupPairs`).
 *
 * eHash (energy-difference fingerprint): split the PCM-16 sample
 * stream into 65 equal frames, take each frame's energy (exact integer
 * sum of squares), emit one bit per adjacent frame pair — bit = 1 iff
 * the earlier frame's MEAN energy is strictly below the later's. This
 * is the sign-of-energy-delta idea behind the Philips robust-hash
 * family (Haitsma & Kalker 2002†, collapsed to one time-domain band —
 * no FFT dependency, which this container doesn't have): re-encoded,
 * resampled, or gain-shifted copies of a clip keep their energy
 * ENVELOPE shape, so near-duplicates land within small Hamming
 * distance while different programs diverge.
 *
 * Determinism contract (same discipline as ImageHash): energies are
 * exact Long sums of s², frames are compared by cross-multiplication
 * `sumL·nR < sumR·nL` (frame lengths differ by ±1 multichannel sample
 * when 65 doesn't divide n/channels — no division, no floats
 * anywhere), so the hash is
 * bit-identical across JVMs and partitionings. Overflow is excluded by
 * [[maxSamplesForHash]]: sum ≤ 2^30·(2^22/65) < 2^46, count ≤ 2^16,
 * product < 2^62.
 */
object AudioHash {

  private val Frames = 65

  /** Sample cap: 2^22 interleaved PCM-16 samples (~95 s of 22.05 kHz
    * stereo). Beyond it the exact cross-multiplication could overflow;
    * a crawl pipeline fingerprints bounded snippets anyway, so longer
    * payloads degrade to None like any structural violation. */
  val maxSamplesForHash: Long = 1L << 22

  /**
   * 64-bit energy-difference hash of a WAV-PCM payload. Bit layout is
   * MSB-first: the comparison of frames (k, k+1) lands at bit
   * `63 - k` — so a clip whose energy ramps up monotonically hashes to
   * all-ones (-1L), constant energy to 0L, which makes the
   * q_audio_ehash VALUES oracle hand-derivable. Channels are not
   * unmixed — per-channel energies add and the envelope survives — but
   * frame boundaries are aligned to whole multichannel samples: frame
   * assignment runs over the n/channels sample FRAMES, so an L/R pair
   * is never split across two energy frames when 65 doesn't divide the
   * count (a trailing partial multichannel sample, only possible in a
   * malformed clip, is ignored). None for non-WAV payloads, clips
   * shorter than one multichannel sample per frame, and clips past the
   * cap.
   */
  def ehash64(b: Array[Byte]): Option[Long] =
    Codecs.wavHeader(b).flatMap { case (ch, _, dOff, dLen) =>
      val n = dLen / 2
      val nf = n / ch // whole multichannel sample frames
      if (nf < Frames || n > maxSamplesForHash) None
      else {
        val sums = new Array[Long](Frames)
        val cnts = new Array[Long](Frames)
        var j = 0
        while (j < nf) {
          val f = ((j.toLong * Frames) / nf).toInt
          var c = 0
          while (c < ch) {
            // the same LE-16 decode parseWav applies to this data chunk
            val s = Codecs.le16(b, dOff + 2 * (j * ch + c)).toShort.toLong
            sums(f) += s * s
            c += 1
          }
          cnts(f) += ch
          j += 1
        }
        var hash = 0L
        var k = 0
        while (k < Frames - 1) {
          // meanE(k) < meanE(k+1) without division
          if (sums(k) * cnts(k + 1) < sums(k + 1) * cnts(k))
            hash |= 1L << (63 - k)
          k += 1
        }
        Some(hash)
      }
    }
}
