package graft.multimodal

/**
 * Perceptual video fingerprinting — the fourth modality on the shared
 * near-dup kernel (text simhash / image dHash / audio eHash / video
 * keyframe dHash, all joined by `TextOps.hammingNearDupPairs`).
 *
 * A video's signature is the dHash of each sampled keyframe: re-encoded,
 * re-muxed, or lightly edited copies of a clip keep their frames'
 * gradient structure, so corresponding keyframes land within small
 * Hamming distance while different footage diverges. The container walk
 * (`Codecs.aviScan`) and the per-frame hash (`ImageHash.dhash64`) are
 * both exact-integer and allocation-capped, so the whole path inherits
 * the engine's determinism and hostile-input discipline; only the two
 * codecs a pure JVM decodes are accepted (uncompressed DIB and
 * motion-JPEG — h264 et al. stay behind the loudly-stubbed
 * `Media.decodeStub`, which genuinely needs native libs).
 */
object VideoHash {

  /** Default keyframe budget per clip: enough to make two different
    * programs collide on ALL sampled frames vanishingly unlikely, small
    * enough that the per-clip decode cost is bounded regardless of the
    * container's frame count. */
  val defaultMaxFrames = 8

  /**
   * Sampled keyframe dHashes of an AVI payload: up to `maxFrames`
   * evenly-spaced frames (frame k of m samples original index
   * `⌊k·n/m⌋` — deterministic, no wall-clock, same grid for equal-length
   * copies), each decoded and hashed through the capped image path.
   * Returns (originalFrameIndex, Some(dhash) | None-for-undecodable);
   * None overall for non-AVI / structurally invalid payloads. A hostile
   * frame inside a valid container degrades to a null hash for that
   * frame only — one bad GOP doesn't hide the rest of the clip.
   */
  def frameHashes(b: Array[Byte], maxFrames: Int = defaultMaxFrames)
      : Option[Seq[(Int, Option[Long])]] =
    Codecs.aviScan(b).map { info =>
      val n = info.frames.length
      val m = math.min(math.max(maxFrames, 1), n)
      (0 until m).map { k =>
        val idx = ((k.toLong * n) / m).toInt
        (idx, Codecs.aviFramePixels(b, info, idx).flatMap(ImageHash.dhash64))
      }
    }
}
