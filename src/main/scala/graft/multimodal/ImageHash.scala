package graft.multimodal

/**
 * Perceptual image hashing for near-duplicate image detection — the
 * image-side analog of text simhash in a training-data pipeline (the
 * LAION-style dedup stage: CSAM/spam clusters and re-crawled thumbnails
 * collapse under a 64-bit difference hash long before embedding models
 * enter the picture).
 *
 * dHash (difference hash†, widely documented public algorithm): scale
 * the grayscale image to a 9×8 grid of box means, emit one bit per
 * horizontally adjacent cell pair — bit = 1 iff left mean < right mean.
 * 64 bits total; near-duplicate images (recompression, mild crops,
 * brightness shifts that preserve gradients) land within a small
 * Hamming distance, so the banded Hamming join used for text simhash
 * (`TextOps.hammingNearDupPairs`) applies unchanged to images.
 *
 * Determinism contract (the engine-wide reproducibility discipline):
 * grayscale is integer BT.601 luma (299r + 587g + 114b — the float
 * coefficients ×1000, no rounding), box means are exact integer sums,
 * and the mean comparison is the cross-multiplication
 * `sumL·nR < sumR·nL` — no division anywhere, so the hash is
 * bit-identical across JVMs, partitionings, and SIMD flags. Overflow
 * is excluded by `Codecs.maxPixelsForDecode` (sum ≤ 255e3·|box|,
 * |box| ≤ 2^26/72·(9/8)² → product < 2^59).
 */
object ImageHash {

  /** Integer BT.601 luma ×1000 of a packed 0xRRGGBB pixel (0..254745). */
  @inline private def luma(rgb: Int): Long =
    299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)

  private val Cols = 9
  private val Rows = 8

  /**
   * 64-bit difference hash of a decoded pixel grid. Bit layout is
   * row-major MSB-first: the comparison of grid cells (r, c) vs
   * (r, c+1) lands at bit `63 - (r*8 + c)` — so an image whose
   * brightness strictly increases left to right in every row hashes to
   * all-ones (-1L) and a solid image to 0L, which is what makes the
   * q_image_dhash VALUES oracle hand-derivable. Images narrower than
   * the 9×8 grid have no well-defined boxes → None (a pipeline
   * upscaling 5-pixel icons to hash them would only manufacture
   * collisions).
   */
  def dhash64(px: Codecs.Pixels): Option[Long] = {
    val w = px.width; val h = px.height
    if (w < Cols || h < Rows) return None
    // box sums of the 9×8 grid; box (r,c) covers x ∈ [c·w/9, (c+1)·w/9),
    // y ∈ [r·h/8, (r+1)·h/8) — exact cover, no pixel shared or dropped
    val sums = new Array[Long](Rows * Cols)
    val cnts = new Array[Long](Rows * Cols)
    var y = 0
    while (y < h) {
      val gr = ((y.toLong * Rows) / h).toInt
      var x = 0
      while (x < w) {
        val gc = ((x.toLong * Cols) / w).toInt
        val cell = gr * Cols + gc
        sums(cell) += luma(px.rgb(y * w + x))
        cnts(cell) += 1
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var r = 0
    while (r < Rows) {
      var c = 0
      while (c < Cols - 1) {
        val l = r * Cols + c
        // meanL < meanR without division: sumL/nL < sumR/nR
        if (sums(l) * cnts(l + 1) < sums(l + 1) * cnts(l))
          hash |= 1L << (63 - (r * (Cols - 1) + c))
        c += 1
      }
      r += 1
    }
    Some(hash)
  }

  /** Decode + hash in one step; None for non-images, undecodable
    * payloads, and sub-grid images. */
  def dhash64(bytes: Array[Byte]): Option[Long] =
    Codecs.pixels(bytes).flatMap(dhash64)
}
