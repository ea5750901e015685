package graft

import graft.fixtures.MediaGen
import graft.multimodal.{Codecs, ImageHash, Media}
import graft.textops.TextOps
import org.apache.spark.sql.functions._

/** Perceptual dHash (multimodal/ImageHash) against hand-derived bit
  * patterns on spec-conformant writer output, decoder-geometry
  * equality across BMP/PNG, and the banded Hamming near-dup join
  * (TextOps.hammingNearDupPairs) fuzzed against brute force. */
class ImageHashSpec extends SparkSpec {
  import spark.implicits._

  private def gray9x8(vOf: Int => Int): Seq[(Int, Int, Int)] =
    (0 until 8).flatMap(_ => (0 until 9).map { x => val v = vOf(x); (v, v, v) })

  test("gradient sets every bit, solid none, alternating columns 0x55 rows") {
    assert(ImageHash.dhash64(MediaGen.bmp(9, 8, gray9x8(_ * 10))).contains(-1L))
    assert(ImageHash.dhash64(
      MediaGen.bmp(9, 8, Seq.fill(72)((128, 128, 128)))).contains(0L))
    assert(ImageHash.dhash64(MediaGen.bmp(9, 8,
      gray9x8(x => if (x % 2 == 0) 200 else 100))).contains(0x5555555555555555L))
  }

  test("box averaging: 18x16 2x2-scaled gradient hashes like its 9x8 twin") {
    val scaled = (0 until 16).flatMap(_ => (0 until 18).map { x =>
      val v = (x / 2) * 10; (v, v, v) })
    assert(ImageHash.dhash64(MediaGen.bmp(18, 16, scaled)).contains(-1L))
  }

  test("bottom-up and top-down BMP storage hash identically (split pattern)") {
    // top half ascending (bits 1), bottom half descending (bits 0):
    // a row-ASYMMETRIC pattern, so a missing flip would move the set
    // bits from the top 32 to the bottom 32
    val split = (0 until 8).flatMap(y => (0 until 9).map { x =>
      val v = if (y < 4) x * 10 else (8 - x) * 10; (v, v, v) })
    val up = ImageHash.dhash64(MediaGen.bmp(9, 8, split))
    val down = ImageHash.dhash64(MediaGen.bmp(9, 8, split, topDown = true))
    assert(up.contains(-4294967296L) && down.contains(-4294967296L))
  }

  test("PNG decodes to the same pixel geometry as BMP (equal hashes)") {
    val pats = Seq[Int => Int](_ * 10, x => (8 - x) * 10,
      x => if (x % 3 == 0) 40 else 220)
    pats.foreach { p =>
      val viaBmp = ImageHash.dhash64(MediaGen.bmp(9, 8, gray9x8(p)))
      val viaPng = ImageHash.dhash64(MediaGen.png(9, 8, gray9x8(p)))
      assert(viaBmp.isDefined && viaBmp == viaPng)
    }
  }

  test("solid JPEG roundtrips to hash 0; non-images and sub-grid are None") {
    assert(ImageHash.dhash64(MediaGen.jpegSolid(16, 16, 128, 128, 128)).contains(0L))
    assert(ImageHash.dhash64("not an image".getBytes("UTF-8")).isEmpty)
    assert(ImageHash.dhash64(MediaGen.bmp(4, 4, Seq.fill(16)((1, 2, 3)))).isEmpty)
    assert(ImageHash.dhash64(Array.emptyByteArray).isEmpty)
  }

  test("exact mean comparison: a quarter-gray-level box mean gap flips a bit") {
    // 18x16 -> 2x2-pixel boxes; ONE pixel at 101 among 100s puts box
    // (0,1)'s mean a fractional luma unit above box (0,0)'s — the
    // integer cross-multiplication must catch what a rounded mean or
    // integer division would flatten
    val px = (0 until 16).flatMap(y => (0 until 18).map { x =>
      val v = if (x == 2 && y == 0) 101 else 100; (v, v, v) })
    val h = ImageHash.dhash64(MediaGen.bmp(18, 16, px)).get
    assert((h & (1L << 63)) != 0L) // bit (r=0,c=0): 100 < 100.25-ish
    assert((h & (1L << 62)) == 0L) // bit (r=0,c=1): box1 mean > box2 mean
  }

  test("imageHashTable: format labels + null hashes ride the batched shape") {
    val df = Seq(
      (1L, MediaGen.png(9, 8, gray9x8(_ * 10))),
      (2L, "junk".getBytes("UTF-8"))).toDF("media_id", "bytes")
    val rows = Media.imageHashTable(df).orderBy("media_id").collect()
    assert(rows(0).getString(1) == "png" && rows(0).getLong(2) == -1L)
    assert(rows(1).getString(1) == "unknown" && rows(1).isNullAt(2))
  }

  test("decompression-bomb guard: oversized header dims bail before decode") {
    // the cap is read from the HEADER (BMP DIB fields / ImageIO reader
    // metadata) before any pixel allocation — probed with a tiny cap so
    // the test needs no giant fixture
    val png = MediaGen.png(9, 8, gray9x8(_ * 10))
    val bmp = MediaGen.bmp(9, 8, gray9x8(_ * 10))
    assert(Codecs.pixels(png, maxPixels = 50).isEmpty)
    assert(Codecs.pixels(bmp, maxPixels = 50).isEmpty)
    assert(Codecs.parseImageIO(png, maxPixels = 50).isEmpty)
    assert(Codecs.pixels(png).isDefined && Codecs.pixels(bmp).isDefined)
    assert(Codecs.parseImageIO(png).isDefined)
    // truncated stream degrades to None, never throws
    assert(Codecs.pixels(png.take(24)).isEmpty)
    assert(Codecs.parseImageIO(png.take(24)).isEmpty)
  }

  test("imageNearDupPairs: end-to-end decode->hash->join over a media table") {
    // three renders of the same gradient (BMP, PNG, 2x-scaled BMP) all
    // hash to -1 -> three hamming-0 pairs; the reversed gradient and a
    // junk payload pair with nothing
    val scaled = (0 until 16).flatMap(_ => (0 until 18).map { x =>
      val v = (x / 2) * 10; (v, v, v) })
    val media = Seq(
      (1L, MediaGen.bmp(9, 8, gray9x8(_ * 10))),
      (2L, MediaGen.png(9, 8, gray9x8(_ * 10))),
      (3L, MediaGen.bmp(18, 16, scaled)),
      (4L, MediaGen.png(9, 8, gray9x8(x => (8 - x) * 10))),
      (5L, "junk".getBytes("UTF-8"))).toDF("media_id", "bytes")
    val got = Media.imageNearDupPairs(media)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((1L, 2L, 0), (1L, 3L, 0), (2L, 3L, 0)))
  }

  test("boundary-mode pattern BMP hashes to its pattern; planted distances analytic") {
    import graft.tools.ImageScale
    // dhash(patternBmpBytes(P)) == P for arbitrary patterns — the
    // invariant the IMGSCALE boundary curve's expected-pair count rests on
    for (p <- Seq(0L, -1L, 0x123456789abcdefL, -987654321L, Long.MinValue))
      assert(ImageHash.dhash64(ImageScale.patternBmpBytes(p)).contains(p))
    // family member distances: 0/1/2/3 from base; cross C-D=3, C-E=4, D-E=5
    val hs = (0 until 5).map(m => ImageHash.dhash64(
      ImageScale.patternBmpBytes(ImageScale.memberPattern(42L, m))).get)
    def d(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(d(hs(0), hs(1)) == 0 && d(hs(0), hs(2)) == 1 &&
      d(hs(0), hs(3)) == 2 && d(hs(0), hs(4)) == 3)
    assert(d(hs(2), hs(3)) == 3 && d(hs(2), hs(4)) == 4 && d(hs(3), hs(4)) == 5)
  }

  test("ImageScale's direct BMP writer decodes like the spec writer") {
    // the probe writes BMP bytes in a tight loop for throughput; its
    // output must decode to the same pixel grid the readable MediaGen
    // writer would produce for those pixels
    val direct = graft.tools.ImageScale.bmpBytes(42L)
    val px = Codecs.pixels(direct).get
    assert(px.width == 32 && px.height == 24)
    val viaGen = MediaGen.bmp(32, 24, px.rgb.toSeq.map(p =>
      ((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)))
    assert(Codecs.pixels(viaGen).get.rgb.sameElements(px.rgb))
    assert(ImageHash.dhash64(direct) == ImageHash.dhash64(viaGen))
  }

  test("banded Hamming join equals brute force (plain and combo banding)") {
    val rnd = new scala.util.Random(4242)
    val hashes = (0L until 400L).map(i => i -> rnd.nextLong()).toMap
    // plant near-dup partners at hamming 0..4 of bases
    val planted = (0 until 80).map { j =>
      val b = j * 5L
      val flips = j % 5
      val mask = (0 until flips).foldLeft(0L)((m, k) =>
        m | (1L << ((b * 11 + k * 17) % 64).toInt))
      (1000L + b) -> (hashes(b) ^ mask)
    }
    val all = (hashes.toSeq ++ planted).toDF("id", "sh")
    val brute = all.as("a").join(all.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        graft.gfunctions.hamming64(col("a.sh"), col("b.sh")).as("hamming"))
      .filter(col("hamming") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    for (combo <- Seq(0, 8)) {
      val got = TextOps.hammingNearDupPairs(all, bands = 4, maxHamming = 3,
          maxBucketSize = 100000, comboBlocks = combo)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == brute, s"comboBlocks=$combo")
    }
  }
}
