package graft.tools

import org.apache.spark.sql.{Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Volume-scaling probe for the image near-dup family: generate n
 * seeded 32×24 BMPs (triplet families — three byte-identical renders
 * per family, the hamming-0 planted truth), then run the production
 * path end-to-end: `Media.imageHashTable` (decode + dHash per
 * partition — the image BYTES never shuffle; only 64-bit signatures
 * enter the banded join) → `TextOps.hammingNearDupPairs`. Reports
 * wall seconds / images-per-second / found pairs per point; expected
 * pairs = 3 per family = n (3 pairs × n/3 families), so pair-count
 * linearity and recall are checked by construction, not eyeballed.
 * Generation cost is INCLUDED in the wall time (conservative — the
 * reported throughput is a lower bound on the decode+hash kernel).
 */
object ImageScale {

  /** Deterministic 32×24 BMP from a family seed (xorshift-mixed; no
    * wall clock, no Random). Bytes are written directly — the tuple-Seq
    * fixture writer (MediaGen.bmp) costs ~10× the decode+hash kernel in
    * allocations, which would make the probe measure the GENERATOR; a
    * MediaGen round-trip equality assertion in ImageHashSpec pins this
    * writer to the spec one. 32×24 ⇒ stride 96, no row padding. */
  private[graft] def bmpBytes(family: Long): Array[Byte] = {
    var s = family * 0x9e3779b97f4a7c15L + 0x632be59bd9b4e019L
    val w = 32; val h = 24
    val out = new Array[Byte](54 + w * 3 * h)
    def le32(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
      out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte
    }
    out(0) = 'B'; out(1) = 'M'; le32(2, out.length); le32(10, 54)
    le32(14, 40); le32(18, w); le32(22, h)
    out(26) = 1; out(28) = 24 // planes, bpp (BI_RGB: bytes stay 0)
    le32(34, w * 3 * h); le32(38, 2835); le32(42, 2835)
    var i = 54
    while (i < out.length) {
      s ^= s << 13; s ^= s >>> 7; s ^= s << 17
      out(i) = (s >>> 8).toByte
      out(i + 1) = (s >>> 24).toByte
      out(i + 2) = (s >>> 40).toByte
      i += 3
    }
    out
  }

  /** Deterministic 36×24 BMP whose dHash EQUALS `pattern` exactly: each
    * 4×3 grid cell is solid gray, and the level walks ±10 per column so
    * the (r,c)→(r,c+1) comparison encodes pattern bit `63-(r*8+c)` —
    * strictly monotone steps, so every comparison is strict and the
    * hash is the pattern BY CONSTRUCTION (pinned in ImageHashSpec).
    * Levels stay in [48,208] (128 ± 8·10). This is what makes the
    * boundary-recall curve's planted distances analytic: flipping k
    * pattern bits moves the dHash by exactly hamming k. */
  private[graft] def patternBmpBytes(pattern: Long): Array[Byte] = {
    val w = 36; val h = 24 // 36*3 = 108 ≡ 0 (mod 4): no row padding
    val out = new Array[Byte](54 + w * 3 * h)
    def le32(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
      out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte
    }
    out(0) = 'B'; out(1) = 'M'; le32(2, out.length); le32(10, 54)
    le32(14, 40); le32(18, w); le32(22, h)
    out(26) = 1; out(28) = 24
    le32(34, w * 3 * h); le32(38, 2835); le32(42, 2835)
    // cell levels per row: start 128, step ±10 by pattern bit
    val levels = Array.ofDim[Int](8, 9)
    var r = 0
    while (r < 8) {
      levels(r)(0) = 128
      var c = 0
      while (c < 8) {
        val bit = (pattern >>> (63 - (r * 8 + c))) & 1L
        levels(r)(c + 1) = levels(r)(c) + (if (bit == 1L) 10 else -10)
        c += 1
      }
      r += 1
    }
    var y = 0
    while (y < h) {
      val gr = (y * 8) / h
      var x = 0
      while (x < w) {
        val v = levels(gr)((x * 9) / w).toByte
        val storageRow = h - 1 - y // bottom-up storage, like any BMP writer
        val o = 54 + storageRow * w * 3 + 3 * x
        out(o) = v; out(o + 1) = v; out(o + 2) = v
        x += 1
      }
      y += 1
    }
    out
  }

  /** 6 distinct bit positions per family (xorshift-sampled without
    * replacement): member 2 flips {b0} (hamming 1 from base), member 3
    * flips {b1,b2} (2), member 4 flips {b3,b4,b5} (3). Disjoint flip
    * sets ⇒ the cross distances are analytic too: C–D = 3 (counts),
    * C–E = 4 and D–E = 5 (must NOT match at maxHamming=3). */
  private[graft] def familyBits(family: Long): Array[Int] = {
    var s = family * 0x2545f4914f6cdd1dL + 0x9e3779b97f4a7c15L
    val bits = new Array[Int](6)
    var i = 0
    while (i < 6) {
      s ^= s << 13; s ^= s >>> 7; s ^= s << 17
      val b = ((s >>> 16) % 64).toInt.abs
      if (!bits.take(i).contains(b)) { bits(i) = b; i += 1 }
    }
    bits
  }

  /** Pattern of member m (0..4) of a family: base pattern with the
    * member's flip set applied. Expected in-family pairs at
    * maxHamming=3: A–B(0), A–C, B–C(1), A–D, B–D(2), A–E, B–E, C–D(3)
    * = 8 per 5 images. */
  private[graft] def memberPattern(family: Long, m: Int): Long = {
    var s = family * 0x9e3779b97f4a7c15L + 0x94d049bb133111ebL
    s ^= s << 13; s ^= s >>> 7; s ^= s << 17
    val bits = familyBits(family)
    val flips = m match {
      case 2 => Seq(bits(0))
      case 3 => Seq(bits(1), bits(2))
      case 4 => Seq(bits(3), bits(4), bits(5))
      case _ => Seq.empty
    }
    flips.foldLeft(s)((p, b) => p ^ (1L << b))
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val boundary = args.headOption.contains("boundary")
    val rest = if (boundary) args.drop(1) else args
    val points =
      if (rest.nonEmpty) rest.toSeq.map(_.toLong) else Seq(600000L, 2400000L)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-image-scale")
      .config("spark.sql.shuffle.partitions", (cpus * 4).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val mediaSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    points.foreach { n =>
      val fam = if (boundary) 5 else 3
      require(n % fam == 0, s"point must be a multiple of $fam (family size): $n")
      val t0 = System.nanoTime()
      implicit val enc = Encoders.row(mediaSchema)
      // boundary mode plants families of 5 with ANALYTIC distances
      // (0/1/2/3 + a cross-pair at exactly 3 and non-pairs at 4 and 5),
      // proving combo-banding recall AT THE BOUNDARY at volume — not
      // just the hamming-0 pigeonhole the triplet mode exercises
      val media = spark.range(0, n, 1, cpus * 4)
        .map(id => Row(id,
          if (boundary) patternBmpBytes(memberPattern(id / 5, (id % 5).toInt))
          else bmpBytes(id / 3)))(enc)
        .toDF("media_id", "bytes")
      // combination banding (b=6, k=3) — the crawl-scale configuration:
      // plain 4x16-bit bands would admit O(n^2/2^16) chance-collision
      // candidates (~176M at 2.4M images), the exact superlinearity the
      // text curve measured; the SAME shared kernel avoids it here
      val pairs = graft.multimodal.Media.imageNearDupPairs(media,
        comboBlocks = 6)
      val expected = if (boundary) 8L * n / 5 else n
      val found = pairs.count()
      val secs = (System.nanoTime() - t0) / 1e9
      val mode = if (boundary) "boundary" else "triplet"
      val line =
        f"""IMGSCALE {"mode":"$mode","n":$n,"pairs":$found,""" +
          f""""expected_pairs":$expected,"secs":$secs%.1f,""" +
          f""""imgs_per_sec":${(n / secs).toLong}}"""
      ProbeOut.emit(line)
    }
    spark.stop()
  }
}
