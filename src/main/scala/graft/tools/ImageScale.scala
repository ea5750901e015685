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

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val points =
      if (args.nonEmpty) args.toSeq.map(_.toLong) else Seq(600000L, 2400000L)
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
      require(n % 3 == 0, s"point must be a multiple of 3 (triplet families): $n")
      val t0 = System.nanoTime()
      implicit val enc = Encoders.row(mediaSchema)
      val media = spark.range(0, n, 1, cpus * 4)
        .map(id => Row(id, bmpBytes(id / 3)))(enc)
        .toDF("media_id", "bytes")
      // combination banding (b=6, k=3) — the crawl-scale configuration:
      // plain 4x16-bit bands would admit O(n^2/2^16) chance-collision
      // candidates (~176M at 2.4M images), the exact superlinearity the
      // text curve measured; the SAME shared kernel avoids it here
      val pairs = graft.multimodal.Media.imageNearDupPairs(media,
        comboBlocks = 6)
      val found = pairs.count()
      val secs = (System.nanoTime() - t0) / 1e9
      val line =
        f"""IMGSCALE {"n":$n,"pairs":$found,"expected_pairs":$n,""" +
          f""""secs":$secs%.1f,"imgs_per_sec":${(n / secs).toLong}}"""
      ProbeOut.emit(line)
    }
    spark.stop()
  }
}
