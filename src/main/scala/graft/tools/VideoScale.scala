package graft.tools

import org.apache.spark.sql.{Encoders, Row, SparkSession}
import org.apache.spark.sql.types._

/**
 * Volume-scaling probe for the VIDEO near-dup path — the fourth
 * modality's boundary curve, completing the set (text SCALE_r4, image
 * IMGSCALE_r5, audio AUDSCALE_r5). Families of 5 single-keyframe AVI
 * clips whose keyframe dHash equals a chosen 64-bit pattern (the
 * ImageScale boundary construction carried as an AVI DIB frame —
 * invariant pinned in VideoHashSpec), same disjoint flip sets ⇒
 * planted clip pairs at hamming 0/1/2/3, non-pairs at 4/5, expected =
 * 8n/5. Runs the production path end-to-end (`Media.videoNearDupPairs`:
 * per-partition container walk + frame decode + dHash → frame-uid
 * Hamming join → clip fold; frame bytes never shuffle). The AVI
 * container is a byte template cloned per clip with only the frame
 * payload rewritten, so generation stays cheap relative to the
 * decode+hash kernel being measured.
 */
object VideoScale {

  private val W = 36; private val H = 24; private val Stride = W * 3

  /** One-frame 36×24 DIB AVI template; the frame payload offset comes
    * from the production parser itself, so the generator can't disagree
    * with the walk it feeds. */
  private val template: Array[Byte] =
    graft.fixtures.MediaGen.avi(W, H, "DIB ",
      Seq(new Array[Byte](Stride * H)))
  private val frameOff: Int =
    graft.multimodal.Codecs.aviScan(template)
      .getOrElse(sys.error("template AVI must parse")).frames(0)._1

  /** Clip whose single keyframe dHash EQUALS `pattern` — the
    * ImageScale.patternBmpBytes level walk written into the AVI frame
    * payload (bottom-up DIB rows, like any AVI '##db' chunk). */
  private[graft] def patternAviBytes(pattern: Long): Array[Byte] = {
    val out = template.clone()
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
    var sr = 0
    while (sr < H) {
      val y = H - 1 - sr // bottom-up storage
      val gr = (y * 8) / H
      var x = 0
      while (x < W) {
        val v = levels(gr)((x * 9) / W).toByte
        val o = frameOff + sr * Stride + 3 * x
        out(o) = v; out(o + 1) = v; out(o + 2) = v
        x += 1
      }
      sr += 1
    }
    out
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val points =
      if (args.nonEmpty) args.toSeq.map(_.toLong) else Seq(600000L, 2400000L)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-video-scale")
      .config("spark.sql.shuffle.partitions", (cpus * 4).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val mediaSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    points.foreach { n =>
      require(n % 5 == 0, s"point must be a multiple of 5 (family size): $n")
      val t0 = System.nanoTime()
      implicit val enc = Encoders.row(mediaSchema)
      val media = spark.range(0, n, 1, cpus * 4)
        .map(id => Row(id,
          patternAviBytes(ImageScale.memberPattern(id / 5, (id % 5).toInt))))(enc)
        .toDF("media_id", "bytes")
      val pairs = graft.multimodal.Media.videoNearDupPairs(media,
        comboBlocks = 6)
      val expected = 8L * n / 5
      val found = pairs.count()
      val secs = (System.nanoTime() - t0) / 1e9
      val line =
        f"""VIDSCALE {"n":$n,"pairs":$found,"expected_pairs":$expected,""" +
          f""""secs":$secs%.1f,"clips_per_sec":${(n / secs).toLong}}"""
      ProbeOut.emit(line)
    }
    spark.stop()
  }
}
