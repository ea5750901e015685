package graft.tools

import org.apache.spark.sql.{Encoders, Row, SparkSession}
import org.apache.spark.sql.types._

/**
 * Volume-scaling probe for the AUDIO near-dup family — the eHash twin
 * of ImageScale's boundary mode. Families of 5 WAV clips whose eHash
 * distances are ANALYTIC: each clip's 65 frame amplitudes walk ±50 per
 * frame so the energy-delta comparison encodes a 64-bit pattern
 * exactly ([[patternWavBytes]], pinned in AudioHashSpec), and members
 * flip 0/1/2/3 disjoint pattern bits — planted pairs at hamming
 * 0/1/2/3, a cross pair at exactly 3, and non-pairs at 4 and 5, so
 * found == 8n/5 proves banding recall at the boundary, not just
 * pigeonhole at 0. Runs the production path end-to-end
 * (`Media.audioNearDupPairs`: per-partition WAV parse + eHash → the
 * shared banded Hamming join; clip BYTES never shuffle). Generation
 * cost is included in the wall time (conservative lower bound on the
 * decode+hash kernel).
 */
object AudioScale {

  private val SamplesPerFrame = 32 // 65 frames × 32 samples × 2 B ≈ 4.2 KB

  /** Deterministic mono PCM-16 WAV whose eHash EQUALS `pattern`: frame
    * k+1's amplitude is frame k's ± 50 by pattern bit `63-k` (base
    * 5000, range [1800, 8200] — int16-safe), every step strict, so each
    * energy comparison is the pattern bit BY CONSTRUCTION. */
  private[graft] def patternWavBytes(pattern: Long): Array[Byte] = {
    val frames = 65
    val n = frames * SamplesPerFrame
    val out = new Array[Byte](44 + 2 * n)
    def le32(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
      out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte
    }
    def le16(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
    }
    def ascii(o: Int, s: String): Unit =
      s.indices.foreach(i => out(o + i) = s.charAt(i).toByte)
    ascii(0, "RIFF"); le32(4, 36 + 2 * n); ascii(8, "WAVE")
    ascii(12, "fmt "); le32(16, 16); le16(20, 1); le16(22, 1)
    le32(24, 8000); le32(28, 16000); le16(32, 2); le16(34, 16)
    ascii(36, "data"); le32(40, 2 * n)
    var amp = 5000
    var k = 0
    while (k < frames) {
      if (k > 0) {
        val bit = (pattern >>> (63 - (k - 1))) & 1L
        amp += (if (bit == 1L) 50 else -50)
      }
      var i = 0
      while (i < SamplesPerFrame) {
        le16(44 + 2 * (k * SamplesPerFrame + i), amp)
        i += 1
      }
      k += 1
    }
    out
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val points =
      if (args.nonEmpty) args.toSeq.map(_.toLong) else Seq(600000L, 2400000L)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-audio-scale")
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
      // same family construction as ImageScale boundary mode — the flip
      // sets (and therefore the expected-pair arithmetic) are shared
      val media = spark.range(0, n, 1, cpus * 4)
        .map(id => Row(id,
          patternWavBytes(ImageScale.memberPattern(id / 5, (id % 5).toInt))))(enc)
        .toDF("media_id", "bytes")
      val pairs = graft.multimodal.Media.audioNearDupPairs(media,
        comboBlocks = 6)
      val expected = 8L * n / 5
      val found = pairs.count()
      val secs = (System.nanoTime() - t0) / 1e9
      val line =
        f"""AUDSCALE {"n":$n,"pairs":$found,"expected_pairs":$expected,""" +
          f""""secs":$secs%.1f,"clips_per_sec":${(n / secs).toLong}}"""
      ProbeOut.emit(line)
    }
    spark.stop()
  }
}
