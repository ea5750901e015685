package graft.fixtures

import java.io.ByteArrayOutputStream

/**
 * Deterministic media byte builders (WAV PCM-16 + BMP 24bpp
 * spec-conformant writers†; PNG + solid-color JPEG via the JDK's own
 * ImageIO encoders) for the real-decoder fixtures
 * (multimodal/Codecs.scala). Seeded/literal payloads, no external data
 * — the same no-wall-clock contract as PagesGen.
 */
object MediaGen {

  private def le16(o: ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >> 8) & 0xff)
  }
  private def le32(o: ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >> 8) & 0xff)
    o.write((v >> 16) & 0xff); o.write((v >> 24) & 0xff)
  }
  private def ascii(o: ByteArrayOutputStream, s: String): Unit =
    s.foreach(c => o.write(c.toInt))

  /**
   * RIFF/WAVE PCM-16 writer. `extraChunk` inserts a LIST chunk BEFORE
   * the data chunk whose payload contains a decoy "data" banner —
   * proving the parser walks chunk lengths instead of searching for
   * markers; odd-sized extras exercise the RIFF pad byte.
   */
  def wav(samples: Seq[Short], sampleRate: Int, channels: Int,
          extraChunk: Boolean = false): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    val extra = if (extraChunk) "INFOdata decoy!" else "" // 15 bytes: odd → padded
    val extraLen = if (extraChunk) 8 + extra.length + (extra.length & 1) else 0
    val dataLen = samples.length * 2
    ascii(o, "RIFF"); le32(o, 4 + 24 + extraLen + 8 + dataLen); ascii(o, "WAVE")
    ascii(o, "fmt "); le32(o, 16)
    le16(o, 1) // PCM
    le16(o, channels); le32(o, sampleRate)
    le32(o, sampleRate * channels * 2) // byte rate
    le16(o, channels * 2)              // block align
    le16(o, 16)                        // bits per sample
    if (extraChunk) {
      ascii(o, "LIST"); le32(o, extra.length); ascii(o, extra)
      if ((extra.length & 1) == 1) o.write(0) // pad byte
    }
    ascii(o, "data"); le32(o, dataLen)
    samples.foreach(s => le16(o, s & 0xffff))
    o.toByteArray
  }

  /** BMP 24bpp BI_RGB writer; `pixels` row-major top-down as (r,g,b).
    * `topDown = true` writes a negative-height header (rows stored
    * top-first); otherwise the standard bottom-up layout. */
  def bmp(w: Int, h: Int, pixels: Seq[(Int, Int, Int)],
          topDown: Boolean = false): Array[Byte] = {
    require(pixels.length == w * h, "need w*h pixels")
    val stride = ((w * 3 + 3) / 4) * 4
    val o = new ByteArrayOutputStream()
    ascii(o, "BM"); le32(o, 54 + stride * h); le16(o, 0); le16(o, 0); le32(o, 54)
    le32(o, 40); le32(o, w); le32(o, if (topDown) -h else h)
    le16(o, 1); le16(o, 24); le32(o, 0) // planes, bpp, BI_RGB
    le32(o, stride * h); le32(o, 2835); le32(o, 2835); le32(o, 0); le32(o, 0)
    val rows = pixels.grouped(w).toSeq
    val ordered = if (topDown) rows else rows.reverse
    ordered.foreach { row =>
      row.foreach { case (r, g, b) => o.write(b); o.write(g); o.write(r) }
      (w * 3 until stride).foreach(_ => o.write(0))
    }
    o.toByteArray
  }

  /** Build an opaque-RGB BufferedImage from row-major (r,g,b) pixels. */
  private def rgbImage(w: Int, h: Int,
      pixels: Seq[(Int, Int, Int)]): java.awt.image.BufferedImage = {
    require(pixels.length == w * h, "need w*h pixels")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    pixels.zipWithIndex.foreach { case ((r, g, b), i) =>
      img.setRGB(i % w, i / w, (r << 16) | (g << 8) | b)
    }
    img
  }

  /** PNG writer via the JDK ImageIO plugin: lossless, so the decoded
    * pixels — and therefore the fixture's expected channel means — are
    * exactly the pixels passed in. */
  def png(w: Int, h: Int, pixels: Seq[(Int, Int, Int)]): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(rgbImage(w, h, pixels), "png", o)
    o.toByteArray
  }

  /** One RIFF chunk: id + le32 size + payload + odd-size pad byte. */
  private def chunk(o: ByteArrayOutputStream, id: String,
      payload: Array[Byte]): Unit = {
    ascii(o, id); le32(o, payload.length); o.write(payload)
    if ((payload.length & 1) == 1) o.write(0)
  }
  private def bytesOf(f: ByteArrayOutputStream => Unit): Array[Byte] = {
    val o = new ByteArrayOutputStream(); f(o); o.toByteArray
  }

  /**
   * AVI writer (RIFF 'AVI '): LIST(hdrl){avih, LIST(strl){strh, strf}}
   * then LIST(movi){frame chunks}. `codec` is "DIB " (frames = raw
   * bottom-up 24bpp stride-padded pixel data) or "MJPG" (frames =
   * standalone JPEG payloads). `audioFirst` prepends a dummy 'auds'
   * strl so the video stream becomes stream 01 — proving the parser
   * tracks stream numbers instead of assuming "00dc". `junk` inserts a
   * JUNK chunk whose payload carries a decoy "00db" banner before the
   * movi list — proving the length-driven walk (the WAV decoy-LIST
   * pattern).
   */
  def avi(w: Int, h: Int, codec: String, frames: Seq[Array[Byte]],
      junk: Boolean = false, audioFirst: Boolean = false,
      recWrap: Boolean = false): Array[Byte] = {
    require(codec == "DIB " || codec == "MJPG", codec)
    val strl = bytesOf { s =>
      ascii(s, "strl")
      chunk(s, "strh", bytesOf { x =>
        ascii(x, "vids"); ascii(x, codec)
        le32(x, 0); le32(x, 0); le32(x, 0) // flags, prio+lang, initial
        le32(x, 1); le32(x, 25)            // scale, rate (25 fps)
        le32(x, 0); le32(x, frames.length) // start, length
        le32(x, 0); le32(x, -1); le32(x, 0) // bufSize, quality, sampleSize
        le16(x, 0); le16(x, 0); le16(x, w); le16(x, h) // rcFrame
      })
      chunk(s, "strf", bytesOf { x =>
        le32(x, 40); le32(x, w); le32(x, h)
        le16(x, 1); le16(x, 24) // planes, bpp
        le32(x, if (codec == "MJPG") 0x47504A4D else 0) // biCompression
        le32(x, 0); le32(x, 0); le32(x, 0); le32(x, 0); le32(x, 0)
      })
    }
    val audioStrl = bytesOf { s =>
      ascii(s, "strl")
      chunk(s, "strh", bytesOf { x =>
        ascii(x, "auds"); le32(x, 0)
        (0 until 12).foreach(_ => le32(x, 0))
      })
      chunk(s, "strf", bytesOf { x => (0 until 4).foreach(_ => le32(x, 0)) })
    }
    val hdrl = bytesOf { s =>
      ascii(s, "hdrl")
      chunk(s, "avih", bytesOf { x =>
        le32(x, 40000); le32(x, 0); le32(x, 0); le32(x, 0) // usec/frame …
        le32(x, frames.length); le32(x, 0)
        le32(x, if (audioFirst) 2 else 1) // dwStreams
        le32(x, 0); le32(x, w); le32(x, h)
        (0 until 4).foreach(_ => le32(x, 0))
      })
      if (audioFirst) chunk(s, "LIST", audioStrl)
      chunk(s, "LIST", strl)
    }
    val streamId = if (audioFirst) "01" else "00"
    val frameId = streamId + (if (codec == "DIB ") "db" else "dc")
    val movi = bytesOf { s =>
      ascii(s, "movi")
      // recWrap: each frame inside its own LIST('rec ') sublist - the
      // interleaved-AVI layout the parser must descend
      frames.foreach { f =>
        if (recWrap) chunk(s, "LIST",
          bytesOf { r => ascii(r, "rec "); chunk(r, frameId, f) })
        else chunk(s, frameId, f)
      }
    }
    val body = bytesOf { s =>
      ascii(s, "AVI ")
      chunk(s, "LIST", hdrl)
      if (junk) chunk(s, "JUNK", "decoy 00db banner".getBytes("UTF-8"))
      chunk(s, "LIST", movi)
    }
    bytesOf { o => ascii(o, "RIFF"); le32(o, body.length); o.write(body) }
  }

  /** Raw AVI-DIB frame payload: bottom-up 24bpp rows with the BMP
    * 4-byte stride padding — exactly what a '##db' chunk carries.
    * `pixels` row-major top-down as (r,g,b), like [[bmp]]. */
  def dibFrame(w: Int, h: Int, pixels: Seq[(Int, Int, Int)]): Array[Byte] = {
    require(pixels.length == w * h, "need w*h pixels")
    val stride = ((w * 3 + 3) / 4) * 4
    bytesOf { o =>
      pixels.grouped(w).toSeq.reverse.foreach { row =>
        row.foreach { case (r, g, b) => o.write(b); o.write(g); o.write(r) }
        (w * 3 until stride).foreach(_ => o.write(0))
      }
    }
  }

  /** Solid-color JPEG via the JDK ImageIO plugin. A uniform image is a
    * DC-only JPEG: every 8×8 block's AC coefficients are zero, the DC
    * quantizes/dequantizes exactly, and constant chroma survives 4:2:0
    * subsampling — so the decode roundtrips the color exactly and the
    * expected means stay hand-computable despite the lossy codec†
    * (verified in CodecsSpec before the oracle relies on it). */
  def jpegSolid(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(
      rgbImage(w, h, Seq.fill(w * h)((r, g, b))), "jpg", o)
    o.toByteArray
  }
}
