package graft

import java.nio.charset.StandardCharsets
import org.apache.spark.sql.functions._
import graft.io.Warc

class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def rec(typ: String, payload: String,
      extra: Map[String, String] = Map.empty): String = {
    val len = payload.getBytes(StandardCharsets.UTF_8).length
    val hdrs = Map("WARC-Type" -> typ, "Content-Length" -> len.toString) ++ extra
    "WARC/1.0\r\n" +
      hdrs.map { case (k, v) => s"$k: $v\r\n" }.mkString +
      "\r\n" + payload + "\r\n\r\n"
  }

  test("scan: length-driven framing survives a WARC banner INSIDE a " +
      "payload; http envelope stripped for responses only; header names " +
      "case-insensitive; multi-byte UTF-8 counted in bytes") {
    val decoyBody = "line one\nWARC/1.0\r\nWARC-Type: fake\r\nline two"
    val http = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + decoyBody
    val utf8Body = "héllo wörld ©"  // multi-byte: len(chars) != len(bytes)
    val blob = (
      rec("warcinfo", "software: graft\r\n") +
      rec("response", http, Map(
        "warc-target-uri" -> "https://x.example/a",
        "WARC-DATE" -> "2024-03-01T10:15:00Z")) +
      rec("resource", utf8Body, Map("WARC-Target-URI" -> "https://x.example/b"))
    ).getBytes(StandardCharsets.UTF_8)
    val got = Warc.scan(blob)
    assert(got.map(_.record_type) == Seq("warcinfo", "response", "resource"))
    // response: url + date parsed case-insensitively, http headers gone,
    // the decoy banner is DATA, not a record boundary
    assert(got(1).url == "https://x.example/a")
    assert(got(1).warc_date == "2024-03-01T10:15:00Z")
    assert(new String(got(1).body, StandardCharsets.UTF_8) == decoyBody)
    // resource: payload kept whole (no http strip), bytes exact
    assert(new String(got(2).body, StandardCharsets.UTF_8) == utf8Body)
    // warcinfo carries no uri
    assert(got(0).url == null)
  }

  test("scan: corrupt archives fail loudly — overrunning Content-Length, " +
      "missing Content-Length, garbage version line") {
    val overrun = "WARC/1.0\r\nWARC-Type: resource\r\nContent-Length: 999\r\n\r\nshort"
    val e1 = intercept[IllegalArgumentException] {
      Warc.scan(overrun.getBytes(StandardCharsets.UTF_8))
    }
    assert(e1.getMessage.contains("overruns"))
    val noLen = "WARC/1.0\r\nWARC-Type: resource\r\n\r\nbody"
    val e2 = intercept[RuntimeException] {
      Warc.scan(noLen.getBytes(StandardCharsets.UTF_8))
    }
    assert(e2.getMessage.contains("Content-Length"))
    val garbage = "HTTP/1.1 200 OK\r\nFoo: bar\r\n\r\n"
    val e3 = intercept[IllegalArgumentException] {
      Warc.scan(garbage.getBytes(StandardCharsets.UTF_8))
    }
    assert(e3.getMessage.contains("version line"))
    // empty blob is a valid empty archive
    assert(Warc.scan(Array.emptyByteArray).isEmpty)
  }

  test("readWarc: *.warc files land as the canonical page table " +
      "(url, warc_ts, html, text, lang) — responses only, timestamps " +
      "with and without WARC 1.1 fractional seconds, LF-only http " +
      "envelopes stripped, sidecar files ignored") {
    val html = "<html><body><p>the cat is in the house and it is warm</p></body></html>"
    val html2 = "<html><body><p>der hund ist nicht auf der wiese und das ist gut</p></body></html>"
    val blob =
      rec("warcinfo", "software: graft\r\n") +
      rec("response",
        "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html,
        Map("WARC-Target-URI" -> "https://x.example/page",
          "WARC-Date" -> "2024-03-01T10:15:42Z")) +
      // WARC 1.1 fractional-second date + a bare-LF http envelope (WARC
      // preserves raw bytes; non-CRLF servers exist)
      rec("response",
        "HTTP/1.1 200 OK\nContent-Type: text/html\n\n" + html2,
        Map("WARC-Target-URI" -> "https://x.example/page2",
          "WARC-Date" -> "2024-03-01T10:15:43.335Z"))
    val dir = java.nio.file.Files.createTempDirectory("warc_spec")
    java.nio.file.Files.write(dir.resolve("part-0.warc"),
      blob.getBytes(StandardCharsets.UTF_8))
    // crawl-output sidecar: must not abort the scan
    java.nio.file.Files.write(dir.resolve("_SUCCESS"), Array.emptyByteArray)
    try {
      val got = Warc.readWarc(spark, dir.toString)
      assert(got.columns.toSeq == Seq("url", "warc_ts", "html", "text", "lang"))
      val rows = got.select(col("url"), col("warc_ts").cast("string"),
          decode(col("html"), "UTF-8"), col("text"), col("lang"))
        .as[(String, String, String, String, String)].collect().sortBy(_._1).toSeq
      assert(rows == Seq(
        ("https://x.example/page", "2024-03-01 10:15:42",
          html, "the cat is in the house and it is warm", "en"),
        ("https://x.example/page2", "2024-03-01 10:15:43.335",
          html2, "der hund ist nicht auf der wiese und das ist gut", "de")))
    } finally {
      java.nio.file.Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
  }
}
