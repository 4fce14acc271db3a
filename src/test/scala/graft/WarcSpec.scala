package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.ISO_8859_1
import java.util.zip.GZIPOutputStream

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.WarcSource

/** WARC reader gates, the FastaSpec discipline: fixtures synthesized
  * byte-for-byte in-test (incl. the boundary trap — a payload that
  * CONTAINS `WARC/1.0\r\n` bytes, which a delimiter-scanning reader
  * would shear), plus the loud-failure contract on malformed input. */
class WarcSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def record(headers: Seq[(String, String)],
                     payload: Array[Byte]): Array[Byte] = {
    val head = new StringBuilder("WARC/1.0\r\n")
    headers.foreach { case (k, v) => head.append(s"$k: $v\r\n") }
    head.append(s"Content-Length: ${payload.length}\r\n\r\n")
    val out = new ByteArrayOutputStream()
    out.write(head.toString.getBytes(ISO_8859_1))
    out.write(payload)
    out.write("\r\n\r\n".getBytes(ISO_8859_1))
    out.toByteArray
  }

  // an HTTP response whose BODY embeds a fake record boundary and a
  // non-ASCII byte — only a Content-Length walk survives this
  private val trapBody: Array[Byte] =
    "<html>x</html>\r\n\r\nWARC/1.0\r\nWARC-Type: fake\r\n"
      .getBytes(ISO_8859_1) ++ Array[Byte](0xE9.toByte)
  private val httpPayload: Array[Byte] =
    ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n" +
      "Server: test\r\n\r\n").getBytes(ISO_8859_1) ++ trapBody

  private def records(): Seq[Array[Byte]] = Seq(
    record(Seq(
      "WARC-Type" -> "warcinfo",
      "WARC-Record-ID" -> "<urn:uuid:aaa>",
      "WARC-Date" -> "2026-08-16T00:00:00Z",
      "Content-Type" -> "application/warc-fields"),
      "software: graft-test\r\n".getBytes(ISO_8859_1)),
    record(Seq(
      "WARC-Type" -> "request",
      "WARC-Record-ID" -> "<urn:uuid:bbb>",
      "WARC-Target-URI" -> "http://example.com/a",
      "warc-date" -> "2026-08-16T00:00:01Z", // case-insensitive keys
      "Content-Type" -> "application/http; msgtype=request"),
      "GET /a HTTP/1.1\r\nHost: example.com\r\n\r\n".getBytes(ISO_8859_1)),
    record(Seq(
      "WARC-Type" -> "response",
      "WARC-Record-ID" -> "<urn:uuid:ccc>",
      "WARC-Target-URI" -> "http://example.com/a",
      "WARC-Date" -> "2026-08-16T00:00:02Z",
      "Content-Type" -> "application/http; msgtype=response"),
      httpPayload))

  private def fixture(): Array[Byte] = records().reduce(_ ++ _)

  private def write(bytes: Array[Byte], suffix: String): String = {
    val f = java.nio.file.Files.createTempFile("graft_warc", suffix)
    java.nio.file.Files.write(f, bytes)
    f.toString
  }

  private def readRows(path: String) =
    WarcSource.read(spark, path).orderBy("record_id").collect()

  test("WARC records parse field-exact through the embedded-boundary trap") {
    val rows = readRows(write(fixture(), ".warc"))
    assert(rows.length == 3)
    val Array(info, req, resp) = rows
    assert(info.getAs[String]("warc_type") == "warcinfo" &&
      info.getAs[String]("url") == null &&
      info.getAs[Integer]("http_status") == null)
    assert(req.getAs[String]("warc_type") == "request" &&
      req.getAs[String]("warc_date") == "2026-08-16T00:00:01Z" &&
      req.getAs[Integer]("http_status") == null) // request: no HTTP/ prefix
    assert(resp.getAs[String]("url") == "http://example.com/a" &&
      resp.getAs[Long]("content_length") == httpPayload.length.toLong &&
      resp.getAs[Integer]("http_status") == 200 &&
      resp.getAs[String]("http_content_type") == "text/html; charset=utf-8")
    // the body survives byte-exact — fake boundary and 0xE9 included
    assert(java.util.Arrays.equals(
      resp.getAs[Array[Byte]]("http_body"), trapBody))
    assert(java.util.Arrays.equals(
      resp.getAs[Array[Byte]]("payload"), httpPayload))
  }

  test("multi-member .warc.gz decodes identically to the plain file") {
    // production WARC.gz: each record its own gzip member; JDK
    // GZIPInputStream reads concatenated members natively
    val out = new ByteArrayOutputStream()
    records().foreach { b => // one gzip member per record, the CC layout
      val g = new GZIPOutputStream(out); g.write(b); g.finish()
    }
    val gz = readRows(write(out.toByteArray, ".warc.gz"))
    val raw = readRows(write(fixture(), ".warc"))
    assert(gz.length == 3)
    // compare binary columns by CONTENT (Row.toString renders arrays
    // by identity)
    def key(r: org.apache.spark.sql.Row): Seq[Any] =
      r.toSeq.map {
        case b: Array[Byte] => b.toSeq
        case x => x
      }
    assert(gz.map(key).toSeq == raw.map(key).toSeq)
  }

  test("sloppy HTTP status lines yield null status, never a crash") {
    // double-spaced status line → empty split token; absurd digit run
    // → would overflow toInt: both must fall to null per the
    // best-effort contract, not fail the read
    val out = new ByteArrayOutputStream()
    Seq("HTTP/1.1  200 OK", "HTTP/1.1 99999999999 X", "HTTP/1.1 404 NF")
      .zipWithIndex.foreach { case (statusLine, i) =>
        out.write(record(Seq(
          "WARC-Type" -> "response",
          "WARC-Record-ID" -> s"<urn:uuid:s$i>",
          "Content-Type" -> "application/http; msgtype=response"),
          s"$statusLine\r\nContent-Type: text/plain\r\n\r\nbody"
            .getBytes(ISO_8859_1)))
      }
    val rows = readRows(write(out.toByteArray, ".warc"))
    assert(rows.map(_.getAs[Integer]("http_status")).toSeq ==
      Seq(null, null, Integer.valueOf(404)))
  }

  test("http_body transfer-decodes chunked and gzip bodies, raw payload untouched") {
    def gz(b: Array[Byte]): Array[Byte] = {
      val bo = new ByteArrayOutputStream()
      val g = new GZIPOutputStream(bo); g.write(b); g.finish(); bo.toByteArray
    }
    def chunked(b: Array[Byte], at: Int): Array[Byte] = {
      val (a, c) = b.splitAt(at)
      (f"${a.length}%x\r\n".getBytes(ISO_8859_1) ++ a ++ "\r\n".getBytes(ISO_8859_1) ++
        f"${c.length}%x;ext=1\r\n".getBytes(ISO_8859_1) ++ c ++ "\r\n".getBytes(ISO_8859_1) ++
        "0\r\n\r\n".getBytes(ISO_8859_1))
    }
    val entity = "<html>decoded entity body</html>".getBytes(ISO_8859_1)
    def resp(i: Int, extraHeaders: String, body: Array[Byte]): Array[Byte] =
      record(Seq(
        "WARC-Type" -> "response",
        "WARC-Record-ID" -> s"<urn:uuid:d$i>",
        "Content-Type" -> "application/http; msgtype=response"),
        s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n$extraHeaders\r\n"
          .getBytes(ISO_8859_1) ++ body)
    val out = new ByteArrayOutputStream()
    out.write(resp(0, "Transfer-Encoding: chunked\r\n", chunked(entity, 7)))
    out.write(resp(1, "Content-Encoding: gzip\r\n", gz(entity)))
    out.write(resp(2, "Transfer-Encoding: chunked\r\nContent-Encoding: gzip\r\n",
      chunked(gz(entity), 5))) // chunked OVER gzip — decode order matters
    out.write(resp(3, "Transfer-Encoding: chunked\r\n",
      "NOTHEX\r\njunk".getBytes(ISO_8859_1))) // malformed → raw fallback
    out.write(resp(4, "Content-Encoding: gzip\r\n",
      "not gzip at all".getBytes(ISO_8859_1))) // malformed → raw fallback
    val rows = readRows(write(out.toByteArray, ".warc"))
    def body(i: Int) = rows(i).getAs[Array[Byte]]("http_body")
    assert(java.util.Arrays.equals(body(0), entity))
    assert(java.util.Arrays.equals(body(1), entity))
    assert(java.util.Arrays.equals(body(2), entity))
    assert(java.util.Arrays.equals(body(3),
      "NOTHEX\r\njunk".getBytes(ISO_8859_1)))
    assert(java.util.Arrays.equals(body(4),
      "not gzip at all".getBytes(ISO_8859_1)))
    // the raw payload keeps the WIRE bytes — framing included
    val rawChunked = rows(0).getAs[Array[Byte]]("payload")
    assert(new String(rawChunked, ISO_8859_1).contains("7\r\n"))
  }

  test("malformed WARC fails loudly, never shears") {
    // truncated payload: declared length runs past EOF
    val bad1 = {
      val full = record(Seq("WARC-Type" -> "resource",
        "WARC-Record-ID" -> "<urn:uuid:t>",
        "Content-Type" -> "text/plain"), "0123456789".getBytes(ISO_8859_1))
      full.dropRight(8) // cuts into the payload
    }
    val e1 = intercept[org.apache.spark.SparkException] {
      readRows(write(bad1, ".warc"))
    }
    assert(e1.getMessage.contains("truncated payload") ||
      Option(e1.getCause).exists(_.getMessage.contains("truncated payload")))
    // record without Content-Length
    val bad2 = ("WARC/1.0\r\nWARC-Type: resource\r\n\r\n" +
      "xx\r\n\r\n").getBytes(ISO_8859_1)
    val e2 = intercept[org.apache.spark.SparkException] {
      readRows(write(bad2, ".warc"))
    }
    assert(e2.getMessage.contains("Content-Length") ||
      Option(e2.getCause).exists(_.getMessage.contains("Content-Length")))
    // junk between records that is not the version magic
    val bad3 = record(Seq("WARC-Type" -> "resource",
      "WARC-Record-ID" -> "<urn:uuid:u>",
      "Content-Type" -> "text/plain"), "ok".getBytes(ISO_8859_1)) ++
      "NOT-A-RECORD\r\n".getBytes(ISO_8859_1)
    val e3 = intercept[org.apache.spark.SparkException] {
      readRows(write(bad3, ".warc"))
    }
    assert(e3.getMessage.contains("version magic") ||
      Option(e3.getCause).exists(_.getMessage.contains("version magic")))
  }
}
