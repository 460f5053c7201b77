package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.frontier.CrawlConfig
import graft.parse.{Charsets, DocParsers}

/** Per-page charset detection (reference util/EncodingDetector.java +
  * parse-html sniffCharacterEncoding): header param → meta/BOM sniff →
  * UTF-8 validation → windows-1252 default; mislabel corrections. */
class CharsetSpec extends AnyFunSuite {

  private val cfg = CrawlConfig()

  test("Content-Type charset parameter parsing (catalina semantics)") {
    assert(Charsets.fromContentType("text/html; charset=utf-8") == "utf-8")
    assert(Charsets.fromContentType("text/html; charset=\"Shift_JIS\"; x=y") == "Shift_JIS")
    assert(Charsets.fromContentType("text/html;charset=ISO-8859-1") == "ISO-8859-1")
    assert(Charsets.fromContentType("text/html") == null)
    assert(Charsets.fromContentType(null) == null)
  }

  test("mislabel corrections: ISO-8859-1 is decoded as its windows-1252 superset") {
    assert(Charsets.resolve("ISO-8859-1").get.name == "windows-1252")
    assert(Charsets.resolve("latin1").get.name == "windows-1252")
    assert(Charsets.resolve("Shift_JIS").get.name == "Shift_JIS")
    assert(Charsets.resolve("sjis").get.name == "Shift_JIS")
    assert(Charsets.resolve("no-such-charset").isEmpty)
    assert(Charsets.resolve(null).isEmpty)
  }

  test("meta / HTML5 / XML-prolog / BOM sniffing over raw bytes") {
    val meta = ("<html><head><meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=iso-8859-1\"></head></html>").getBytes("US-ASCII")
    assert(Charsets.sniff(meta) == "iso-8859-1")
    val html5 = "<html><meta charset=\"shift_jis\"><body></body></html>".getBytes("US-ASCII")
    assert(Charsets.sniff(html5) == "shift_jis")
    val xml = "<?xml version=\"1.0\" encoding=\"EUC-JP\"?><doc/>".getBytes("US-ASCII")
    assert(Charsets.sniff(xml) == "EUC-JP")
    assert(Charsets.sniff(Array(0xEF, 0xBB, 0xBF, 'h').map(_.toByte)) == "UTF-8")
    assert(Charsets.sniff(Array(0xFF, 0xFE, 'h', 0).map(_.toByte)) == "UTF-16LE")
    assert(Charsets.sniff(Array(0xFE, 0xFF, 0, 'h').map(_.toByte)) == "UTF-16BE")
    assert(Charsets.sniff("plain page no declarations".getBytes("US-ASCII")) == null)
  }

  test("ISO-8859-1 page: labelled via meta OR unlabelled, text decodes correctly") {
    val text = "<html><body>café entrée</body></html>"
    val latin1 = text.getBytes("ISO-8859-1") // 0xE9 bytes — invalid UTF-8
    // meta-labelled
    val withMeta = ("<html><head><meta http-equiv=content-type content=\"text/html; " +
      "charset=ISO-8859-1\"></head><body>café</body></html>").getBytes("ISO-8859-1")
    assert(Charsets.decode(null, withMeta, cfg.parserCharsetDefault).contains("café"))
    // unlabelled: UTF-8 validation fails -> windows-1252 default decodes it
    assert(Charsets.decode(null, latin1, cfg.parserCharsetDefault).contains("café"))
    // and through the real parse dispatch
    val spans = DocParsers.parseSpans("text/html", "http://x.test/a", withMeta, cfg)
    assert(spans.exists(s => s.kind == "text" && s.text.contains("café")))
  }

  test("Shift_JIS page via header, via meta, and signature parity with UTF-8") {
    val body = "<html><body>日本語のページ " +
      "こんにちは</body></html>"
    val sjis = body.getBytes("Shift_JIS")
    val utf8 = body.getBytes("UTF-8")
    assert(Charsets.decode("text/html; charset=Shift_JIS", sjis, cfg.parserCharsetDefault)
      .contains("日本語"))
    val metaSjis = ("<html><head><meta charset=shift_jis></head><body>" +
      "日本語</body></html>").getBytes("Shift_JIS")
    assert(Charsets.decode(null, metaSjis, cfg.parserCharsetDefault).contains("日本語"))
    // dedup parity: SAME text served in two encodings signs identically
    val sjisSpans = DocParsers.parseSpans("text/html; charset=Shift_JIS", "http://x.test/j", sjis, cfg)
    val utf8Spans = DocParsers.parseSpans("text/html; charset=utf-8", "http://x.test/j", utf8, cfg)
    assert(sjisSpans == utf8Spans, "span sequences must be encoding-independent")
    val s1 = graft.frontier.Md5Signer.signSpans(sjisSpans).toSeq
    val s2 = graft.frontier.Md5Signer.signSpans(utf8Spans).toSeq
    assert(s1 == s2, "signatures must be encoding-independent")
    val t1 = graft.frontier.TextProfileSigner().signSpans(sjisSpans).toSeq
    val t2 = graft.frontier.TextProfileSigner().signSpans(utf8Spans).toSeq
    assert(t1 == t2)
  }

  test("unlabelled valid UTF-8 stays UTF-8; truncated final sequence tolerated") {
    val utf8 = "<html><body>über 中文</body></html>".getBytes("UTF-8")
    assert(Charsets.detect(null, utf8, cfg.parserCharsetDefault) == StandardCharsets.UTF_8)
    // cut mid-character (truncation guard can do this): still UTF-8
    val mid = "café".getBytes("UTF-8").dropRight(1) // ends after 0xC3 lead byte
    assert(Charsets.isValidUtf8(mid), "incomplete FINAL sequence is not malformed")
    assert(Charsets.detect(null, mid, cfg.parserCharsetDefault) == StandardCharsets.UTF_8)
    assert(!Charsets.isValidUtf8(Array(0xE9, 'x', 'y').map(_.toByte)), "real malformed bytes fail")
  }

  test("UTF-16 BOM pages decode with the BOM stripped") {
    val text = "<html><body>wide text</body></html>"
    val le = ("\uFEFF" + text).getBytes("UTF-16LE")
    val decoded = Charsets.decode(null, le, cfg.parserCharsetDefault)
    assert(decoded == text, s"BOM must be stripped: ${decoded.take(3).map(_.toInt).toSeq}")
  }
}
