package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.frontier.CrawlConfig
import graft.parse.{DocParsers, ExtParser}
import graft.parse.ExtParser.ExtCommand

/** parse-ext (reference src/plugin/parse-ext ExtParser.java): external
  * command parses a configured content type — stdin = raw bytes, stdout =
  * text, timeout + non-zero-exit ⇒ failed (empty) parse, outlinks mined
  * from the text with OutlinkExtractor's URL pattern. */
class ExtParserSpec extends AnyFunSuite with SparkSpecBase {

  private val Mime = "application/x-ext-test"
  private def cfgWith(cmd: ExtCommand) =
    CrawlConfig(extParsers = Map(Mime -> cmd))

  test("cat round-trips content into a text span and mines outlinks") {
    val content = "hello ext world see http://ex.test/page?a=1 and https://ex2.test/x done"
    // appendContentType=false: cat would treat the extra arg as a filename
    val cmd = ExtCommand(Seq("cat"), appendContentType = false)
    val spans = DocParsers.parseSpans(Mime, "http://src.test/doc.ext",
      content.getBytes("UTF-8"), cfgWith(cmd))
    assert(spans.head.kind == "text")
    assert(spans.head.text == content)
    val links = spans.filter(_.kind == "link").map(_.media_ref)
    assert(links == Seq("http://ex.test/page?a=1", "https://ex2.test/x"))
    // interleave order: text first, then links in first-seen order
    assert(spans.map(_.offset) == spans.indices.map(_.toInt))
  }

  test("the content type is appended as the last argument (reference command+' '+contentType)") {
    // echo prints its args: with appendContentType on, stdout carries the mime
    val cmd = ExtCommand(Seq("echo", "parsed-by"))
    val spans = DocParsers.parseSpans(Mime, "http://src.test/d", Array[Byte](1, 2),
      cfgWith(cmd))
    assert(spans.head.text == s"parsed-by $Mime")
  }

  test("non-zero exit yields an empty parse (ParseStatus.FAILED analog)") {
    val cmd = ExtCommand(Seq("sh", "-c", "exit 3"), appendContentType = false)
    assert(ExtParser.run(cmd, Mime, "x".getBytes).isEmpty)
    assert(DocParsers.parseSpans(Mime, "http://s.test/d", "x".getBytes, cfgWith(cmd)).isEmpty)
  }

  test("timeout kills the command and yields an empty parse") {
    val cmd = ExtCommand(Seq("sh", "-c", "sleep 30"), timeoutSec = 1, appendContentType = false)
    val t0 = System.nanoTime()
    assert(ExtParser.run(cmd, Mime, "x".getBytes).isEmpty)
    assert((System.nanoTime() - t0) / 1e9 < 10, "timeout enforced, not waited out")
  }

  test("a command that never reads stdin still completes (pump-thread deadlock guard)") {
    // 1 MB of input, command ignores stdin entirely
    val big = Array.fill[Byte](1024 * 1024)('a'.toByte)
    val cmd = ExtCommand(Seq("echo", "ok"), appendContentType = false)
    assert(ExtParser.run(cmd, Mime, big).map(_.trim).contains("ok"))
  }

  test("unconfigured mimes still hit the built-in registry") {
    val cfg = cfgWith(ExtCommand(Seq("cat"), appendContentType = false))
    val spans = DocParsers.parseSpans("text/plain", "http://s.test/t",
      "plain body".getBytes("UTF-8"), cfg)
    assert(spans.head.text == "plain body") // PlainTextDocParser, not ext
  }

  test("textOutlinks dedupes in first-seen order like OutlinkExtractor") {
    val links = ExtParser.textOutlinks(
      "a http://a.test/1 b http://b.test/2 c http://a.test/1")
    assert(links == Seq("http://a.test/1", "http://b.test/2"))
  }
}
