package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.frontier.CrawlConfig
import graft.parse.{DocParsers, Pdf, PdfDocParser}

/** Minimal PDF text extraction (the parse-tika slice): Flate and raw
  * content streams, literal/hex strings, escapes, BT/ET blocks. */
class PdfSpec extends AnyFunSuite {

  private val cfg = CrawlConfig()

  private def deflate(s: String): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(s.getBytes("ISO-8859-1")); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** A minimal single-page PDF whose content stream holds `ops`. */
  private def pdf(ops: String, flate: Boolean): Array[Byte] = {
    val cs = if (flate) deflate(ops) else ops.getBytes("ISO-8859-1")
    val head =
      s"""%PDF-1.4
         |1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj
         |2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj
         |3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj
         |4 0 obj << /Length ${cs.length}${if (flate) " /Filter /FlateDecode" else ""} >>
         |stream
         |""".stripMargin.getBytes("ISO-8859-1")
    val tail = "\nendstream\nendobj\n%%EOF\n".getBytes("ISO-8859-1")
    head ++ cs ++ tail
  }

  test("flate-compressed content stream: Tj, TJ arrays, line ops") {
    val ops = "BT /F1 12 Tf 72 700 Td (Hello crawl world) Tj " +
      "0 -14 Td [(second) -250 (part)] TJ ET"
    val text = Pdf.extractText(pdf(ops, flate = true))
    assert(text.contains("Hello crawl world"))
    assert(text.contains("second") && text.contains("part"))
  }

  test("raw stream, escapes, balanced parens, hex strings") {
    val ops = """BT (paren \(nested\) and \\ backslash) Tj (octal \101\102) Tj <48454C4C4F> Tj ET"""
    val text = Pdf.extractText(pdf(ops, flate = false))
    assert(text.contains("paren (nested) and \\ backslash"))
    assert(text.contains("AB"), s"octal escapes decode: $text")
    assert(text.contains("HELLO"), s"hex strings decode: $text")
  }

  test("backslash-EOL line continuation inside a literal string is elided") {
    val ops = "BT (conti\\\nnued and \\\r\nagain) Tj ET"
    val text = Pdf.extractText(pdf(ops, flate = false))
    assert(text.contains("continued and again"), s"line continuations elide: $text")
  }

  test("strings OUTSIDE BT/ET are ignored; corrupt bytes never throw") {
    val ops = "(not shown) Tj BT (shown) Tj ET (also hidden) Tj"
    val text = Pdf.extractText(pdf(ops, flate = false))
    assert(text.contains("shown") && !text.contains("not shown") && !text.contains("hidden"))
    assert(Pdf.extractText("%PDF-1.4 garbage stream  endstream".getBytes) != null)
    assert(Pdf.extractText(Array[Byte]()) == "")
    assert(Pdf.extractText(null) == "")
  }

  test("registry dispatch: application/pdf and .pdf and %PDF magic reach the parser") {
    assert(DocParsers.forMime("application/pdf") == PdfDocParser)
    val bytes = pdf("BT (dispatched text) Tj ET", flate = true)
    // by header, by extension, and by content magic with a lying header
    for ((ct, url) <- Seq(
      ("application/pdf", "http://x.test/doc"),
      (null, "http://x.test/doc.pdf"),
      ("text/html", "http://x.test/doc"))) {
      val spans = DocParsers.parseSpans(ct, url, bytes, cfg)
      assert(spans.exists(s => s.kind == "text" && s.text.contains("dispatched text")),
        s"($ct, $url) → $spans")
    }
    // a scanned/imageless PDF degrades to an opaque media span
    val empty = pdf("q 1 0 0 1 0 0 cm Q", flate = true)
    val spans = DocParsers.parseSpans("application/pdf", "http://x.test/scan.pdf", empty, cfg)
    assert(spans.head.kind == "media")
  }
}
