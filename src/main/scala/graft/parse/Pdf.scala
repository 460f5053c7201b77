package graft.parse

import java.util.zip.Inflater

import graft.frontier.CrawlConfig
import graft.schema.Span

/** Minimal PDF text extraction — the slice of the reference's parse-tika
  * (src/plugin/parse-tika → Apache PDFBox) that a crawl actually needs:
  * the text of ordinary Flate-compressed PDFs, with one parsed doc per
  * file. No imaging/PDF library ships in this container, so this is a
  * from-scratch reader of the format's text layer:
  *
  *  - content streams located by `stream … endstream` framing; streams
  *    whose preceding dictionary says /FlateDecode inflate via
  *    java.util.zip (zlib IS the PDF Flate codec), others read raw;
  *  - text operators inside BT…ET blocks: `(…) Tj`, `(…) '`, `[ … ] TJ`
  *    (literal strings with \-escapes and balanced parens, hex strings
  *    `<…>`), TD/Td/T* treated as line breaks;
  *
  * DOCUMENTED LIMITS: no font CMap/ToUnicode resolution (text using
  * non-trivial embedded encodings garbles — PDFBox territory), no
  * encryption, no xref walking (streams are found by scanning, which also
  * survives mildly corrupt files). ASCII/WinAnsi text PDFs — the
  * overwhelming bulk of crawled documents — extract correctly.
  */
object Pdf {

  private val StreamStart = "stream".getBytes("ISO-8859-1")
  private val StreamEnd = "endstream".getBytes("ISO-8859-1")

  /** Raw (undecoded) byte ranges of every content stream + its dict text. */
  private def streams(b: Array[Byte]): Seq[(String, Array[Byte])] = {
    val out = Seq.newBuilder[(String, Array[Byte])]
    var i = 0
    while (i >= 0 && i < b.length) {
      i = indexOf(b, StreamStart, i)
      if (i >= 0) {
        // require the keyword boundary (not "endstream"/"streamline")
        val okBefore = i == 0 || !Character.isLetter((b(i - 1) & 0xff).toChar)
        var ds = i + StreamStart.length
        // EOL after the keyword: CRLF or LF
        if (ds < b.length && b(ds) == '\r') ds += 1
        if (ds < b.length && b(ds) == '\n') ds += 1
        val e = indexOf(b, StreamEnd, ds)
        if (okBefore && e > ds) {
          // the governing dictionary: the last "<<" before the keyword
          val dictStart = lastIndexOf(b, "<<".getBytes("ISO-8859-1"), i)
          val dict =
            if (dictStart >= 0) new String(b, dictStart, i - dictStart, "ISO-8859-1") else ""
          var de = e
          // strip the EOL before "endstream"
          while (de > ds && (b(de - 1) == '\n' || b(de - 1) == '\r')) de -= 1
          out += ((dict, java.util.Arrays.copyOfRange(b, ds, de)))
        }
        i = if (e > 0) e + StreamEnd.length else -1
      }
    }
    out.result()
  }

  private def indexOf(b: Array[Byte], pat: Array[Byte], from: Int): Int = {
    var i = math.max(0, from)
    val n = b.length - pat.length
    while (i <= n) {
      var j = 0
      while (j < pat.length && b(i + j) == pat(j)) j += 1
      if (j == pat.length) return i
      i += 1
    }
    -1
  }

  private def lastIndexOf(b: Array[Byte], pat: Array[Byte], before: Int): Int = {
    var i = math.min(before, b.length) - pat.length
    while (i >= 0) {
      var j = 0
      while (j < pat.length && b(i + j) == pat(j)) j += 1
      if (j == pat.length) return i
      i -= 1
    }
    -1
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(data.length * 4)
    val buf = new Array[Byte](16 * 1024)
    try {
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n == 0 && !inf.finished()) return out.toByteArray // stuck: partial ok
        out.write(buf, 0, n)
      }
      out.toByteArray
    } catch {
      case _: Exception => out.toByteArray // truncated/corrupt: keep prefix
    } finally inf.end()
  }

  /** Text operators of one decoded content stream. */
  private def textOf(cs: String): String = {
    val sb = new StringBuilder
    var i = 0
    var inText = false
    def isDelim(c: Char) = c.isWhitespace || "()<>[]{}/%".indexOf(c) >= 0

    while (i < cs.length) {
      val c = cs.charAt(i)
      if (c == '(') {
        // literal string with escapes + balanced parens
        val s = new StringBuilder
        var depth = 1
        i += 1
        while (i < cs.length && depth > 0) {
          val ch = cs.charAt(i)
          if (ch == '\\' && i + 1 < cs.length) {
            cs.charAt(i + 1) match {
              case 'n' => s += '\n'; case 'r' => s += '\r'; case 't' => s += '\t'
              case 'b' => s += '\b'; case 'f' => s += '\f'
              case '(' => s += '('; case ')' => s += ')'; case '\\' => s += '\\'
              case d if d.isDigit => // octal \ddd
                var k = i + 1; var v = 0
                while (k < cs.length && k <= i + 3 && cs.charAt(k).isDigit) {
                  v = v * 8 + (cs.charAt(k) - '0'); k += 1
                }
                s += v.toChar; i = k - 2
              case '\r' => // \<EOL> = line continuation: elide (PDF 7.3.4.2)
                if (i + 2 < cs.length && cs.charAt(i + 2) == '\n') i += 1
              case '\n' => ()
              case o => s += o
            }
            i += 2
          } else {
            if (ch == '(') depth += 1
            else if (ch == ')') depth -= 1
            if (depth > 0) s += ch
            i += 1
          }
        }
        if (inText) sb.append(s)
      } else if (c == '<' && i + 1 < cs.length && cs.charAt(i + 1) != '<') {
        // hex string (single-byte codes — no CMap resolution)
        val e = cs.indexOf('>', i)
        if (e > i) {
          if (inText) {
            val hex = cs.substring(i + 1, e).filterNot(_.isWhitespace)
            var k = 0
            while (k + 1 < hex.length) {
              try sb += Integer.parseInt(hex.substring(k, k + 2), 16).toChar
              catch { case _: NumberFormatException => () }
              k += 2
            }
          }
          i = e + 1
        } else i += 1
      } else if (c == '<' || c == '>') {
        i += 2 // dict delimiters << >>
      } else if (c.isLetter || c == '\'' || c == '"' || c == '*') {
        // operator token
        val start = i
        while (i < cs.length && !isDelim(cs.charAt(i))) i += 1
        cs.substring(start, i) match {
          case "BT" => inText = true
          case "ET" => inText = false; sb += '\n'
          case "Td" | "TD" | "T*" => if (inText) sb += '\n'
          case "'" | "\"" => if (inText) sb += '\n' // next-line show already appended
          case "TJ" | "Tj" => if (inText) sb += ' '
          case _ => ()
        }
      } else i += 1
    }
    sb.toString
  }

  /** Extract the document text (whitespace-collapsed) from raw PDF bytes. */
  def extractText(content: Array[Byte]): String = {
    if (content == null || content.length < 5) return ""
    try {
      val parts = streams(content).map { case (dict, raw) =>
        val data = if (dict.contains("/FlateDecode")) inflate(raw) else raw
        textOf(new String(data, "ISO-8859-1"))
      }
      parts.mkString(" ").replaceAll("\\s+", " ").trim
    } catch { case scala.util.control.NonFatal(_) => "" }
  }
}

/** application/pdf → one text span (parse-tika's output shape for PDFs). */
object PdfDocParser extends DocParser {
  override def needsText: Boolean = false
  override def parse(url: String, text: String, content: Array[Byte], cfg: CrawlConfig): Seq[Span] = {
    val t = Pdf.extractText(content)
    if (t.isEmpty) Seq(Span("media", null, url, 0)) // scanned/encrypted: opaque
    else Seq(Span("text", t, null, 0))
  }
}
