package graft.parse

import graft.frontier.CrawlConfig
import graft.schema.Span

/** parse-ext plugin (reference src/plugin/parse-ext/ExtParser.java:70-143):
  * delegate parsing of a configured content type to an EXTERNAL command —
  * raw fetched bytes on stdin, extracted text on stdout, with a hard
  * timeout and a non-zero-exit ⇒ parse-failure rule. Outlinks are then
  * mined from the extracted text with the reference's plain-text URL
  * pattern (parse/OutlinkExtractor.java:55-57), exactly as ExtParser does
  * after the command returns.
  *
  * The command table lives in [[CrawlConfig.extParsers]] (mime → command),
  * the analog of the reference's per-extension `contentType`/`command`/
  * `timeout`/`encoding` plugin.xml attributes; [[DocParsers.parseSpans]]
  * consults it before the built-in registry, so an external command
  * OVERRIDES a built-in parser for its mime — same precedence a deployed
  * parse-ext plugin gets from `parser.order`.
  *
  * Scale note: the process spawn happens once per DOCUMENT inside the fetch
  * task (executor-local, no shuffle), identical in shape to the reference's
  * CommandRunner-per-document. It is inherently the expensive path — the
  * registry's in-JVM parsers remain the default for every mime not
  * explicitly configured here.
  */
object ExtParser {

  /** One configured external command: argv (NOT shell-interpolated — the
    * reference appends the content type as the last argument, mirrored
    * here), timeout in seconds (reference TIMEOUT_DEFAULT = 30), and the
    * encoding used to decode stdout. */
  final case class ExtCommand(
      command: Seq[String],
      timeoutSec: Int = 30,
      encoding: String = "UTF-8",
      appendContentType: Boolean = true)

  /** The reference's plain-text URL pattern, verbatim
    * (OutlinkExtractor.java:55-57). */
  private val UrlPattern = java.util.regex.Pattern.compile(
    "([A-Za-z][A-Za-z0-9+.-]{1,120}:[A-Za-z0-9/](([A-Za-z0-9$_.+!*,;/?:@&~=-])|%[A-Fa-f0-9]{2}){1,333}(#([a-zA-Z0-9][a-zA-Z0-9$_.+!*,;/?:@&~=%-]{0,1000}))?)")

  /** Outlinks of plain text (OutlinkExtractor.getOutlinks:84-118): every
    * URL-pattern match, deduped in first-seen order. */
  def textOutlinks(text: String): Seq[String] = {
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    val m = UrlPattern.matcher(text)
    while (m.find()) seen += m.group(1)
    seen.toSeq
  }

  /** Run the command over the content. Returns the decoded stdout, or None
    * on timeout / non-zero exit / spawn failure (the reference's
    * ParseStatus.FAILED ⇒ empty parse). stdout is drained on a pumping
    * thread so a large extraction can never deadlock against the stdin
    * write (CommandRunner.java does the same with pump threads). */
  def run(cmd: ExtCommand, contentType: String, content: Array[Byte]): Option[String] = {
    val argv = if (cmd.appendContentType) cmd.command :+ contentType else cmd.command
    try {
      val pb = new ProcessBuilder(argv: _*)
      pb.redirectErrorStream(false)
      val proc = pb.start()
      val out = new java.io.ByteArrayOutputStream(4096)
      val pump = new Thread(() => {
        try {
          val in = proc.getInputStream
          val buf = new Array[Byte](8192)
          var r = in.read(buf)
          while (r >= 0) { out.write(buf, 0, r); r = in.read(buf) }
        } catch { case _: Exception => () }
      }, "graft-ext-parser-stdout")
      pump.setDaemon(true)
      pump.start()
      // stdin is pumped on its own thread too: a child that never drains
      // stdin would otherwise block the calling fetch thread once the OS
      // pipe buffer fills, putting the write BEFORE waitFor and defeating
      // the timeout (CommandRunner.java pumps stdin for the same reason)
      val push = new Thread(() => {
        try {
          proc.getOutputStream.write(content)
          proc.getOutputStream.close()
        } catch { case _: Exception => () } // command may exit without reading stdin
      }, "graft-ext-parser-stdin")
      push.setDaemon(true)
      push.start()
      val finished = proc.waitFor(cmd.timeoutSec.toLong, java.util.concurrent.TimeUnit.SECONDS)
      if (!finished) {
        proc.destroyForcibly()
        None
      } else if (proc.exitValue() != 0) None
      else {
        pump.join(1000)
        Some(new String(out.toByteArray, cmd.encoding))
      }
    } catch {
      case scala.util.control.NonFatal(_) => None
    }
  }
}

/** The DocParser face of one configured external command: text span from
  * stdout (whitespace-collapsed like parse-text) + link spans from the
  * reference's OutlinkExtractor pattern. A failed command yields an empty
  * parse — the page still completes its fetch (status semantics are the
  * fetcher's, exactly as in the reference where a FAILED ParseStatus does
  * not fail the fetch). */
final case class ExtDocParser(contentType: String, cmd: ExtParser.ExtCommand) extends DocParser {
  override def needsText: Boolean = false
  override def parse(url: String, text: String, content: Array[Byte], cfg: CrawlConfig): Seq[Span] =
    ExtParser.run(cmd, contentType, content) match {
      case None => Seq.empty
      case Some(stdout) =>
        val body = stdout.replaceAll("\\s+", " ").trim
        val head = if (body.isEmpty) Nil else Seq(Span("text", body, null, 0))
        head ++ ExtParser.textOutlinks(stdout).zipWithIndex.map { case (l, i) =>
          Span("link", null, l, head.size + i)
        }
    }
}
