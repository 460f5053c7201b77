package graft.parse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Driver-facing HTML-parse operator (q_parse_html).
  *
  * Builds deterministic HTML around each document's text — token i becomes
  * a link (every 5th, with a "../" relative target every 10th), an img with
  * alt text (every 7th, unless it is a link), or plain prose — then runs the
  * REAL DOM parser ([[Html.parse]]) over the generated page and reports the
  * extracted span statistics. Because the generation scheme is pure
  * arithmetic over the token list, a DuckDB oracle can mirror every output
  * column from first principles WITHOUT parsing HTML: the parser's
  * tokenizer, attribute handling, base-href resolution (incl. ".."
  * collapsing), anchor/alt text and document-order interleaving are all
  * checked value-exactly.
  */
object HtmlOps {

  val BaseHref = "http://b.example/dir/"

  /** The generated page for one document (pure column expression). */
  def syntheticHtml(text: Column): Column = {
    val toks = split(text, " ")
    val title = array_join(slice(toks, 1, 2), " ")
    val body = array_join(transform(toks, (w, i) =>
      when(i % 5 === 0, concat(
        lit("<a href=\""),
        when(i % 10 === 5, concat(lit("../up/w"), i.cast("string"), lit(".html")))
          .otherwise(concat(lit("w"), i.cast("string"), lit(".html"))),
        lit("\">"), w, lit("</a>")))
      .when(i % 7 === 0, concat(lit("<img src=\""), w, lit(".png\" alt=\""), w, lit("\">")))
      .otherwise(w)), " ")
    concat(
      lit("<html><head><title>"), title,
      lit("</title><base href=\"" + BaseHref + "\"></head><body>"),
      body, lit("</body></html>"))
  }

  /** HTMLLanguageParser's metadata-sourced language of a raw HTML column
    * (reference src/plugin/language-identifier HTMLLanguageParser
    * .getLanguageFromMetadata:186-198, precedence dc.language ≻ meta
    * content-language ≻ html lang attribute; the Content-Language response
    * header is the caller's next fallback, as in identifyLanguage:123-137).
    * Pure regexp_extract columns — null when no markup declares a language. */
  def htmlLang(html: Column): Column = {
    def first(pattern: String): Column =
      nullif(regexp_extract(html, pattern, 1), lit(""))
    coalesce(
      first("(?is)<meta[^>]*name\\s*=\\s*[\"']?dc\\.language[\"']?[^>]*content\\s*=\\s*[\"']?([A-Za-z][A-Za-z0-9-]*)"),
      first("(?is)<meta[^>]*http-equiv\\s*=\\s*[\"']?content-language[\"']?[^>]*content\\s*=\\s*[\"']?([A-Za-z][A-Za-z0-9-]*)"),
      first("(?is)<html[^>]*\\slang\\s*=\\s*[\"']?([A-Za-z][A-Za-z0-9-]*)"))
  }

  /** q_meta_headings: parse-metatags + headings plugins over deterministic
    * generated pages — meta description/keywords (mixed-case name attribute
    * exercises the lowercasing) and h1/h2 headings (h1 appears twice →
    * multivalued join) extracted by the REAL DOM walker; every output is
    * pure token arithmetic, so DuckDB mirrors it from first principles. */
  def metaHeadings(docs: DataFrame): DataFrame = {
    val page = {
      val toks = split(col("text"), " ")
      concat(
        lit("<html><head><title>t</title>"),
        lit("<meta name=\"description\" content=\""),
        array_join(slice(toks, 3, 4), " "),
        lit("\"><meta name=\"KeyWords\" content=\""),
        array_join(slice(toks, 7, 3), ","),
        lit("\"></head><body><h1>"), element_at(toks, 1),
        lit("</h1> prose <h2>"), element_at(toks, 2),
        lit("</h2> more <h1>"), element_at(toks, 3),
        lit("</h1></body></html>"))
    }
    val extract = udf((h: String) =>
      Html.extraMeta(h, Seq("description", "keywords"), Seq("h1", "h2"),
        headingsMultivalued = true))
    docs.select(col("doc_id"), extract(page).as("m"))
      .select(col("doc_id"),
        element_at(col("m"), "metatag.description").as("meta_description"),
        element_at(col("m"), "metatag.keywords").as("meta_keywords"),
        element_at(col("m"), "h1").as("h1"),
        element_at(col("m"), "h2").as("h2"))
  }

  /** q_parse_html: real-parse the generated pages, emit per-doc span stats.
    * Partition-local (one UDF parse per row, no shuffle) — the same shape
    * the crawl's parse stage has at scale. */
  def parseHtmlStats(docs: DataFrame): DataFrame = {
    val parse = udf((u: String, h: String) => Html.parse(u, h).spans)
    val withSpans = docs.select(
      col("doc_id"),
      array_join(slice(split(col("text"), " "), 1, 2), " ").as("title"),
      parse(
        concat(lit("http://docs.test/d"), col("doc_id").cast("string"), lit("/page.html")),
        syntheticHtml(col("text"))).as("spans"))
    def ofKind(k: String): Column = filter(col("spans"), s => s.getField("kind") === k)
    withSpans.select(
      col("doc_id"),
      col("title"),
      size(col("spans")).cast("long").as("n_spans"),
      size(ofKind("text")).cast("long").as("n_text"),
      size(ofKind("link")).cast("long").as("n_link"),
      size(ofKind("media")).cast("long").as("n_media"),
      array_join(transform(ofKind("link"), s => s.getField("media_ref")), "|").as("links"),
      array_join(transform(ofKind("link"), s => s.getField("text")), "|").as("anchors"),
      array_join(transform(ofKind("media"), s => s.getField("media_ref")), "|").as("medias"))
  }
}
