package graft.parse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** parsefilter-regex plugin (reference src/plugin/parsefilter-regex/
  * RegexParseFilter.java): per-document boolean metadata flags from regex
  * matches over the raw HTML or the extracted text — the reference stamps
  * parse_meta[field] = "true"/"false" for every configured rule
  * (Matcher.find semantics; a null source counts as no-match).
  *
  * Re-expressed as a pure column transform over a parsed-documents table:
  * one codegen'd RLIKE per rule, no UDFs. The flags land either as
  * top-level string columns (flagColumns — index-metadata can lift them) or
  * folded into an existing `parse_meta` map column (stampParseMeta — the
  * db.parsemeta.to.crawldb shape). */
object ParseFilters {

  /** One rule: `field` is the flag name, `source` ∈ {html, text} picks the
    * haystack column, `regex` uses Java find() semantics. */
  case class RegexParseRule(field: String, source: String, regex: String) {
    require(source == "html" || source == "text", s"source must be html|text: $source")
  }

  /** Parse the reference rule-file format (RegexParseFilter
    * .readConfiguration:150-170): one `field source regex` triple per line,
    * '#' comment lines and malformed lines skipped. */
  def parseRules(text: String): Seq[RegexParseRule] =
    text.linesIterator.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .flatMap { l =>
        l.split("\\s+") match {
          case Array(field, source, regex) if source == "html" || source == "text" =>
            Some(RegexParseRule(field, source, regex))
          case _ => None
        }
      }.toSeq

  private def flag(docs: DataFrame, r: RegexParseRule, htmlCol: String, textCol: String): Column = {
    val src = if (r.source == "html") htmlCol else textCol
    val c = if (docs.columns.contains(src)) col(src) else lit(null).cast("string")
    when(c.isNotNull && c.rlike(r.regex), "true").otherwise("false")
  }

  /** One string column ("true"/"false") per rule. */
  def flagColumns(docs: DataFrame, rules: Seq[RegexParseRule],
                  htmlCol: String = "html", textCol: String = "text"): DataFrame =
    rules.foldLeft(docs)((d, r) => d.withColumn(r.field, flag(docs, r, htmlCol, textCol)))

  /** parsefilter-debug (reference src/plugin/parsefilter-debug
    * DebugParseFilter.java:46-54): the reference serializes the parser's DOM
    * into parse_meta["DOM"] so an operator can see how the parser
    * interpreted a document. This engine's parser output IS the interleaved
    * span sequence, so its serialization — one element per span, kind +
    * order + payload — is the faithful analog, stamped into the same
    * parse_meta["DOM"] slot. Pure column code (transform + array_join):
    * debug stamping adds no UDF and no shuffle to the parsed write. */
  def stampDom(docs: DataFrame, spansCol: String = "spans",
               metaCol: String = "parse_meta"): DataFrame = {
    if (!docs.columns.contains(spansCol)) return docs
    val dom = concat(
      lit("<doc>\n"),
      array_join(
        transform(col(spansCol), s =>
          concat(lit("  <span kind=\""), s.getField("kind"),
            lit("\" order=\""), s.getField("offset").cast("string"), lit("\">"),
            coalesce(s.getField("text"), s.getField("media_ref"), lit("")),
            lit("</span>"))),
        "\n"),
      lit("\n</doc>"))
    val entry = map(lit("DOM"), dom)
    val merged =
      // last-put-wins merge: a pre-existing "DOM" key must not throw under
      // Spark's default EXCEPTION map-key dedup policy (re-stamp replaces)
      if (docs.columns.contains(metaCol))
        graft.functions.GraftFunctions.map_concat_last_wins(col(metaCol), entry)
      else entry
    docs.withColumn(metaCol, merged)
  }

  /** Fold the flags into a `parse_meta` map column (created when absent) —
    * the reference's ParseData.parseMeta destination, from which
    * db.parsemeta.to.crawldb and index-metadata pick fields up. */
  def stampParseMeta(docs: DataFrame, rules: Seq[RegexParseRule],
                     htmlCol: String = "html", textCol: String = "text",
                     metaCol: String = "parse_meta"): DataFrame = {
    if (rules.isEmpty) return docs
    val flags = map(rules.flatMap(r => Seq(lit(r.field), flag(docs, r, htmlCol, textCol))): _*)
    val merged =
      // last-put-wins: a flag name colliding with an existing parse_meta key
      // replaces it instead of throwing (default map-key dedup = EXCEPTION)
      if (docs.columns.contains(metaCol))
        graft.functions.GraftFunctions.map_concat_last_wins(col(metaCol), flags)
      else flags
    docs.withColumn(metaCol, merged)
  }
}
