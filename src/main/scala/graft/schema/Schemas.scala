package graft.schema

/** Core record types of the crawl engine (SURVEY.md §1.2).
  *
  * Semantics derived from the reference's record types:
  *  - FrontierEntry ≈ CrawlDatum (reference/src/java/org/apache/nutch/crawl/CrawlDatum.java:138-145)
  *  - Doc/Span      ≈ ParseText + Outlink interleaving (input_hint shape)
  *  - FetchResult   ≈ crawl_fetch datum + Content metadata
  *  - HostStats     ≈ HostDatum (reference/src/java/org/apache/nutch/hostdb/HostDatum.java:34-64)
  *
  * All times are epoch milliseconds (Long) for bit-exact parity with the
  * reference, which never uses a timestamp type. Intervals are seconds (Int).
  * Scores are Float (CrawlDatum.score is a Java float).
  */

/** One interleaved document span. kind ∈ {text, link, media, redirect}. */
case class Span(kind: String, text: String, media_ref: String, offset: Int)

/** The authoritative input-table row: interleaved text + media document. */
case class Doc(doc_id: String, spans: Seq[Span])

/** Frontier (CrawlDb) row. `fetch_time` is dual-use like the reference:
  * next scheduled fetch for db_* states, actual fetch time transiently. */
case class FrontierEntry(
    url: String,
    url_hash: Long,
    host: String,
    domain: String,
    status: Byte,
    fetch_time: Long,
    retries: Int,
    fetch_interval: Int,
    score: Float,
    signature: Array[Byte],
    modified_time: Long,
    repr_url: String,
    generate_time: Long, // -1 = unset (the _ngt_ marker)
    metadata: Map[String, String]
)

/** A generated fetch-list row (crawl_generate equivalent).
  * `fetch_delay_ms` is the generator-stamped variable fetch delay
  * (`_variableFetchDelay_`); -1 = unset (use the configured server delay). */
case class FetchTask(
    url: String,
    url_hash: Long,
    host: String,
    domain: String,
    status: Byte,
    fetch_time: Long,
    retries: Int,
    fetch_interval: Int,
    score: Float,
    segment: Int,
    fetch_delay_ms: Long = -1L,
    depth: Int = 1 // scoring-depth: hops from the seed (cfg.scoringDepthMax)
)

/** Fetch outcome (crawl_fetch equivalent). `fetch_time` is the simulated or
  * real wall-clock completion time assigned by the politeness executor. */
case class FetchResult(
    url: String,
    url_hash: Long,
    host: String,
    status: Byte,             // fetch_* status code
    protocol_status: String,  // SUCCESS / NOTFOUND / ROBOTS_DENIED / EXCEPTION / MOVED / TEMP_MOVED / NOTMODIFIED / RETRY
    fetch_time: Long,
    content_type: String,
    signature: Array[Byte],
    repr_url: String,         // representative URL after redirects (null if none)
    retries: Int,
    fetch_interval: Int,
    score: Float,
    round: Int
)

/** Parsed document row: the interleaved spans table plus crawl lineage. */
case class ParsedDoc(
    doc_id: String,
    spans: Seq[Span],
    round: Int,
    signature: Array[Byte],
    score: Float
)

/** One exploded, canonicalized, filtered outlink. */
case class OutlinkRow(
    from_url: String,
    to_url: String,
    to_url_hash: Long,
    host: String,     // host of to_url
    domain: String,
    anchor: String,
    internal: Boolean,
    child_score: Float,
    round: Int
)

/** Typed union row feeding the updatedb merge (SURVEY.md §2.3 "Updatedb merge").
  * kind ∈ {old, fetch, linked} — signature/parse-meta ride on the fetch row. */
case class FrontierUpdate(
    url: String,
    kind: String,
    status: Byte,
    fetch_time: Long,
    retries: Int,
    fetch_interval: Int,
    score: Float,
    signature: Array[Byte],
    modified_time: Long,
    repr_url: String,
    metadata: Map[String, String],
    generate_time: Long = -1L // carried on "old" rows only (the _ngt_ mark)
)

/** Per-host aggregate (HostDatum equivalent; `exceptions`/`robots_denied`
  * are the reference's cumulative failure counters, UpdateHostDbReducer). */
case class HostStats(
    host: String,
    unfetched: Long,
    fetched: Long,
    not_modified: Long,
    redir_temp: Long,
    redir_perm: Long,
    gone: Long,
    score: Float,
    last_check: Long,
    exceptions: Long = 0L,
    robots_denied: Long = 0L
)

/** Per-round, per-partition lineage + counters (north rule). */
case class RoundMetric(
    round: Int,
    stage: String,
    partition_id: Int,
    input_rows: Long,
    output_rows: Long,
    fetched_urls: Long,
    robots_denied: Long,
    retries: Long,
    duration_ms: Long
)

/** Crawl status codes. Values mirror the reference's state space
  * (reference/src/java/org/apache/nutch/crawl/CrawlDatum.java:62-105):
  * DB states ≤ 0x1f, fetch states 0x21-0x3f. */
object CrawlStatus {
  // DB states
  final val DB_UNFETCHED: Byte = 0x01
  final val DB_FETCHED: Byte = 0x02
  final val DB_GONE: Byte = 0x03
  final val DB_REDIR_TEMP: Byte = 0x04
  final val DB_REDIR_PERM: Byte = 0x05
  final val DB_NOTMODIFIED: Byte = 0x06
  final val DB_DUPLICATE: Byte = 0x07
  final val DB_ORPHAN: Byte = 0x08
  // Fetch states
  final val FETCH_SUCCESS: Byte = 0x21
  final val FETCH_RETRY: Byte = 0x22
  final val FETCH_REDIR_TEMP: Byte = 0x23
  final val FETCH_REDIR_PERM: Byte = 0x24
  final val FETCH_GONE: Byte = 0x25
  final val FETCH_NOTMODIFIED: Byte = 0x26

  def hasDbStatus(s: Byte): Boolean = s > 0 && s <= 0x1f
  def hasFetchStatus(s: Byte): Boolean = s >= 0x21 && s <= 0x3f

  def name(s: Byte): String = s match {
    case DB_UNFETCHED      => "db_unfetched"
    case DB_FETCHED        => "db_fetched"
    case DB_GONE           => "db_gone"
    case DB_REDIR_TEMP     => "db_redir_temp"
    case DB_REDIR_PERM     => "db_redir_perm"
    case DB_NOTMODIFIED    => "db_notmodified"
    case DB_DUPLICATE      => "db_duplicate"
    case DB_ORPHAN         => "db_orphan"
    case FETCH_SUCCESS     => "fetch_success"
    case FETCH_RETRY       => "fetch_retry"
    case FETCH_REDIR_TEMP  => "fetch_redir_temp"
    case FETCH_REDIR_PERM  => "fetch_redir_perm"
    case FETCH_GONE        => "fetch_gone"
    case FETCH_NOTMODIFIED => "fetch_notmodified"
    case other             => s"status_$other"
  }
}
