package graft.url

import java.util.Locale

/** Public-suffix matching for registered-domain extraction.
  *
  * Same algorithm family as the reference's crawler-commons
  * EffectiveTldFinder (used at reference/src/java/org/apache/nutch/crawl/
  * URLPartitioner.java:105-107 for by-domain partitioning and caps):
  * the publicsuffix.org rule semantics —
  *
  *  - a rule matches when its labels equal the host's trailing labels;
  *  - `*.` rules match any single label in that position;
  *  - `!` exception rules beat everything (their suffix is one label
  *    shorter than written);
  *  - among plain matches the rule with the most labels wins;
  *  - no match ⇒ implicit default rule `*` (the TLD itself is the suffix).
  *
  * Registered domain = public suffix + one more label.
  *
  * Rule data: the COMPLETE publicsuffix.org list (public data, MPL-2.0),
  * embedded as the classpath resource `public_suffix_list.dat` and loaded
  * at class init — the same data crawler-commons embeds for the reference.
  * The curated subset below remains as the fallback when the resource is
  * absent (stripped jars); the synthetic-web fixture TLD `fix.test` is
  * always appended so fixture hosts keep their per-site registered domains.
  */
object PublicSuffix {

  /** The full public-suffix list from the embedded resource; rule lines
    * only (comments/blanks dropped, first whitespace terminates a rule). */
  private def loadFullList(): Option[Array[String]] = {
    val in = getClass.getResourceAsStream("/public_suffix_list.dat")
    if (in == null) None
    else try {
      val src = scala.io.Source.fromInputStream(in, "UTF-8")
      try {
        val rules = src.getLines()
          .map(_.trim.takeWhile(c => !c.isWhitespace))
          .filter(l => l.nonEmpty && !l.startsWith("//"))
          .toArray
        if (rules.nonEmpty) Some(rules) else None
      } finally src.close()
    } finally in.close()
  }

  // fallback data: curated PSL subset
  // format: plain suffix | "*.x" wildcard | "!x" exception
  private val CuratedRules: Array[String] = Array(
    // --- generic: covered by the default rule; only multi-label needs listing ---
    // United Kingdom
    "co.uk", "org.uk", "me.uk", "ltd.uk", "plc.uk", "net.uk", "sch.uk",
    "ac.uk", "gov.uk", "nhs.uk", "police.uk",
    // Australia
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    // Japan (prefecture wildcards omitted; common 2nd-level kept)
    "co.jp", "ne.jp", "or.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    // Brazil
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "art.br", "blog.br",
    // China
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    // India
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in", "ac.in", "edu.in", "gov.in", "res.in",
    // Mexico / Argentina / Colombia / Chile / Peru / Venezuela
    "com.mx", "net.mx", "org.mx", "gob.mx", "edu.mx",
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar",
    "com.co", "net.co", "org.co", "gov.co", "edu.co",
    "gob.cl", "gov.cl", "mil.cl",
    "com.pe", "net.pe", "org.pe", "gob.pe", "edu.pe",
    "com.ve", "net.ve", "org.ve", "gob.ve",
    // New Zealand / South Africa / Singapore / Hong Kong / Taiwan
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz", "geek.nz", "gen.nz", "maori.nz",
    "co.za", "net.za", "org.za", "gov.za", "ac.za", "web.za",
    "com.sg", "net.sg", "org.sg", "gov.sg", "edu.sg",
    "com.hk", "net.hk", "org.hk", "gov.hk", "edu.hk", "idv.hk",
    "com.tw", "net.tw", "org.tw", "gov.tw", "edu.tw", "idv.tw",
    // Korea / Thailand / Malaysia / Indonesia / Philippines / Vietnam
    "co.kr", "ne.kr", "or.kr", "re.kr", "pe.kr", "go.kr", "ac.kr", "hs.kr", "ms.kr", "es.kr",
    "co.th", "net.th", "or.th", "ac.th", "go.th", "in.th",
    "com.my", "net.my", "org.my", "gov.my", "edu.my",
    "co.id", "net.id", "or.id", "web.id", "ac.id", "sch.id", "go.id", "my.id", "biz.id",
    "com.ph", "net.ph", "org.ph", "gov.ph", "edu.ph",
    "com.vn", "net.vn", "org.vn", "gov.vn", "edu.vn", "ac.vn", "info.vn", "name.vn",
    // Turkey / Israel / Egypt / Saudi / UAE / Pakistan / Bangladesh
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr", "bel.tr", "gen.tr", "web.tr", "av.tr", "k12.tr",
    "co.il", "net.il", "org.il", "gov.il", "ac.il", "muni.il", "k12.il", "idf.il",
    "com.eg", "net.eg", "org.eg", "gov.eg", "edu.eg", "sci.eg",
    "com.sa", "net.sa", "org.sa", "gov.sa", "edu.sa", "med.sa", "pub.sa", "sch.sa",
    "co.ae", "net.ae", "org.ae", "gov.ae", "ac.ae", "sch.ae", "mil.ae",
    "com.pk", "net.pk", "org.pk", "gov.pk", "edu.pk", "gok.pk", "gop.pk",
    "com.bd", "net.bd", "org.bd", "gov.bd", "edu.bd", "ac.bd", "mil.bd",
    // Europe 2nd-level
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "info.pl", "waw.pl", "biz.pl",
    "com.pt", "net.pt", "org.pt", "edu.pt", "gov.pt", "publ.pt",
    "com.es", "nom.es", "org.es", "gob.es", "edu.es",
    "com.gr", "net.gr", "org.gr", "edu.gr", "gov.gr",
    "com.ro", "org.ro", "tm.ro", "nt.ro", "nom.ro", "info.ro", "rec.ro", "arts.ro", "firm.ro", "store.ro", "www.ro",
    "co.at", "or.at", "ac.at", "gv.at", "priv.at",
    "co.hu", "org.hu", "priv.hu", "info.hu", "tm.hu", "sport.hu", "2000.hu", "bolt.hu", "city.hu",
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua", "kiev.ua", "kyiv.ua",
    "com.ru", "net.ru", "org.ru", "pp.ru", "msk.ru", "spb.ru",
    "co.it", // (rare but registered)
    // Nordic / Benelux mostly flat; Ireland/Iceland/Malta
    "gov.ie", "com.mt", "net.mt", "org.mt", "edu.mt", "gov.mt",
    // US structure
    "k12.ca.us", "cc.ca.us", "lib.ca.us", "state.ca.us",
    "fed.us", "isa.us", "nsn.us", "dni.us",
    // Canada provinces
    "ab.ca", "bc.ca", "mb.ca", "nb.ca", "nf.ca", "nl.ca", "ns.ca", "nt.ca",
    "nu.ca", "on.ca", "pe.ca", "qc.ca", "sk.ca", "yk.ca", "gc.ca",
    // wildcard ccTLDs (per PSL)
    "*.ck", "!www.ck",
    "*.bd", "*.er", "*.fk", "*.jm", "*.kh", "*.mm", "*.np", "*.pg", "*.za",
    // --- widely-used private suffixes (PSL PRIVATE section excerpts) ---
    "github.io", "githubusercontent.com", "gitlab.io",
    "blogspot.com", "appspot.com", "web.app", "firebaseapp.com",
    "herokuapp.com", "netlify.app", "vercel.app", "pages.dev", "workers.dev",
    "azurewebsites.net", "cloudfront.net", "amazonaws.com", "elasticbeanstalk.com",
    "s3.amazonaws.com", "wordpress.com", "tumblr.com", "wixsite.com", "weebly.com",
    "neocities.org", "readthedocs.io", "fastly.net", "ngrok.io", "repl.co",
    "glitch.me", "onrender.com", "surge.sh", "fly.dev",
    // --- test fixture TLD ---
    "fix.test"
  )

  private val RuleData: Array[String] =
    loadFullList().map(_ :+ "fix.test").getOrElse(CuratedRules)

  private final case class Rule(labels: Array[String], exception: Boolean, wildcard: Boolean)

  // rules indexed by their LAST label for O(1) candidate lookup
  private val byLast: Map[String, Array[Rule]] = {
    val rules = RuleData.map { raw =>
      val exception = raw.startsWith("!")
      val body = if (exception) raw.substring(1) else raw
      val labels = body.split('.')
      Rule(labels, exception, labels.headOption.contains("*"))
    }
    rules.groupBy(_.labels.last).map { case (k, v) => k -> v }
  }

  /** Number of labels in the host's public suffix (≥ 1), PSL semantics. */
  private def suffixLabelCount(labels: Array[String]): Int = {
    val cands = byLast.getOrElse(labels.last, Array.empty)
    var bestException = 0 // suffix length from an exception rule (rule length - 1)
    var bestPlain = 1     // default rule '*': the TLD itself
    var i = 0
    while (i < cands.length) {
      val r = cands(i)
      val n = r.labels.length
      if (n <= labels.length && ruleMatches(r, labels)) {
        if (r.exception) {
          val len = n - 1
          if (bestException == 0 || len < bestException) bestException = len
        } else if (n > bestPlain) bestPlain = n
      }
      i += 1
    }
    if (bestException > 0) bestException else bestPlain
  }

  private def ruleMatches(r: Rule, labels: Array[String]): Boolean = {
    val n = r.labels.length
    var i = 0
    var ok = true
    while (ok && i < n) {
      val rl = r.labels(n - 1 - i)
      val hl = labels(labels.length - 1 - i)
      if (rl != "*" && rl != hl) ok = false
      i += 1
    }
    ok
  }

  /** The host's public suffix ("com", "co.uk", "github.io", …). */
  def publicSuffixOf(host: String): String = {
    if (host == null) return null
    val labels = host.toLowerCase(Locale.ROOT).split('.')
    if (labels.length <= 1) return host
    labels.takeRight(suffixLabelCount(labels)).mkString(".")
  }

  /** Registered domain = public suffix + one label; the host itself when it
    * IS a public suffix (or a bare label / IP-ish). */
  def registeredDomainOf(host: String): String = {
    if (host == null) return null
    val lower = host.toLowerCase(Locale.ROOT)
    val labels = lower.split('.')
    if (labels.length <= 1) return lower
    val n = suffixLabelCount(labels)
    if (n >= labels.length) lower
    else labels.takeRight(n + 1).mkString(".")
  }
}
