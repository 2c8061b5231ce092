package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Web-corpus preprocessing as PURE COLUMN MATH — the two front-door
  * operators of a crawl→training-data pipeline that the engine did not yet
  * cover: HTML main-text extraction (the WET-style pass that turns markup
  * into trainable text, plus the link-density quality signal boilerplate
  * filters gate on) and URL canonicalization (the normalize-before-dedup
  * pass that collapses tracking-param/fragment/case variants of the same
  * page).
  *
  * Everything here is `regexp_replace`/`regexp_extract_all`/string
  * functions — whole-stage-codegen'd, shuffle-free, and (deliberately)
  * restricted to regex constructs with IDENTICAL semantics in Java regex
  * and RE2 (inline `(?s)` flags, non-greedy `.*?`, character classes — no
  * backreferences, no lookaround), so the DuckDB oracles run the same
  * patterns verbatim. At 100 TB both ops are map-only scans; the
  * canonical URL then feeds the ordinary exact-dedup groupBy.
  */
object Web {

  /** Strip an HTML payload to its text: drop script/style subtrees (their
    * CONTENT is not text — a tag-only strip would leak JavaScript into
    * the corpus, the classic extraction bug), drop comments, strip the
    * remaining tags, decode the common entities, collapse whitespace.
    * Tag matching is case-INsensitive (`(?is)` — HTML is; legacy pages
    * use `<SCRIPT>`), and `&amp;` decodes LAST so escaped entities stay
    * literal (`&amp;lt;` → `&lt;` the text, never `<` the markup). */
  def htmlText(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    val entities = Seq("&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&nbsp;" -> " ", "&amp;" -> "&")
    val decoded = entities.foldLeft(noTags) { case (c, (e, v)) =>
      regexp_replace(c, e, v)
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** The anchor texts of every `<a …>…</a>` in document order — the
    * numerator of [[linkDensityBp]] and the input of anchor-text corpora
    * (a common retrieval-training signal). Case-insensitive, and the
    * attribute list is optional (`<a>` anchors exist). */
  def anchorTexts(html: Column): Column =
    regexp_extract_all(html, lit("(?is)<a(?: [^>]*)?>(.*?)</a>"), lit(1))

  /** Link density in basis points: 10⁴ · anchor-text chars / total text
    * chars (integers end to end — ⌊·⌋ of an exactly-defined IEEE division,
    * so both engines agree bit-for-bit; a rounded DOUBLE column would
    * hash-mismatch on ties). The numerator runs through the SAME
    * [[htmlText]] cleanup as the denominator — an image-only anchor
    * (`<a><img …></a>`) contributes its visible text (none), not its
    * markup bytes — so the ratio is commensurate and ≤ 10⁴.
    * Boilerplate/navigation pages score high; prose scores low — the
    * standard quality-gate threshold is ~3000. */
  def linkDensityBp(html: Column): Column = {
    val linkChars = length(htmlText(array_join(anchorTexts(html), " ")))
    val total = greatest(length(htmlText(html)), lit(1))
    floor(linkChars.cast("double") * 10000.0 / total).cast("int")
  }

  /** Canonical URL: lowercase the scheme://host[:port] prefix, drop a
    * scheme-default port, drop a leading `www.`, drop every `utm_*`
    * tracking parameter (and the separator it owned), drop the fragment,
    * and a now-empty `?`. Path and non-tracking query params keep their
    * case (they are resource-significant). This is the normalize-before-
    * group-by key of URL-level dedup: variants of one page collapse,
    * distinct resources never merge. */
  def canonicalUrl(url: Column): Column = {
    // lowercase ONLY the authority prefix; the path/query tail is
    // case-significant
    val prefix = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", 0)
    val tail = regexp_replace(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    val lowered = concat(lower(prefix), tail)
    val noFrag = regexp_replace(lowered, "#.*", "")
    // the ([/?#]|$) capture keeps whatever delimiter followed the port
    // (or nothing at end-of-string) — no lookahead, which RE2 lacks
    val noPort = regexp_replace(
      regexp_replace(noFrag, "^(https://[^/:?#]*):443([/?#]|$)", "$1$2"),
      "^(http://[^/:?#]*):80([/?#]|$)", "$1$2")
    val noWww = regexp_replace(noPort, "^(https?://)www\\.", "$1")
    // utm params: drop non-leading ones whole (`&utm_…`), then a leading
    // one hands its `?` to the next param, then a lone one vanishes —
    // three separator-exact passes, no debris to collapse
    val noUtmMid = regexp_replace(noWww, "&utm_[^&#]*", "")
    val noUtmLead = regexp_replace(noUtmMid, "\\?utm_[^&#]*&", "?")
    regexp_replace(noUtmLead, "\\?utm_[^&#]*$", "")
  }

  /** Host of an (already canonical) URL. */
  def urlHost(url: Column): Column =
    regexp_extract(url, "^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1)

  /** Registrable-domain approximation: the last two dot-labels of the
    * host — the standard fallback when the public-suffix list is
    * unavailable (exact for .com/.org-style hosts). For the exact form
    * see [[registrableDomainPsl]]. */
  def registrableDomain(host: Column): Column =
    when(host.rlike("[^.]+\\.[^.]+$"),
      regexp_extract(host, "([^.]+\\.[^.]+)$", 1)).otherwise(host)

  /** EXACT registrable domain via a public-suffix-list broadcast join —
    * the scale-correct form of what a per-row PSL library lookup does.
    * Returns the DISTINCT `(host, domain)` mapping (hosts repeat heavily
    * in a crawl — resolve each once, broadcast-join the mapping back):
    * explode each distinct host's proper dot-suffixes (bounded fan-out —
    * hosts have ≤ a handful of labels), semi-join the broadcast
    * `psl(suffix)` relation, keep the LONGEST matching suffix per host
    * (partial-aggregable max — the op's only shuffle, keyed on the
    * distinct host), and prepend one label. Hosts matching no suffix fall
    * back to [[registrableDomain]]'s two-label approximation (the PSL's
    * own convention for unknown TLDs). */
  def registrableDomainPsl(hosts: org.apache.spark.sql.DataFrame,
      hostCol: String,
      psl: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val h = hosts.select(col(hostCol).as("host")).distinct()
      .withColumn("labels", split(col("host"), "\\."))
      .withColumn("n", size(col("labels")))
    // proper suffixes L(i+1..n) for i = 1..n-1 (single-label hosts emit
    // one empty suffix, which matches no PSL row and falls through)
    val cand = h.select(col("host"), col("labels"), col("n"),
        explode(transform(sequence(lit(1), greatest(col("n") - 1, lit(1))),
          i => array_join(slice(col("labels"), i + 1, col("n") - i), ".")))
          .as("suffix"))
      .withColumn("slen", size(split(col("suffix"), "\\.")))
    val matched = cand
      .join(broadcast(psl.select(col("suffix"))), Seq("suffix"), "left_semi")
      .groupBy(col("host"), col("labels"), col("n"))
      .agg(max(col("slen")).as("best"))
      .select(col("host"),
        array_join(slice(col("labels"), col("n") - col("best"),
          col("best") + 1), ".").as("domain"))
    val unmatched = h
      .join(matched.select(col("host")), Seq("host"), "left_anti")
      .select(col("host"), registrableDomain(col("host")).as("domain"))
    matched.unionByName(unmatched)
  }
}
