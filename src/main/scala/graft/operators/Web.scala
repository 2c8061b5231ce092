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
  * backreferences, no lookaround; whitespace inside tags is the explicit
  * `[ \t\r\n]` class, identical in both dialects, where Java's `\s`
  * additionally matches `\x0B`), so the DuckDB oracles run the same
  * patterns verbatim. At 100 TB both ops are map-only scans; the
  * canonical URL then feeds the ordinary exact-dedup groupBy.
  */
object Web {

  /** Tag-boundary fragment: a tag name may be followed by an attribute
    * list only after WHITESPACE (newline/tab-separated attributes are
    * legal HTML and common in prettified markup — a literal-space
    * pattern missed `<a\nhref=…>` anchors, r15 verdict #1), and a bare
    * `>` otherwise — so `<scriptfoo>`/`<a-widget>` custom tags never
    * match as script/anchor starts. QUOTE-AWARE like [[TagPattern]]
    * (r16 ADVICE): the attribute walk alternates plain chars with
    * complete quoted strings, so a literal `>` inside a quoted value
    * (`<a href="x>y">`) does not end the open tag early and leak
    * attribute debris into anchor text; an unterminated quote fails
    * the match (the malformed tag stays visible, never swallowing the
    * document). */
  private val TagAttrs =
    "(?:[ \t\r\n][^>\"']*(?:(?:\"[^\"]*\"|'[^']*')[^>\"']*)*)?>"

  /** The bounded entity-decode table (order matters; applied first to
    * last): the common NAMED set plus the numeric/hex references for the
    * same characters (`&#39;`/`&#x27;` debris is endemic in real crawl
    * HTML — r15 missing #3). Fixed-string `replace`, not regex. The
    * ampersand-producing forms are NOT here — they decode via ONE
    * [[AmpEntityPattern]] regex pass at the very end, because (a)
    * decoding `&amp;` early would turn escaped entities (`&amp;lt;`)
    * into live markup, and (b) chaining two ampersand replaces would
    * double-decode `&#38;amp;` → `&` (a single left-to-right regex pass
    * never rescans its own output, so it correctly yields the literal
    * text `&amp;`). */
  val entityTable: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&#60;" -> "<", "&#x3c;" -> "<", "&#x3C;" -> "<",
    "&gt;" -> ">", "&#62;" -> ">", "&#x3e;" -> ">", "&#x3E;" -> ">",
    "&quot;" -> "\"", "&#34;" -> "\"", "&#x22;" -> "\"",
    "&apos;" -> "'", "&#39;" -> "'", "&#x27;" -> "'",
    "&nbsp;" -> " ", "&#160;" -> " ", "&#xa0;" -> " ", "&#xA0;" -> " ",
    "&rsquo;" -> "’", "&lsquo;" -> "‘",
    "&rdquo;" -> "”", "&ldquo;" -> "“",
    "&ndash;" -> "–", "&mdash;" -> "—",
    "&hellip;" -> "…", "&middot;" -> "·",
    "&copy;" -> "©", "&reg;" -> "®", "&trade;" -> "™",
    "&deg;" -> "°", "&euro;" -> "€", "&pound;" -> "£")

  /** The ampersand forms, decoded LAST in one non-rescanning regex pass
    * (see [[entityTable]]). */
  val AmpEntityPattern: String = "&(amp|#38|#x26);"

  /** The script/style subtree-strip patterns — public so the DuckDB
    * oracle generators embed the IDENTICAL pattern text (the r15 regex
    * fix must move both engines in lockstep, by construction). */
  val ScriptPattern: String = s"(?is)<script$TagAttrs.*?</script>"
  val StylePattern: String = s"(?is)<style$TagAttrs.*?</style>"

  /** The generic tag-strip pattern, QUOTE-AWARE: a literal `>` inside a
    * quoted attribute value (`<div data-x="a>b">`) must not terminate
    * the tag early — the naive `<[^>]+>` left `b">` as text debris. The
    * pattern walks plain chars and complete quoted strings until the
    * first `>` OUTSIDE quotes; an unterminated quote simply fails to
    * match (the malformed tag stays visible rather than eating the rest
    * of the document). Plain alternation + classes — identical in Java
    * regex and RE2. */
  val TagPattern: String =
    "<[^>\"']*(?:\"[^\"]*\"[^>\"']*|'[^']*'[^>\"']*)*>"

  /** Strip an HTML payload to its text: drop script/style subtrees (their
    * CONTENT is not text — a tag-only strip would leak JavaScript into
    * the corpus, the classic extraction bug), drop comments, strip the
    * remaining tags, decode the [[entityTable]] entities, collapse
    * whitespace. Tag matching is case-INsensitive (`(?is)` — HTML is;
    * legacy pages use `<SCRIPT>`) and attribute lists may follow any
    * whitespace, not just a space. Tag stripping is quote-aware
    * ([[TagPattern]]): a `>` inside a quoted attribute value does not
    * split the tag. Ampersand entities
    * decode LAST so escaped entities stay literal (`&amp;lt;` → `&lt;`
    * the text, never `<` the markup). */
  def htmlText(html: Column): Column = {
    val noScript = regexp_replace(html, ScriptPattern, " ")
    val noStyle = regexp_replace(noScript, StylePattern, " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, TagPattern, " ")
    val decoded = entityTable.foldLeft(noTags) { case (c, (e, v)) =>
      replace(c, lit(e), lit(v))
    }
    val ampDecoded = regexp_replace(decoded, AmpEntityPattern, "&")
    trim(regexp_replace(ampDecoded, "\\s+", " "))
  }

  /** The anchor-open/capture/close pattern [[anchorTexts]] and the
    * oracles share: attributes after any whitespace, bare `<a>` allowed,
    * `<a-widget>`-style custom tags excluded. */
  val AnchorPattern: String = s"(?is)<a$TagAttrs(.*?)</a>"

  /** The anchor texts of every `<a …>…</a>` in document order — the
    * numerator of [[linkDensityBp]] and the input of anchor-text corpora
    * (a common retrieval-training signal). Case-insensitive, attributes
    * may follow any whitespace (a link farm whose anchors break lines
    * must not score 0), and the attribute list is optional (`<a>`
    * anchors exist). */
  def anchorTexts(html: Column): Column =
    regexp_extract_all(html, lit(AnchorPattern), lit(1))

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

  /** Path+query of an (already canonical) URL — the string robots.txt
    * rules match against ("/" when the URL has no path; a query-only
    * URL like `https://a.com?q=1` reads `/?q=1`, so a `Disallow: /`
    * rule matches it the way every robots evaluator expects). */
  def urlPath(url: Column): Column = {
    val tail = regexp_replace(url, "^[a-z][a-z0-9+.-]*://[^/?#]*", "")
    when(tail === "", lit("/"))
      .when(tail.startsWith("?"), concat(lit("/"), tail))
      .otherwise(tail)
  }

  /** The five XML predefined entities plus their numeric/hex character
    * references (generated sitemaps commonly numeric-escape), decoded
    * with the same non-rescanning discipline as [[htmlText]]:
    * ampersand forms LAST in one left-to-right regex pass, so
    * `&amp;amp;` / `&#38;amp;` yield the literal `&amp;`. Sitemap
    * `<loc>` URLs arrive XML-escaped; feeding the raw text to
    * [[canonicalUrl]] would leave entity debris between query params. */
  def xmlUnescape(s: Column): Column = {
    val base = Seq(
      "&lt;" -> "<", "&#60;" -> "<", "&#x3c;" -> "<", "&#x3C;" -> "<",
      "&gt;" -> ">", "&#62;" -> ">", "&#x3e;" -> ">", "&#x3E;" -> ">",
      "&quot;" -> "\"", "&#34;" -> "\"", "&#x22;" -> "\"",
      "&apos;" -> "'", "&#39;" -> "'", "&#x27;" -> "'")
    regexp_replace(base.foldLeft(s) { case (c, (e, v)) =>
      replace(c, lit(e), lit(v))
    }, AmpEntityPattern, "&")
  }

  /** The crawl-DISCOVERY front door: extract a sitemap XML payload's
    * `<url>` entries as an array of `(loc, lastmod)` structs — pure
    * regex column math (the sitemap protocol's elements are flat and
    * order-fixed enough for the Java∩RE2 dialect; a `<sitemapindex>`
    * payload yields an empty array and its child sitemap locs come from
    * [[sitemapIndexLocs]]). Values are whitespace-trimmed but still
    * XML-escaped — route `loc` through [[xmlUnescape]] before
    * [[canonicalUrl]]. */
  def sitemapUrls(xml: Column): Column =
    transform(
      regexp_extract_all(xml, lit("(?s)<url>(.*?)</url>"), lit(1)),
      u => struct(
        regexp_extract(u, "(?s)<loc>\\s*(.*?)\\s*</loc>", 1).as("loc"),
        regexp_extract(u, "(?s)<lastmod>\\s*(.*?)\\s*</lastmod>", 1)
          .as("lastmod")))

  /** Child sitemap locations of a `<sitemapindex>` payload — the
    * recursion edge a crawler follows (fetch is external; this is the
    * parse). */
  def sitemapIndexLocs(xml: Column): Column =
    transform(
      regexp_extract_all(xml, lit("(?s)<sitemap>(.*?)</sitemap>"), lit(1)),
      s => regexp_extract(s, "(?s)<loc>\\s*(.*?)\\s*</loc>", 1))

  /** Parse per-host robots.txt bodies into the `(host, rule, prefix)`
    * relation [[robotsFilter]] consumes — the crawl-compliance front
    * door (a training-data pipeline that ignores robots.txt ships
    * content it was asked not to take). Follows RFC 9309 group
    * semantics: consecutive `User-agent` lines open a group whose
    * rules run until the next group; only groups naming `*` apply
    * (a per-product override group is deliberately IGNORED here — this
    * engine evaluates the generic crawler's view); comments (`#…`)
    * strip; keys are case-insensitive; empty-prefix rules (the
    * "Disallow:" allow-all idiom) drop. PREFIX rules only — RFC 9309
    * `*`/`$` wildcards are out of scope and such rules are dropped
    * (conservative for `$`, permissive for `*`; documented boundary).
    *
    * Scale shape: one `posexplode` over the (tiny — one row per host)
    * robots relation and one host-keyed window for the running group
    * id; output is rules-sized, meant to be broadcast. */
  def parseRobots(robots: org.apache.spark.sql.DataFrame,
      hostCol: String = "host",
      bodyCol: String = "body"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // split on \r?\n: real robots.txt is overwhelmingly CRLF, and a
    // trailing \r would make "*" never match and corrupt every prefix —
    // silently turning the compliance filter into allow-all
    val lines = robots
      .select(col(hostCol).as("host"),
        posexplode(split(col(bodyCol), "\r?\n")).as(Seq("pos", "raw")))
      .withColumn("line", trim(regexp_replace(col("raw"), "#.*", "")))
      .filter(col("line") =!= "")
      .withColumn("key",
        lower(trim(regexp_extract(col("line"), "^([^:]+):", 1))))
      .withColumn("value",
        trim(regexp_replace(col("line"), "^[^:]+:", "")))
      .filter(col("key").isin("user-agent", "allow", "disallow"))
    val w = Window.partitionBy(col("host")).orderBy(col("pos"))
    val grouped = lines
      .withColumn("is_ua", (col("key") === "user-agent").cast("int"))
      .withColumn("new_group",
        (col("is_ua") === 1 &&
          lag(col("is_ua"), 1, 0).over(w) === 0).cast("int"))
      .withColumn("group_id", sum(col("new_group")).over(w))
    val starGroups = grouped
      .filter(col("key") === "user-agent" && col("value") === "*")
      .select(col("host"), col("group_id")).distinct()
    grouped
      .join(starGroups, Seq("host", "group_id"), "left_semi")
      .filter(col("key") =!= "user-agent" && col("value") =!= "")
      .filter(!col("value").contains("*") && !col("value").contains("$"))
      .select(col("host"), col("key").as("rule"), col("value").as("prefix"))
  }

  /** Filter a URL relation by [[parseRobots]] rules — RFC 9309 §2.2
    * evaluation: among the rules whose prefix matches the URL path, the
    * LONGEST prefix wins; on a length tie `allow` wins; no matching
    * rule (or no robots.txt for the host) means allowed.
    *
    * Scale shape: rules collapse to ONE array row per host (tiny) and
    * broadcast-join the URL relation; the per-URL evaluation is a
    * higher-order `filter`/`transform`/`array_max` over that array —
    * MAP-ONLY over the crawl table, zero shuffle at 100 TB (struct
    * ordering gives longest-prefix-then-allow priority for free).
    * Returns the input plus `(allowed: boolean, matched_prefix)`. */
  def robotsFilter(urls: org.apache.spark.sql.DataFrame, urlCol: String,
      rules: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    // the URL relation is a crawl table with its own columns — a bare
    // `host` there is NORMAL, so the rules side joins under reserved
    // names and the added outputs are collision-checked loudly rather
    // than silently overwritten
    val reserved = Seq("_rb_host", "_rb_rules", "allowed", "matched_prefix")
    val clash = urls.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"robotsFilter reserves columns ${reserved.mkString(", ")}; " +
        s"input already has ${clash.mkString(", ")}")
    val byHost = rules.groupBy(col("host"))
      .agg(collect_list(struct(
        length(col("prefix")).as("plen"),
        (col("rule") === "allow").as("is_allow"),
        col("prefix").as("prefix"))).as("_rb_rules"))
      .select(col("host").as("_rb_host"), col("_rb_rules"))
    val joined = urls
      .join(broadcast(byHost), urlHost(col(urlCol)) === col("_rb_host"),
        "left")
    val path = urlPath(col(urlCol))
    val matched = filter(col("_rb_rules"),
      r => startswith(path, r.getField("prefix")))
    val best = array_max(transform(matched,
      r => struct(r.getField("plen").as("plen"),
        r.getField("is_allow").as("is_allow"),
        r.getField("prefix").as("prefix"))))
    joined
      .withColumn("allowed",
        coalesce(best.getField("is_allow"), lit(true)))
      .withColumn("matched_prefix",
        coalesce(best.getField("prefix"), lit("")))
      .drop("_rb_host", "_rb_rules")
  }

  /** Registrable-domain approximation: the last two dot-labels of the
    * host — the standard fallback when the public-suffix list is
    * unavailable (exact for .com/.org-style hosts). For the exact form
    * see [[registrableDomainPsl]]. */
  def registrableDomain(host: Column): Column =
    when(host.rlike("[^.]+\\.[^.]+$"),
      regexp_extract(host, "([^.]+\\.[^.]+)$", 1)).otherwise(host)

  /** EXACT registrable domain via a public-suffix-list broadcast join —
    * the scale-correct form of what a per-row PSL library lookup does,
    * with the real PSL rule semantics (r15 missing #2): `psl.suffix`
    * rows may be plain suffixes (`co.uk`), WILDCARD rules (`*.ck` — any
    * single extra label under `ck` is itself a public suffix), or
    * EXCEPTION rules (`!www.ck` — carved back out of a wildcard; the
    * public suffix is the rule minus its leading label). Per the PSL
    * algorithm, a matching exception rule prevails over everything;
    * otherwise the matching rule with the most labels wins, and the
    * registrable domain is the public suffix plus one label. A host
    * that IS a public suffix (`host = co.uk`) has NO registrable
    * domain — `domain` is NULL, never the host mislabeled as its own
    * domain.
    *
    * Returns the DISTINCT `(host, domain, source)` mapping (hosts repeat
    * heavily in a crawl — resolve each once, broadcast-join the mapping
    * back): explode each distinct host's dot-suffixes INCLUDING the host
    * itself (bounded fan-out — hosts have ≤ a handful of labels),
    * broadcast-join the parsed rule relation (exact base for
    * plain/exception rules, the suffix's PARENT for wildcards), reduce
    * per host (partial-aggregable max — the op's only shuffle, keyed on
    * the distinct host). Hosts matching no rule fall back to
    * [[registrableDomain]]'s two-label approximation (the PSL's own
    * convention for unknown TLDs) and carry `source = 'fallback'` so
    * downstream domain-level logic can weight the guess accordingly
    * (r15 task #8); PSL-resolved rows carry `source = 'psl'`. */
  def registrableDomainPsl(hosts: org.apache.spark.sql.DataFrame,
      hostCol: String,
      psl: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    // rule parse: kind + base (the suffix text the match keys on)
    val rules = psl.select(col("suffix").as("rule"))
      .withColumn("kind",
        when(col("rule").startsWith("!"), lit("exc"))
          .when(col("rule").startsWith("*."), lit("wild"))
          .otherwise(lit("plain")))
      .withColumn("base",
        when(col("kind") === "exc", expr("substring(rule, 2)"))
          .when(col("kind") === "wild", expr("substring(rule, 3)"))
          .otherwise(col("rule")))
    val h = hosts.select(col(hostCol).as("host")).distinct()
      .withColumn("labels", split(col("host"), "\\."))
      .withColumn("n", size(col("labels")))
    // candidate suffixes L(i+1..n) for i = 0..n-1 — the host ITSELF is a
    // candidate (i = 0): host==public-suffix must be detectable. parent
    // is the suffix minus its first label (what a wildcard's * consumes).
    val cand = h.select(col("host"), col("labels"), col("n"),
        explode(sequence(lit(0), col("n") - 1)).as("i"))
      .select(col("host"), col("labels"), col("n"),
        array_join(slice(col("labels"), col("i") + 1, col("n") - col("i")),
          ".").as("suffix"),
        array_join(slice(col("labels"), col("i") + 2,
          greatest(col("n") - col("i") - 1, lit(0))), ".").as("parent"),
        (col("n") - col("i")).as("slen"))
    // plain/exception rules match the candidate suffix exactly; a
    // wildcard rule *.base matches a candidate whose parent is base
    // (the candidate's own first label is the *). Exception rules'
    // public suffix drops the leading label: ps_len = slen - 1.
    val exact = cand
      .join(broadcast(rules.filter(col("kind") =!= "wild")
        .select(col("base"), col("kind"))), col("suffix") === col("base"))
      .select(col("host"), col("labels"), col("n"),
        when(col("kind") === "exc", col("slen") - 1).otherwise(col("slen"))
          .as("ps_len"),
        (col("kind") === "exc").as("is_exc"))
    val wild = cand.filter(col("slen") >= 2)
      .join(broadcast(rules.filter(col("kind") === "wild")
        .select(col("base"))), col("parent") === col("base"))
      .select(col("host"), col("labels"), col("n"),
        col("slen").as("ps_len"), lit(false).as("is_exc"))
    val matched = exact.unionByName(wild)
      .groupBy(col("host"), col("labels"), col("n"))
      .agg(max(when(col("is_exc"), col("ps_len"))).as("exc_ps"),
        max(when(!col("is_exc"), col("ps_len"))).as("norm_ps"))
      .withColumn("ps", coalesce(col("exc_ps"), col("norm_ps")))
      .select(col("host"),
        when(col("n") === col("ps"), lit(null).cast("string"))
          .otherwise(array_join(
            slice(col("labels"), col("n") - col("ps"), col("ps") + 1), "."))
          .as("domain"),
        lit("psl").as("source"))
    val unmatched = h
      .join(matched.select(col("host")), Seq("host"), "left_anti")
      .select(col("host"), registrableDomain(col("host")).as("domain"),
        lit("fallback").as("source"))
    matched.unionByName(unmatched)
  }
}
