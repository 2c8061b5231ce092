package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{ConditionCodec, SweepLine}

/** Metadata-parsing + date-axis operators that close the SURVEY §2 gaps:
  * F9 (date↔epoch) + W2-date (sweep-line on a date axis), F13
  * (Python-literal list parsing with scalar wrap), F15 (operator-token
  * scan over PRMP_STRING). Literal-input queries use identical VALUES rows
  * in the DuckDB oracle.
  *
  * Plus the web-corpus front door ([[graft.operators.Web]] /
  * [[graft.operators.Warc]]): HTML extraction, URL canonicalization, PSL
  * registrable domains, the gzipped-WARC container round trip, and the
  * composed crawl→corpus funnel (`tx_web_corpus`) — regexes restricted to
  * the Java∩RE2 dialect so every one is a full hash-matched oracle. */
object ParsingPack extends QueryPack {

  import graft.operators.Web

  /** Fixture markup pieces shared VERBATIM by the Spark queries and the
    * DuckDB oracles (interpolated through [[sqlLit]]): the anchor's
    * attribute separator is a NEWLINE — legal HTML the pre-r16 literal-
    * space pattern missed — and the tail carries numeric/hex/named
    * entity debris plus a double-escaped `&amp;#39;` that must decode to
    * the literal text `&#39;`. */
  private val FixAnchor = "<a\nhref=\"/l\">go there</a>"
  private val FixTail = "<div data-note=\"x>y\">&amp; one &lt;tail&gt;" +
    "&nbsp;mid &#39;q&#x27; &rsquo;s &amp;#39; end</div></body></html>"

  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  /** robots.txt fixture bodies, shared verbatim by both engines (real
    * newlines inside the SQL literal): a disallow/allow overlap where
    * the longest prefix must win plus a `$`-anchored rule (site0), the
    * "Disallow:" allow-all idiom + comments + a Crawl-delay and an
    * announced sitemap (site1), a multi-user-agent group where `*`
    * rides second plus an allow-beats-disallow length tie region AND a
    * `Disallow: &#47;*.gif` wildcard rule that really bites (site2,
    * RFC 9309 §2.2.3),
    * and a host whose only group names another product — the generic
    * crawler must treat it as allow-all while an `otherbot` crawl is
    * fully blocked (site3; its Crawl-delay is likewise visible only to
    * otherbot). site2 uses CRLF line endings — the overwhelmingly
    * common real-world robots.txt shape, which a \n-only split would
    * corrupt into allow-all (r16 review finding). site0 announces TWO
    * sitemaps; site3 announces none. */
  private val FixRobots: Seq[(String, String)] = Seq(
    ("site0.com", "User-agent: *\nDisallow: /private/\nAllow: /private/ok\n" +
      "Disallow: /exact$\n" +
      "\nUser-agent: evilbot\nDisallow: /\n" +
      "Sitemap: https://site0.com/sitemap.xml.gz\n" +
      "Sitemap: https://site0.com/sitemap-news.xml.gz"),
    ("site1.com", "# all welcome\nUser-agent: *\nDisallow:\n" +
      "Crawl-delay: 2\nSitemap: https://site1.com/sitemap.xml.gz"),
    ("site2.com", "User-agent: googlebot\r\nUser-agent: *\r\n" +
      "Disallow: /tmp/\r\nDisallow: /p\r\nAllow: /page/\r\n" +
      "Disallow: /*.gif\r\nCrawl-delay: 1.5\r\n" +
      "Sitemap: https://site2.com/sitemap.xml.gz"),
    ("site3.com", "User-agent: otherbot\nDisallow: /\nCrawl-delay: 9"))

  /** The [[FixRobots]] VALUES rows + the line/group CTE chain
    * (Web.parseRobots re-derived: line positions, comment strip, group
    * ids via lag + running sum over the GROUP directives — user-agent /
    * allow / disallow / crawl-delay; sitemap lines stay out of the
    * window, RFC 9309 §2.1) up to `selg`, the (host, group_id) set the
    * given agent must obey (§2.2.1: the agent's own token groups when
    * the host has any, else the `*` groups — for agent '*' the two
    * branches coincide, so ONE uniform SQL serves every agent). */
  private def robotsGroupCtes(agent: String): String =
    s"""robots(host, body) AS (VALUES
       |  ${FixRobots.map { case (h, b) =>
            s"(${sqlLit(h)}, ${sqlLit(b)})" }.mkString(",\n  ")}),
       |""".stripMargin +
    """lines0 AS (
      |  SELECT host, u.i AS pos,
      |    trim(regexp_replace(parts[CAST(u.i + 1 AS INTEGER)], '#.*', ''))
      |      AS line
      |  FROM (SELECT host, string_split_regex(body, '\r?\n') AS parts
      |        FROM robots),
      |    LATERAL unnest(range(0, len(parts))) u(i)),
      |kept AS (
      |  SELECT host, pos,
      |    lower(trim(regexp_extract(line, '^([^:]+):', 1))) AS key,
      |    trim(regexp_replace(line, '^[^:]+:', '')) AS value
      |  FROM lines0 WHERE line <> ''),
      |ua AS (
      |  SELECT *, CASE WHEN key = 'user-agent' THEN 1 ELSE 0 END AS is_ua
      |  FROM kept
      |  WHERE key IN ('user-agent', 'allow', 'disallow', 'crawl-delay')),
      |marked AS (
      |  SELECT *, CASE WHEN is_ua = 1 AND coalesce(lag(is_ua)
      |      OVER (PARTITION BY host ORDER BY pos), 0) = 0
      |    THEN 1 ELSE 0 END AS new_group
      |  FROM ua),
      |grp AS (
      |  SELECT *, sum(new_group) OVER (PARTITION BY host ORDER BY pos
      |    ROWS UNBOUNDED PRECEDING) AS group_id
      |  FROM marked),
      |""".stripMargin +
    s"""cand AS (SELECT host, group_id, length(value) AS l FROM grp
       |  WHERE key = 'user-agent' AND value <> '*'
       |    AND starts_with(${sqlLit(
            agent.toLowerCase(java.util.Locale.ROOT))}, lower(value))),
       |bestl AS (SELECT host, max(l) AS ml FROM cand GROUP BY host),
       |exactg AS (SELECT DISTINCT c.host, c.group_id
       |  FROM cand c JOIN bestl b ON c.host = b.host AND c.l = b.ml),
       |star AS (SELECT DISTINCT host, group_id FROM grp
       |         WHERE key = 'user-agent' AND value = '*'),
       |selg AS (SELECT * FROM exactg UNION
       |  SELECT * FROM star s
       |  WHERE s.host NOT IN (SELECT host FROM exactg))""".stripMargin

  /** [[robotsGroupCtes]] + the `rules(host, rule, prefix, regex)` CTE:
    * the selected groups' non-empty allow/disallow rules with their
    * RFC 9309 §2.2.3 regex translation (Web.robotsRuleRegex
    * re-derived: trailing `$` → end anchor, metachars escaped, `*` →
    * `.*`) — shared by the tx_robots_filter / tx_robots_agent /
    * tx_url_frontier / tx_frontier_discover oracles. */
  private def robotsRulesCtes(agent: String = "*"): String =
    robotsGroupCtes(agent) + ",\n" +
    """rules AS (
      |  SELECT host, key AS rule, value AS prefix,
      |    '^' || regexp_replace(regexp_replace(
      |      CASE WHEN value LIKE '%$' THEN substr(value, 1, length(value) - 1)
      |           ELSE value END,
      |      '([.\[\]{}()+?^$|\\])', '\\\1', 'g'),
      |      '\*', '.*', 'g') ||
      |      CASE WHEN value LIKE '%$' THEN '$' ELSE '' END AS regex
      |  FROM grp g JOIN selg USING (host, group_id)
      |  WHERE g.key IN ('allow', 'disallow') AND g.value <> '')""".stripMargin

  /** The tx_robots_filter / tx_robots_agent shared oracle body — the
    * same doc_id-derived URL fixture (6 path families: bare host,
    * /page/, /private/, /private/ok, a .gif family for the §2.2.3
    * wildcard rule, and /exact|/exactly for the `$` anchor) evaluated
    * under the given agent's rule view. */
  private def robotsFilterOracle(agent: String): String =
    (s"""WITH ${robotsRulesCtes(agent)},
       |""".stripMargin +
    """urls AS (
      |  SELECT doc_id,
      |    'https://site' || CAST(doc_id % 4 AS VARCHAR) || '.com' ||
      |    CASE CAST((doc_id // 4) % 6 AS INTEGER)
      |      WHEN 0 THEN ''
      |      WHEN 1 THEN '/page/' || CAST(doc_id AS VARCHAR)
      |      WHEN 2 THEN '/private/' || CAST(doc_id AS VARCHAR)
      |      WHEN 3 THEN '/private/ok' || CAST(doc_id AS VARCHAR)
      |      WHEN 4 THEN '/img/' || CAST(doc_id AS VARCHAR) || '.gif'
      |      ELSE '/exact' || CASE WHEN doc_id % 2 = 0 THEN '' ELSE 'ly' END
      |      END AS url
      |  FROM documents),
      |up AS (
      |  SELECT doc_id, url,
      |    regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/:?#]+)', 1)
      |      AS host,
      |    CASE WHEN tail = '' THEN '/'
      |      WHEN starts_with(tail, '?') THEN '/' || tail
      |      ELSE tail END AS path
      |  FROM (SELECT doc_id, url, regexp_replace(url,
      |          '^[a-z][a-z0-9+.-]*://[^/?#]*', '') AS tail
      |        FROM urls)),
      |m AS (
      |  SELECT u.doc_id, u.url, r.prefix, r.rule, length(r.prefix) AS plen
      |  FROM up u LEFT JOIN rules r
      |    ON u.host = r.host AND regexp_matches(u.path, r.regex)),
      |best AS (
      |  SELECT doc_id, url,
      |    max(CASE WHEN prefix IS NOT NULL THEN struct_pack(
      |      plen := plen, is_allow := (rule = 'allow'), prefix := prefix)
      |      END) AS b
      |  FROM m GROUP BY doc_id, url)
      |SELECT doc_id, url,
      |  coalesce(b.is_allow, true) AS allowed,
      |  coalesce(b.prefix, '') AS matched_prefix
      |FROM best ORDER BY doc_id""".stripMargin)

  /** The tx_url_frontier / stream_url_frontier shared oracle: the
    * frontier re-derived from documents directly (never sees XML or a
    * stream) — canonical URL + path by construction, the shared robots
    * rule CTEs, longest-prefix-then-allow, allowed-only keep-first. */
  private def frontierOracle: String =
    (s"""WITH ${robotsRulesCtes()},
       |""".stripMargin +
    """docs AS (
      |  SELECT doc_id, doc_id % 4 AS h,
      |    (CASE WHEN CAST((doc_id // 4) % 2 AS INTEGER) = 0
      |       THEN '/item/' ELSE '/private/' END)
      |      || CAST(doc_id % 100 AS VARCHAR) || '?ref=sm' AS pathq,
      |    '2026-0' || CAST(doc_id % 9 + 1 AS VARCHAR) || '-01' AS lastmod
      |  FROM documents),
      |canon AS (
      |  SELECT doc_id,
      |    'https://site' || CAST(h AS VARCHAR) || '.com' || pathq AS url,
      |    'site' || CAST(h AS VARCHAR) || '.com' AS host,
      |    pathq AS path, lastmod
      |  FROM docs),
      |m AS (
      |  SELECT c.doc_id, c.url, c.lastmod, r.prefix, r.rule,
      |    length(r.prefix) AS plen
      |  FROM canon c LEFT JOIN rules r
      |    ON c.host = r.host AND regexp_matches(c.path, r.regex)),
      |best AS (
      |  SELECT doc_id, url, lastmod,
      |    max(CASE WHEN prefix IS NOT NULL THEN struct_pack(
      |      plen := plen, is_allow := (rule = 'allow'), prefix := prefix)
      |      END) AS b
      |  FROM m GROUP BY doc_id, url, lastmod)
      |SELECT url, count(*) AS n_seen, min(lastmod) AS first_lastmod
      |FROM best WHERE coalesce(b.is_allow, true)
      |GROUP BY url ORDER BY url""".stripMargin)

  /** The [[Web.htmlText]] pipeline as a DuckDB scalar expression over
    * `inner` — GENERATED from the same pattern constants and entity
    * table the Spark column folds over, so the two engines cannot
    * drift (r15 verdict task 3: regex fixes move in lockstep by
    * construction). */
  private def htmlTextSql(inner: String): String = {
    val noScript =
      s"regexp_replace($inner, ${sqlLit(Web.ScriptPattern)}, ' ', 'g')"
    val noStyle =
      s"regexp_replace($noScript, ${sqlLit(Web.StylePattern)}, ' ', 'g')"
    val noComment = s"regexp_replace($noStyle, '(?s)<!--.*?-->', ' ', 'g')"
    val noTags =
      s"regexp_replace($noComment, ${sqlLit(Web.TagPattern)}, ' ', 'g')"
    val decoded = Web.entityTable.foldLeft(noTags) { case (acc, (e, v)) =>
      s"replace($acc, ${sqlLit(e)}, ${sqlLit(v)})"
    }
    val amp =
      s"regexp_replace($decoded, ${sqlLit(Web.AmpEntityPattern)}, '&', 'g')"
    raw"trim(regexp_replace($amp, '\s+', ' ', 'g'))"
  }

  /** All anchor texts of `inner` joined by `sep` (DuckDB's
    * array_to_string of an EMPTY list is NULL; zero-anchor docs must
    * read as ''). */
  private def anchorsJoinedSql(inner: String, sep: String): String =
    s"coalesce(array_to_string(regexp_extract_all($inner, " +
      s"${sqlLit(Web.AnchorPattern)}, 1), ${sqlLit(sep)}), '')"

  /** The tx_html_extract / tx_web_corpus markup fixture as a DuckDB
    * expression (same pieces as the Spark `lit`s). Concatenation `||`s
    * sit at line ENDS: this string is embedded into oracle strings whose
    * own `.stripMargin` would otherwise eat the first `|` of a
    * line-leading `||`. */
  private def fixtureHtmlSql(title: String): String =
    s"""'<html><head><title>$title' || CAST(doc_id AS VARCHAR) ||
       '</title><script type="text/javascript">var x = ' ||
       CAST(doc_id AS VARCHAR) ||
       ';</script><style>.c { color: red }</style></head>' ||
       '<body><!-- nav --><h1>Doc ' || CAST(doc_id AS VARCHAR) ||
       '</h1><p>' || text || '</p>' ||
       repeat(${sqlLit(FixAnchor)}, CAST(doc_id % 4 AS INTEGER)) ||
       ${sqlLit(FixTail)}"""

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // F9 + W2-date: interval consensus on a yyyyMMdd date axis — convert
    // through epoch seconds and back (/root/reference/camp_vec_rcmn.py:
    // 122-132, 204-209).
    "q23_sweepline_dates" -> ((s, dir) => {
      val conds = Tables.load(s, dir, "orders")
        .groupBy(col("o_orderpriority").as("name"), col("o_orderstatus"))
        .agg(date_format(min(col("o_orderdate")), "yyyyMMdd").as("lo_d"),
          date_format(max(col("o_orderdate")), "yyyyMMdd").as("hi_d"),
          count(lit(1)).as("w"))
        .select(col("name"), col("lo_d"), col("hi_d"), col("w"))
      SweepLine.consensusDates(conds).orderBy(col("name"), col("lo_d"))
    }),

    // F13: Python-literal list parse "['A','B']" / "[lo,hi]" with the
    // reference's scalar-or-list coercion (/root/reference/nl_targeting.py:46,
    // camp_vec_rcmn.py:107-112 — bare scalars wrap to 1-element lists).
    "q24_literal_lists" -> ((s, dir) => {
      val raw = s.createDataFrame(Seq(
        ("segs", "['BUILDING','MACHINERY']"),
        ("range", "[100, 250]"),
        ("single", "['SINGLE']"),
        ("scalar", "42"))).toDF("name", "raw")
      raw.select(col("name"),
          split(regexp_replace(col("raw"), "[\\[\\]' ]", ""), ",").as("parsed"))
        .select(col("name"),
          array_join(col("parsed"), "|").as("vals"),
          size(col("parsed")).as("n"))
        .orderBy(col("name"))
    }),

    // Reference-encoded condition-string codec: ' %^ '-separated fields
    // joined by ' !@#$ ' (/root/reference/camp_vec_rcmn.py:79,103-130),
    // decoded + operator/sentinel-widened into consensus-ready rows.
    "q26_condition_codec" -> ((s, dir) => {
      val raw = s.createDataFrame(Seq(
        ("C1", 85.5, "string %^ c_mktsegment %^ in %^ ['BUILDING','MACHINERY'] !@#$ integer %^ o_totalprice %^ between %^ [100000, 300000]"),
        ("C2", 62.25, "integer %^ o_totalprice %^ greater %^ 250000 !@#$ datePopup %^ o_orderdate %^ less %^ 19970101"),
        ("C3", 40.0, "datePopup %^ o_orderdate %^ between %^ ['19950101','19961231'] !@#$ string %^ o_orderpriority %^ in %^ ['1-URGENT']")
      )).toDF("camp_id", "score", "target_condi")
      ConditionCodec
        .conditionRows(ConditionCodec.decode(raw, "target_condi"), "score")
        .select(col("name"), col("kind"),
          coalesce(col("value"), lit("")).as("value"),
          coalesce(col("lo"), lit("")).as("lo"),
          coalesce(col("hi"), lit("")).as("hi"), col("w"))
        .orderBy(col("name"), col("kind"), col("value"), col("lo"), col("w"))
    }),

    // F15: operator-token scan — split PRMP_STRING on spaces, find the
    // first token in {=, BETWEEN, IN, ::op::}, column name = tokens before
    // it (/root/reference/nl_targeting_save.py:41,52-56).
    "q25_operator_scan" -> ((s, dir) => {
      val df = s.createDataFrame(Seq(
        ("seg_cond", "c_mktsegment = @v"),
        ("price_cond", "o_totalprice BETWEEN @lo @hi"),
        ("prio_cond", "o_orderpriority IN @list"),
        ("custom", "doc n_chars ::op:: kwd"))).toDF("name", "prmp")
      val toks = split(col("prmp"), " ")
      def posOf(op: String) =
        when(array_position(toks, op) === 0, lit(Long.MaxValue))
          .otherwise(array_position(toks, op))
      val j = least(posOf("="), posOf("BETWEEN"), posOf("IN"), posOf("::op::"))
      df.select(col("name"),
          concat_ws(" ", slice(toks, lit(1), (j - 1).cast("int"))).as("column_nm"),
          element_at(toks, j.cast("int")).as("op"))
        .orderBy(col("name"))
    }),

    // HTML main-text extraction (the crawl→corpus front door): wrap every
    // document in deterministic markup — script/style/comment subtrees,
    // a doc_id-varying anchor count, entity-encoded tail — then strip it
    // back to text with graft.operators.Web.htmlText and score link
    // density. The oracle runs the SAME regex pipeline in DuckDB (the
    // patterns are restricted to the Java∩RE2 dialect), so the md5 of the
    // extracted text gates every strip/decode/collapse step end to end.
    // Pure codegen column math; map-only.
    "tx_html_extract" -> ((s, dir) => {
      val html = concat(
        lit("<html><head><title>D"), col("doc_id").cast("string"),
        lit("</title><script type=\"text/javascript\">var x = "),
        col("doc_id").cast("string"),
        lit(";</script><style>.c { color: red }</style></head>"),
        lit("<body><!-- nav --><h1>Doc "), col("doc_id").cast("string"),
        lit("</h1><p>"), col("text"), lit("</p>"),
        element_at(array(lit(""), lit(FixAnchor), lit(FixAnchor * 2),
          lit(FixAnchor * 3)), pmod(col("doc_id"), lit(4)).cast("int") + 1),
        lit(FixTail))
      val clean = Web.htmlText(html)
      val anchors = Web.anchorTexts(html)
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          md5(encode(clean, "UTF-8")).as("text_md5"),
          length(clean).as("clean_len"),
          size(anchors).as("n_links"),
          length(array_join(anchors, "")).as("link_chars"),
          Web.linkDensityBp(html).as("link_density_bp"))
        .orderBy(col("doc_id"))
    }),

    // URL canonicalization (normalize-before-dedup): doc_id-derived URLs
    // with uppercase scheme/host, www, an explicit default port, utm_*
    // tracking params in leading AND trailing positions, and a fragment —
    // canonicalized to the group-by key URL-level dedup runs on, plus
    // host/registrable-domain extraction. Every step is a regex both
    // dialects execute identically; the oracle re-runs them in DuckDB.
    "tx_url_canonical" -> ((s, dir) => {
      import graft.operators.Web
      val raw = concat(
        lit("HTTPS://WWW.ShopSite"),
        pmod(col("doc_id"), lit(50)).cast("string"),
        lit(".COM:443/Item/"), col("doc_id").cast("string"),
        lit("?utm_source=feed&id="), pmod(col("doc_id"), lit(7)).cast("string"),
        lit("&utm_campaign=Spring&ref=Home#Sec"),
        pmod(col("doc_id"), lit(3)).cast("string"))
      val canon = Web.canonicalUrl(raw)
      val host = Web.urlHost(canon)
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), canon.as("canon_url"), host.as("host"),
          Web.registrableDomain(host).as("domain"))
        .orderBy(col("doc_id"))
    }),

    // EXACT registrable-domain resolution against a public-suffix list
    // with the REAL rule semantics (r15 missing #2): plain suffixes,
    // wildcard rules (*.ck), exception rules (!www.ck), and the
    // host==public-suffix → no-registrable-domain edge (bar.ck / co.uk /
    // uk resolve to an EMPTY domain, never themselves). Literal hosts +
    // literal PSL rows (q24-26 convention); the oracle re-derives the
    // whole rule-priority algorithm in DuckDB. The `source` column says
    // whether the row is a PSL resolution or the two-label fallback
    // guess (r15 task #8 — downstream domain dedup weights them
    // differently).
    "tx_url_domain_psl" -> ((s, dir) => {
      val hosts = s.createDataFrame(Seq(
        "a.b.example.co.uk", "www.example.com", "example.com.au",
        "localhost", "svc.internal.corp", "uk",
        "foo.bar.ck", "bar.ck", "www.ck", "co.uk").map(Tuple1(_)))
        .toDF("host")
      val psl = s.createDataFrame(Seq(
        "com", "org", "co.uk", "com.au", "uk", "*.ck", "!www.ck")
        .map(Tuple1(_))).toDF("suffix")
      Web.registrableDomainPsl(hosts, "host", psl)
        .select(col("host"), coalesce(col("domain"), lit("")).as("domain"),
          col("source"))
        .orderBy(col("host"))
    }),

    // WARC container round trip (the web-crawl ingest format): each
    // partition's documents are chunked into real WARC blobs (spec-shaped
    // version line / headers / Content-Length-driven bodies), gzipped
    // with the real JDK codec, then gunzipped and byte-parsed back into
    // records. Partition-local end to end — no grouping shuffle, the
    // distributed-writer sharding shape — and the oracle re-derives every
    // field from the TEXT, so the hash gates both codec directions.
    "tx_warc_roundtrip" -> ((s, dir) => {
      import graft.operators.Warc
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text"))
      val outSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("uri",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("body_md5",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("body_len",
          org.apache.spark.sql.types.IntegerType, nullable = false)))
      val rdd = docs.rdd.mapPartitions { rows =>
        rows.grouped(32).flatMap { batch =>
          val recs = batch.map(r => ("https://ex.com/doc/" + r.getLong(0),
            r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8)))
          val gz = Warc.gzip(Warc.writeRecords(recs))
          // ---- real parse: everything below reads the gzipped WARC
          Warc.parseRecords(Warc.gunzip(gz)).map { rec =>
            val md = java.security.MessageDigest.getInstance("MD5")
            org.apache.spark.sql.Row(rec.header("WARC-Target-URI").get,
              md.digest(rec.body).map("%02x".format(_)).mkString,
              rec.body.length)
          }
        }
      }
      s.createDataFrame(rdd, outSchema).orderBy(col("uri"))
    }),

    // The CHARSET boundary between WARC bytes and the string-typed HTML
    // pipeline (r17 missing #1): ten real crawl shapes — undeclared
    // UTF-8, header-declared latin-1, meta-prescan latin-1, a
    // MISLABELED charset=utf-8 header over latin-1 bytes (strict decode
    // must reject and fall back), UTF-8/UTF-16LE BOMs, an
    // UNDECLARED EUC-KR hangul page (r18 missing #2: no BOM, no
    // header, no meta — the content-heuristic detector must route it,
    // source="detected"), undeclared GB18030 and Big5 zh pages (r19
    // missing #1 — frequency-scored, since each usually
    // strict-decodes in the other zh charset too), and the
    // r19-ADVICE cp1252 curly-quote TRAP (its 0x92-pair bytes are
    // VALID Shift_JIS/GB18030 ideograph codes; the native-evidence +
    // density gates must keep the measurable latin-1 fallback) —
    // containered into real gzipped WARC records
    // and decoded back by the sniff chain. The oracle re-derives every
    // decoded string (and its md5) from doc_id arithmetic alone, so a
    // hash match proves the byte encode → container → sniff → decode
    // loop reproduced each page's TEXT exactly, non-ASCII included.
    // Partition-local end to end.
    "tx_warc_charset" -> ((s, dir) => {
      import graft.operators.Warc
      import java.nio.charset.StandardCharsets
      val docs = Tables.load(s, dir, "documents").select(col("doc_id"))
      val outSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("charset",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("source",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("n_chars",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("text_md5",
          org.apache.spark.sql.types.StringType, nullable = false)))
      val rdd = docs.rdd.mapPartitions { rows =>
        rows.grouped(32).flatMap { batch =>
          val recs = batch.map { r =>
            val id = r.getLong(0)
            val txt = s"Doc $id café ±"
            val latin1 = txt.getBytes(StandardCharsets.ISO_8859_1)
            val (ct, body) = (id % 10) match {
              case 0 => (Some("text/html"),
                txt.getBytes(StandardCharsets.UTF_8))
              case 1 => (Some("text/html; charset=ISO-8859-1"), latin1)
              case 2 => (None,
                ("<meta charset=\"iso-8859-1\">" + txt)
                  .getBytes(StandardCharsets.ISO_8859_1))
              case 3 => (Some("text/html; charset=utf-8"), latin1)
              case 4 => (None, Array[Byte](0xEF.toByte, 0xBB.toByte,
                0xBF.toByte) ++ txt.getBytes(StandardCharsets.UTF_8))
              case 5 => (None, Array[Byte](0xFF.toByte, 0xFE.toByte) ++
                txt.getBytes(StandardCharsets.UTF_16LE))
              case 6 => (None, s"문서 $id 한국어"
                .getBytes(java.nio.charset.Charset.forName("EUC-KR")))
              case 7 => (None, s"文档 $id 中文全文内容测试"
                .getBytes(java.nio.charset.Charset.forName("GB18030")))
              case 8 => (None, s"文件 $id 中文全文內容測試"
                .getBytes(java.nio.charset.Charset.forName("Big5")))
              case _ => (None,
                (s"Doc $id don’t won’t can’t stop the test page body" +
                  " with plain ascii filler text to keep density low")
                  .getBytes(java.nio.charset.Charset
                    .forName("windows-1252")))
            }
            ("https://ex.com/doc/" + id, ct, body)
          }
          val gz = Warc.gzip(Warc.writeRecordsTyped(recs))
          // ---- crawl side: everything below reads only the container
          Warc.parseRecords(Warc.gunzip(gz)).map { rec =>
            val uri = rec.header("WARC-Target-URI").get
            val id = uri.substring(uri.lastIndexOf('/') + 1).toLong
            val d = Warc.decodeText(rec.body, rec.header("Content-Type"))
            val md = java.security.MessageDigest.getInstance("MD5")
            org.apache.spark.sql.Row(id, d.charset, d.source,
              d.text.length,
              md.digest(d.text.getBytes(StandardCharsets.UTF_8))
                .map("%02x".format(_)).mkString)
          }
        }
      }
      s.createDataFrame(rdd, outSchema).orderBy(col("doc_id"))
    }),

    // robots.txt COMPLIANCE filtering (the crawl-politeness front door a
    // training-data pipeline legally needs): per-host robots bodies are
    // parsed under RFC 9309 group semantics (consecutive User-agent
    // lines open a group; only *-groups apply for the generic crawler;
    // comments strip; "Disallow:" empty = allow-all; `*`/`$` special
    // characters translate to anchored regexes per §2.2.3 — site2's
    // /*.gif and site0's /exact$ really bite), then a doc_id-derived
    // URL table is filtered by longest-rule-wins / allow-wins-ties.
    // Scale shape: rules collapse to ONE array row per host and
    // broadcast (size-routed past RobotsBroadcastMaxRules); the per-URL
    // verdict is a higher-order filter/array_max — MAP-ONLY over the
    // crawl table, zero shuffle. The oracle re-derives group parsing
    // (window lag + running sum), the regex translation, and the RFC
    // priority in DuckDB.
    "tx_robots_filter" -> ((s, dir) => {
      val robots = s.createDataFrame(FixRobots).toDF("host", "body")
      val path = element_at(array(lit(""),
        concat(lit("/page/"), col("doc_id").cast("string")),
        concat(lit("/private/"), col("doc_id").cast("string")),
        concat(lit("/private/ok"), col("doc_id").cast("string")),
        concat(lit("/img/"), col("doc_id").cast("string"), lit(".gif")),
        concat(lit("/exact"),
          when(pmod(col("doc_id"), lit(2)) === 0, lit(""))
            .otherwise(lit("ly")))),
        pmod(floor(col("doc_id") / lit(4)).cast("long"), lit(6)).cast("int")
          + 1)
      val urls = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          concat(lit("https://site"),
            pmod(col("doc_id"), lit(4)).cast("string"),
            lit(".com"), path).as("url"))
      Web.robotsFilter(urls, "url", Web.parseRobots(robots))
        .select(col("doc_id"), col("url"), col("allowed"),
          col("matched_prefix"))
        .orderBy(col("doc_id"))
    }),

    // Per-agent robots evaluation (RFC 9309 §2.2.1): the SAME URL
    // relation filtered as crawler "otherbot" — site3's
    // otherbot-only group (allow-all to the generic crawler) flips the
    // whole host to disallow, while hosts without an otherbot group
    // fall back to their *-groups (identical verdicts to
    // tx_robots_filter there). Case-insensitive token match; oracle
    // re-derives the group selection (exact-token groups shadow the
    // *-groups per host).
    "tx_robots_agent" -> ((s, dir) => {
      val robots = s.createDataFrame(FixRobots).toDF("host", "body")
      val path = element_at(array(lit(""),
        concat(lit("/page/"), col("doc_id").cast("string")),
        concat(lit("/private/"), col("doc_id").cast("string")),
        concat(lit("/private/ok"), col("doc_id").cast("string")),
        concat(lit("/img/"), col("doc_id").cast("string"), lit(".gif")),
        concat(lit("/exact"),
          when(pmod(col("doc_id"), lit(2)) === 0, lit(""))
            .otherwise(lit("ly")))),
        pmod(floor(col("doc_id") / lit(4)).cast("long"), lit(6)).cast("int")
          + 1)
      val urls = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          concat(lit("https://site"),
            pmod(col("doc_id"), lit(4)).cast("string"),
            lit(".com"), path).as("url"))
      Web.robotsFilter(urls, "url",
          Web.parseRobots(robots, agent = "OtherBot"))
        .select(col("doc_id"), col("url"), col("allowed"),
          col("matched_prefix"))
        .orderBy(col("doc_id"))
    }),

    // robots.txt METADATA (the crawl-scheduler directives beyond
    // allow/disallow): group-scoped Crawl-delay (agent selection
    // applies — site3's delay lives in an otherbot group and is
    // invisible to the generic crawler; non-numeric values read null →
    // -1 sentinel) and host-global Sitemap announcements (deduped,
    // sorted, joined) — the discovery seed tx_frontier_discover
    // consumes. Oracle re-derives both from the same VALUES bodies.
    "tx_robots_meta" -> ((s, dir) => {
      val robots = s.createDataFrame(FixRobots).toDF("host", "body")
      Web.robotsMeta(robots)
        .select(col("host"),
          coalesce(col("crawl_delay"), lit(-1.0)).as("crawl_delay"),
          coalesce(array_join(col("sitemaps"), "|"), lit(""))
            .as("sitemaps"))
        .orderBy(col("host"))
    }),

    // URL-FRONTIER discovery funnel composed end to end: per-host
    // sitemap XMLs are BUILT (ordered group-concat of <url> entries —
    // XML-escaped &amp; in the query string, whitespace-padded <loc>
    // values), then parsed back (Web.sitemapUrls), XML-unescaped,
    // canonicalized, robots-filtered (the FixRobots hosts — site0's
    // /private/ and site2's /p rules really bite), and collapsed
    // keep-first by canonical URL (re-discoveries of one page differ in
    // doc_id-varying utm params; first_lastmod = earliest sighting).
    // The oracle re-derives the final rows from documents directly
    // (from-text twin — it never sees XML), so a parse/unescape/
    // canonicalize/robots bug anywhere breaks the hash. Scale shape:
    // sitemap build is one host-keyed group over tiny per-host entry
    // sets; parse/unescape/canonicalize are map-only; robots is the
    // broadcast array filter; one final keep-first group.
    "tx_url_frontier" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val h = pmod(col("doc_id"), lit(4))
      val pathDir = element_at(array(lit("/item/"), lit("/private/")),
        pmod(floor(col("doc_id") / lit(4)).cast("long"), lit(2)).cast("int")
          + 1)
      val entry = concat(
        lit("<url><loc> HTTPS://WWW.Site"), h.cast("string"),
        lit(".COM:443"), pathDir,
        pmod(col("doc_id"), lit(100)).cast("string"),
        lit("?utm_source=map"), col("doc_id").cast("string"),
        lit("&amp;ref=sm#f </loc><lastmod>2026-0"),
        (pmod(col("doc_id"), lit(9)) + 1).cast("string"),
        lit("-01</lastmod></url>"))
      val sitemaps = docs
        .select(h.as("h"), col("doc_id"), entry.as("e"))
        .groupBy(col("h"))
        .agg(concat_ws("", transform(
          array_sort(collect_list(struct(col("doc_id"), col("e")))),
          x => x.getField("e"))).as("body"))
        .select(concat(lit("<?xml version=\"1.0\"?><urlset>"),
          col("body"), lit("</urlset>")).as("xml"))
      val parsed = sitemaps
        .select(explode(Web.sitemapUrls(col("xml"))).as("u"))
        .select(
          Web.canonicalUrl(Web.xmlUnescape(col("u.loc"))).as("url"),
          col("u.lastmod").as("lastmod"))
      val robots = s.createDataFrame(FixRobots).toDF("host", "body")
      Web.robotsFilter(parsed, "url", Web.parseRobots(robots))
        .filter(col("allowed"))
        .groupBy(col("url"))
        .agg(count(lit(1)).as("n_seen"),
          min(col("lastmod")).as("first_lastmod"))
        .orderBy(col("url"))
    }),

    // ROBOTS-DRIVEN frontier discovery, the gz/typed edition (r16
    // verdict tasks #5/#8 composed): sitemaps are not handed to the
    // crawler — robotsMeta's per-host Sitemap announcements decide
    // which payloads are fetched at all (site3 announces none, so its
    // URLs never enter this frontier; site0 announces TWO, and both
    // serve the host's urlset, so its discoveries double). Payloads
    // travel as REAL gzip bytes (Warc.gzip on the serve side,
    // Warc.gunzip ahead of the parse — the .xml.gz convention), and
    // lastmod carries MIXED W3C datetime precisions/offsets whose min
    // is taken over w3cEpoch values: the +09:00 form is
    // chronologically earliest in its group while a raw string-min
    // would pick the date-only form (the r16 "min over strings is not
    // chronological" gap, now load-bearing in the oracle hash). The
    // oracle re-derives announcements, rule regexes, and epochs from
    // the VALUES bodies + documents — it never sees XML or gzip.
    "tx_frontier_discover" -> ((s, dir) => {
      import org.apache.spark.sql.types._
      val docs = Tables.load(s, dir, "documents")
      val h = pmod(col("doc_id"), lit(4))
      val pathDir = element_at(array(lit("/item/"), lit("/private/")),
        pmod(floor(col("doc_id") / lit(4)).cast("long"), lit(2)).cast("int")
          + 1)
      // form index doc_id%3 varies WITHIN a canonical-URL group
      // (members differ by 400; 400 % 3 = 1) while the month
      // (doc_id%100%9+1) is group-constant — so the typed min really
      // diverges from a string min inside real groups
      val month =
        (pmod(pmod(col("doc_id"), lit(100)), lit(9)) + 1).cast("string")
      val lastmod = concat(lit("2026-0"), month, lit("-01"),
        element_at(array(lit(""), lit("T00:15:00+09:00"),
          lit("T06:30:00.500Z")), pmod(col("doc_id"), lit(3)).cast("int")
          + 1))
      val entry = concat(
        lit("<url><loc> HTTPS://WWW.Site"), h.cast("string"),
        lit(".COM:443"), pathDir,
        pmod(col("doc_id"), lit(100)).cast("string"),
        lit("?utm_source=map"), col("doc_id").cast("string"),
        lit("&amp;ref=sm#f </loc><lastmod>"), lastmod,
        lit("</lastmod></url>"))
      val sitemaps = docs
        .select(h.as("h"), col("doc_id"), entry.as("e"))
        .groupBy(col("h"))
        .agg(concat_ws("", transform(
          array_sort(collect_list(struct(col("doc_id"), col("e")))),
          x => x.getField("e"))).as("body"))
        .select(col("h"),
          concat(lit("<?xml version=\"1.0\"?><urlset>"), col("body"),
            lit("</urlset>")).as("xml"))
      val robots = s.createDataFrame(FixRobots).toDF("host", "body")
      val announced = Web.robotsMeta(robots)
        .select(regexp_extract(col("host"), "^site([0-9])\\.com$", 1)
          .cast("long").as("h"), explode(col("sitemaps")).as("sm_url"))
      val fetched = announced.join(sitemaps, Seq("h"))
      // the gz hop: the serve side gzips; everything BELOW this map
      // reads only the gzip payload
      val gzSchema = StructType(Seq(
        StructField("xml", StringType, nullable = true)))
      val rdd = fetched.select(col("xml")).rdd.mapPartitions { it =>
        import graft.operators.Warc
        it.map { r =>
          val gz = Warc.gzip(r.getString(0)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          org.apache.spark.sql.Row(new String(Warc.gunzip(gz),
            java.nio.charset.StandardCharsets.UTF_8))
        }
      }
      val xmls = s.createDataFrame(rdd, gzSchema)
      val parsed = xmls
        .select(explode(Web.sitemapUrls(col("xml"))).as("u"))
        .select(Web.canonicalUrl(Web.xmlUnescape(col("u.loc"))).as("url"),
          col("u.lastmod").as("lastmod"))
      Web.robotsFilter(parsed, "url", Web.parseRobots(robots))
        .filter(col("allowed"))
        .groupBy(col("url"))
        .agg(count(lit(1)).as("n_seen"),
          min(Web.w3cEpoch(col("lastmod"))).as("first_epoch"))
        .orderBy(col("url"))
    }),

    // LINK-GRAPH EXTRACTION (the edge-list primitive between a crawl
    // and every graph signal — PageRank, anchor-text corpora, hub
    // detection): each doc's HTML carries anchors in every real href
    // shape — absolute with an XML-escaped query, protocol-relative,
    // rooted (BARE-quoted attribute), dot-relative, query-only, plus
    // an href-less <a name> that must drop — extracted by anchorLinks,
    // RFC 3986-resolved against the page's EFFECTIVE base (every 5th
    // doc carries a <base href> that redirects its relative/rooted/
    // query-only hrefs to a different origin — r17 missing #2), with
    // rel=nofollow edges DROPPED before the edge list (whole-token: a
    // rel="ugc nofollower" anchor survives — r17 verdict task #4),
    // canonicalized into (src doc, dst url, anchor text) edges. The
    // oracle re-derives every resolved target arithmetically (it never
    // runs a resolver), so the hash gates extraction + base handling +
    // nofollow compliance + resolution + canonicalization together;
    // the resolution ALGORITHM itself is property-tested against a
    // direct RFC reference. Map-only over the crawl table.
    "tx_link_edges" -> ((s, dir) => {
      val h = pmod(col("doc_id"), lit(4)).cast("string")
      val a = pmod(col("doc_id"), lit(3)).cast("string")
      val b = pmod(col("doc_id"), lit(2)).cast("string")
      val p = pmod(col("doc_id"), lit(50)).cast("string")
      val page = concat(lit("https://site"), h, lit(".com/sec"), a,
        lit("/sub"), b, lit("/page"), p)
      val baseTag = when(pmod(col("doc_id"), lit(5)) === 0,
        concat(lit("<base href=\"https://bse"), a, lit(".com/bd"), b,
          lit("/sub/\">"))).otherwise(lit(""))
      // page-level nofollow (meta robots): every 11th doc (±7)
      // contributes NO edges at all — the in-page half of link-graph
      // compliance, alongside the per-edge rel=nofollow below
      val metaNf = when(pmod(col("doc_id"), lit(11)) === 7,
        lit("<meta name=\"robots\" content=\"nofollow\">"))
        .otherwise(lit(""))
      val html = concat(
        lit("<html><head>"), baseTag, metaNf,
        lit("</head><body><a href=\"https://ext"),
        pmod(col("doc_id"), lit(7)).cast("string"),
        lit(".com/x?a=1&amp;b=2\">ext &amp; link</a>"),
        lit("<a\nhref='//cdn.site"), h, lit(".com/lib'>cdn lib</a>"),
        lit("<a href=/top/item"), p, lit(">rooted</a>"),
        lit("<a href=\"../up"), p, lit("\">up &#38; away</a>"),
        lit("<a href=\"?page=2\">next page</a>"),
        lit("<a rel=\"nofollow\" href=\"/nf/"), p,
        lit("\">untrusted</a>"),
        lit("<a rel='ugc nofollower' href=\"/keep"), p,
        lit("\">kept &amp; safe</a>"),
        lit("<a name=\"x\">dead</a></body></html>"))
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), page.as("page"), html.as("html"))
        .filter(!Web.metaRobots(col("html")).getField("nofollow"))
        .select(col("doc_id"),
          Web.pageBase(col("page"), col("html")).as("eb"),
          explode(Web.anchorLinks(col("html"))).as("l"))
        .filter(col("l.href") =!= "" && !col("l.nofollow"))
        .select(col("doc_id"),
          Web.canonicalUrl(Web.resolveUrl(col("eb"), col("l.href")))
            .as("dst"),
          col("l.text").as("anchor"))
        .orderBy(col("doc_id"), col("dst"))
    }),

    // ANCHOR-TEXT CORPUS (the per-TARGET half of the link-graph
    // signal: how the web describes each page — the classic
    // retrieval-training label source): the tx_link_edges pipeline
    // (base href + page/edge nofollow compliance + RFC resolution +
    // canonicalization) aggregated by destination via Web.anchorCorpus
    // — exact in-link / referring-doc / distinct-anchor counts, and
    // the anchor list BOUNDED to the 8 most frequent texts (freq DESC,
    // text ASC — r18 verdict #2: an unbounded collect_set per
    // power-law dst is a hot-key state bomb at 100 TB; the cdn
    // anchors vary mod 13 here so the cap provably bites). Two hash
    // aggs — (dst, anchor) counts, then a bounded-heap top-k whose
    // per-dst state is O(k) — replace the one collect_set shuffle.
    "tx_anchor_corpus" -> ((s, dir) => {
      val h = pmod(col("doc_id"), lit(4)).cast("string")
      val a = pmod(col("doc_id"), lit(3)).cast("string")
      val b = pmod(col("doc_id"), lit(2)).cast("string")
      val p = pmod(col("doc_id"), lit(50)).cast("string")
      val page = concat(lit("https://site"), h, lit(".com/sec"), a,
        lit("/sub"), b, lit("/page"), p)
      val baseTag = when(pmod(col("doc_id"), lit(5)) === 0,
        concat(lit("<base href=\"https://bse"), a, lit(".com/bd"), b,
          lit("/sub/\">"))).otherwise(lit(""))
      val metaNf = when(pmod(col("doc_id"), lit(11)) === 7,
        lit("<meta name=\"robots\" content=\"nofollow\">"))
        .otherwise(lit(""))
      val html = concat(
        lit("<html><head>"), baseTag, metaNf,
        lit("</head><body><a href=\"https://ext"),
        pmod(col("doc_id"), lit(7)).cast("string"),
        lit(".com/x?a=1&amp;b=2\">ext &amp; link</a>"),
        lit("<a\nhref='//cdn.site"), h, lit(".com/lib'>cdn lib "),
        pmod(col("doc_id"), lit(13)).cast("string"), lit("</a>"),
        lit("<a href=/top/item"), p, lit(">rooted</a>"),
        lit("<a href=\"../up"), p, lit("\">up &#38; away</a>"),
        lit("<a href=\"?page=2\">next page</a>"),
        lit("<a rel=\"nofollow\" href=\"/nf/"), p,
        lit("\">untrusted</a>"),
        lit("<a rel='ugc nofollower' href=\"/keep"), p,
        lit("\">kept &amp; safe</a>"),
        lit("<a name=\"x\">dead</a></body></html>"))
      val edges = Tables.load(s, dir, "documents")
        .select(col("doc_id"), page.as("page"), html.as("html"))
        .filter(!Web.metaRobots(col("html")).getField("nofollow"))
        .select(col("doc_id"),
          Web.pageBase(col("page"), col("html")).as("eb"),
          explode(Web.anchorLinks(col("html"))).as("l"))
        .filter(col("l.href") =!= "" && !col("l.nofollow"))
        .select(col("doc_id"),
          Web.canonicalUrl(Web.resolveUrl(col("eb"), col("l.href")))
            .as("dst"),
          col("l.text").as("anchor"))
      Web.anchorCorpus(edges, topAnchors = 8).orderBy(col("dst"))
    }),

    // POLITENESS SCHEDULING (the step after discovery → compliance →
    // dedup: an executable crawl plan): the robots-filtered keep-first
    // frontier gets per-host fetch slots honoring each host's
    // Crawl-delay from robotsMeta — more-referenced pages first
    // (n_seen DESC, url ASC), slot offsets in integer deci-seconds
    // (rank × round(delay·10)) so both engines agree bit-for-bit.
    // site1 spaces at 2.0s, site2 at 1.5s, site0/site3 take the 1.0s
    // default (site3's delay hides in an otherbot group — invisible
    // to the generic crawler). Scale shape: broadcast delay join +
    // ONE window partitioned by host (per-host slots are inherently
    // serial — politeness — so that is the minimal shuffle).
    "tx_frontier_schedule" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val h = pmod(col("doc_id"), lit(4))
      val pathDir = element_at(array(lit("/item/"), lit("/private/")),
        pmod(floor(col("doc_id") / lit(4)).cast("long"), lit(2)).cast("int")
          + 1)
      val raw = docs.select(
        concat(lit("HTTPS://WWW.Site"), h.cast("string"),
          lit(".COM:443"), pathDir,
          pmod(col("doc_id"), lit(100)).cast("string"),
          lit("?utm_source=map"), col("doc_id").cast("string"),
          lit("&ref=sm#f")).as("loc"))
      val robots = s.createDataFrame(FixRobots).toDF("host", "body")
      val frontier = Web.robotsFilter(
          raw.select(Web.canonicalUrl(col("loc")).as("url")), "url",
          Web.parseRobots(robots))
        .filter(col("allowed"))
        .groupBy(col("url")).agg(count(lit(1)).as("n_seen"))
      Web.scheduleFrontier(frontier, "url", Web.robotsMeta(robots))
        .select(col("url"), col("host"), col("n_seen"), col("rank"),
          col("fetch_offset_ds"))
        .orderBy(col("url"))
    }),

    // RECRAWL-AWARE SCHEDULING (r17 verdict task #8: rank by n_seen
    // alone ignores the lastmod freshness the frontier already
    // tracks): the same robots-gated keep-first frontier, but each
    // URL carries its typed first_epoch (w3cEpoch of a month-varying
    // lastmod) and the slot order is recrawlPriority = n_seen·30 +
    // epoch-days — the pinned 30-days-per-sighting weight, integer
    // end to end. On this fixture the weight really BITES: months
    // span ~240 days while n_seen spans 1–2, so fresher once-seen
    // URLs outrank staler twice-seen ones host by host (spec-pinned).
    // Same two-pass bucketed rank as tx_frontier_schedule.
    "tx_frontier_recrawl" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val h = pmod(col("doc_id"), lit(4))
      val pathDir = element_at(array(lit("/item/"), lit("/private/")),
        pmod(floor(col("doc_id") / lit(4)).cast("long"), lit(2)).cast("int")
          + 1)
      val raw = docs.select(
        concat(lit("HTTPS://WWW.Site"), h.cast("string"),
          lit(".COM:443"), pathDir,
          pmod(col("doc_id"), lit(100)).cast("string"),
          lit("?utm_source=map"), col("doc_id").cast("string"),
          lit("&ref=sm#f")).as("loc"),
        concat(lit("2026-0"),
          (pmod(pmod(col("doc_id"), lit(100)), lit(9)) + 1).cast("string"),
          lit("-01")).as("lastmod"))
      val robots = s.createDataFrame(FixRobots).toDF("host", "body")
      val frontier = Web.robotsFilter(
          raw.select(Web.canonicalUrl(col("loc")).as("url"),
            col("lastmod")), "url", Web.parseRobots(robots))
        .filter(col("allowed"))
        .groupBy(col("url"))
        .agg(count(lit(1)).as("n_seen"),
          min(Web.w3cEpoch(col("lastmod"))).as("first_epoch"))
        .withColumn("priority",
          Web.recrawlPriority(col("n_seen"), col("first_epoch")))
      Web.scheduleFrontier(frontier, "url", Web.robotsMeta(robots),
          priorityCol = "priority")
        .select(col("url"), col("host"), col("n_seen"),
          col("first_epoch"), col("priority"), col("rank"),
          col("fetch_offset_ds"))
        .orderBy(col("url"))
    }),

    // REDIRECT-CHAIN RESOLUTION (the crawl-graph step between 3xx
    // responses and everything keyed on final URLs): each doc
    // contributes one redirect edge; families of 4 form p0→p1→p2→p3→
    // final chains, and every 10th family is a 4-CYCLE that must come
    // back status=unresolved (null hops) instead of spinning. Resolved
    // by resolveRedirects' path doubling — ceil(log2 64) = 6
    // self-joins, hop counts exact. The oracle re-derives every final
    // target and hop count arithmetically (no recursion in SQL).
    "tx_redirect_resolve" -> ((s, dir) => {
      val f = floor(col("doc_id") / lit(4)).cast("long")
      val p = pmod(col("doc_id"), lit(4))
      val cyc = pmod(f, lit(10)) === 7
      val fS = f.cast("string")
      def node(pos: org.apache.spark.sql.Column) =
        concat(lit("https://r.com/f"), fS, lit("/p"), pos.cast("string"))
      val edges = Tables.load(s, dir, "documents").select(
        node(p).as("src"),
        when(cyc, node(pmod(p + 1, lit(4))))
          .when(p < 3, node(p + 1))
          .otherwise(concat(lit("https://final.com/f"), fS)).as("dst"))
      Web.resolveRedirects(edges).orderBy(col("src"))
    }),

    // CANONICAL CONSOLIDATION (one level above URL normalization),
    // now TRANSITIVE (r18 missing #3): every article exists as a main
    // page, an m.-host mobile variant, and an amp variant with a
    // DIFFERENT path. The declarations form a 2-hop CHAIN — amp
    // declares its canonical RELATIVE against a <base href> pointing
    // at the m-dot host (resolving to the MOBILE url), mobile
    // declares absolute to main, main declares none but carries a
    // rel="stylesheet" decoy (whole-token rel) — so a single-hop
    // resolver strands amp on the mobile URL; resolveCanonicals'
    // path doubling collapses all three onto main. Every 10th group
    // is a canonical CYCLE (mobile ↔ amp): cycle members keep their
    // OWN urls (a corpus must not lose pages to author error) while
    // main stays separate. Keep-first, count. Scale shape: log-many
    // declaration-sized hash joins + one final hash group.
    "tx_canonical_collapse" -> ((s, dir) => {
      val g = pmod(col("doc_id"), lit(40))
      val gS = g.cast("string")
      val h = pmod(g, lit(4)).cast("string")
      val v = pmod(col("doc_id"), lit(3))
      val cyc = pmod(g, lit(10)) === 9
      val mainUrl = concat(lit("https://site"), h, lit(".com/art/"), gS)
      val mobileUrl = concat(lit("https://m.site"), h, lit(".com/art/"),
        gS, lit("m"))
      val ampUrl = concat(lit("https://amp.site"), h, lit(".com/amp/"), gS)
      val url = when(v === 0,
          concat(mainUrl, lit("?utm_source=x"), col("doc_id").cast("string")))
        .when(v === 1, mobileUrl)
        .otherwise(ampUrl)
      val html = when(v === 0, concat(
          lit("<html><head><link rel=\"stylesheet\" href=\"/css/m.css\">" +
            "</head><body>main "), gS, lit("</body></html>")))
        .when(v === 1, concat(
          lit("<html><head><link rel='canonical' href=\""),
          when(cyc, ampUrl).otherwise(mainUrl),
          lit("\"></head><body>mobile</body></html>")))
        .otherwise(concat(
          lit("<html><head><base href=\"https://m.site"), h,
          lit(".com/art/\"><link rel=\"canonical nofollow\" href="), gS,
          lit("m></head><body>amp</body></html>")))
      // materialize the CONSTRUCTED strings first, then parse: the
      // resolver expressions reference each argument many times, and
      // over the 30-node fixture construction trees that multiplied
      // into a megabyte-scale codegen unit (the r19 lesson — minutes
      // of Janino work on a 500-row fixture); over plain column refs
      // the tree stays operator-sized. Then ONE evaluation of the
      // parse tree — the closure machinery and the final join read
      // the checkpointed relation, never the tree.
      val fixture = Tables.load(s, dir, "documents")
        .select(col("doc_id"), url.as("u0"), html.as("h0"))
        .localCheckpoint(true)
      // staged effectiveCanonical (r20): the inlined column form's
      // duplicated resolver subtrees cost seconds of per-job driver
      // analysis — see Web.withEffectiveCanonical
      val pages = Web.withEffectiveCanonical(fixture, "u0", "h0", "decl")
        .select(col("doc_id"),
          Web.canonicalUrl(col("u0")).as("url"), col("decl"))
        .localCheckpoint(true)
      val cmap = Web.resolveCanonicals(
        pages.select(col("url"), col("decl")).distinct(),
        "url", "decl")
      pages.join(cmap, Seq("url"))
        .groupBy(col("canon_url"))
        .agg(min(col("doc_id")).as("first_doc"),
          count(lit(1)).as("n_pages"))
        .orderBy(col("canon_url"))
    }),

    // GRAPH CONSOLIDATION (r18 missing #1: redirects/canonicals
    // composed into the link graph): every article family has a main
    // page M plus FIVE duplicate identities — a 1-hop redirect R1→M,
    // a 2-hop redirect R2→R1→M, an m-dot page D with rel=canonical→M,
    // an amp page A whose canonical chains A→D→M, and (r19 missing
    // #2) a SOFT-redirect page F whose HTML carries
    // <meta http-equiv="refresh" content="0; url=R1"> — parsed by
    // metaRefreshRedirects, never handed over as an edge — so F's
    // link mass travels refresh → 301 chain → M. The link identity w
    // varies INDEPENDENTLY of the family k (r19 ADVICE #4: w =
    // doc_id % 5 was determined by k = doc_id % 25, so each family
    // carried ONE identity and the cycle-drop paths went untested):
    // w = (doc_id / 25) % 6, so every family mixes all six
    // identities. Every 10th family's redirects form a CYCLE: links
    // into R1/R2 there reach no page and DROP (a crawler never
    // lands) — and F's refresh edge POINTS INTO the cycle, so its
    // links drop too — while the M/D/A links still consolidate.
    // Aggregated with the bounded anchorCorpus. Scale shape: the
    // edge list hash-joins two page-metadata-sized closure maps (ONE
    // shared tagged doubling loop), then the two-stage bounded
    // anchor aggregation — no broadcast of host-scale relations
    // anywhere.
    "tx_graph_consolidate" -> ((s, dir) => {
      def variants(kCol: org.apache.spark.sql.Column) = {
        val kS = kCol.cast("string")
        val hk = pmod(kCol, lit(4)).cast("string")
        (concat(lit("https://site"), hk, lit(".com/art/"), kS),
          concat(lit("https://old"), hk, lit(".com/r/"), kS),
          concat(lit("https://older.com/rr/"), kS),
          concat(lit("https://m.site"), hk, lit(".com/art/"), kS,
            lit("m")),
          concat(lit("https://amp.site"), hk, lit(".com/amp/"), kS),
          concat(lit("https://go"), hk, lit(".com/f/"), kS))
      }
      val docs = Tables.load(s, dir, "documents")
      val fam = docs.select(pmod(col("doc_id"), lit(25)).as("k"))
        .distinct()
      val (fm, fr1, fr2, fd, fa, ff) = variants(col("k"))
      val cyc = pmod(col("k"), lit(10)) === 7
      val redirects = fam.select(explode(array(
          struct(fr1.as("src"), when(cyc, fr2).otherwise(fm).as("dst")),
          struct(fr2.as("src"), fr1.as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
      // the refresh pages arrive as HTML — the soft-redirect relation
      // is PARSED out of the markup, resolved, and unioned into the
      // 3xx log
      // materialize the CONSTRUCTED strings before parsing them (the
      // r19 lesson pinned at tx_canonical_collapse above, and the r20
      // regression: metaRefreshRedirects' resolver references its url/
      // html arguments many times, and over these construction trees
      // the analyzer/codegen unit multiplied into a 40-70 s PER-RUN
      // driver cost on a 25-row relation; over plain column refs the
      // parse tree stays operator-sized)
      val refreshPages = fam.select(ff.as("page"),
        concat(
          lit("<html><head><meta http-equiv=\"refresh\" " +
            "content=\"0; url="), fr1,
          lit("\"></head><body>moved</body></html>")).as("html"))
        .localCheckpoint(true)
      // pin the PARSED soft-redirect relation too: its resolver plan
      // is thousands of expression nodes, and the closure's base
      // checkpoint re-optimized it per run (measured 6.6 s of pure
      // driver optimizer time; over the pinned 25-row relation the
      // same job costs 0.5 s)
      val softRedirects =
        Web.metaRefreshRedirects(refreshPages, "page", "html")
          .localCheckpoint(true)
      val canonPages = fam.select(explode(array(
          struct(fd.as("url"), fm.as("canon_url")),
          struct(fa.as("url"), fd.as("canon_url")))).as("p"))
        .select(col("p.url").as("url"), col("p.canon_url").as("canon_url"))
      val (em, er1, er2, ed, ea, ef) = variants(pmod(col("doc_id"), lit(25)))
      val w = pmod(floor(col("doc_id") / lit(25)).cast("long"), lit(6))
      val edges = docs.select(col("doc_id"),
        when(w === 0, em).when(w === 1, er1).when(w === 2, er2)
          .when(w === 3, ed).when(w === 4, ea).otherwise(ef).as("dst"),
        element_at(array(lit("main link"), lit("old link"),
          lit("older link"), lit("mobile link"), lit("amp link"),
          lit("refresh link")),
          w.cast("int") + 1).as("anchor"))
      // pin the consolidated edge list: anchorCorpus reads it TWICE
      // (the counts agg and the top-k agg), so unpinned the two
      // consolidation joins and the fixture projection execute — and
      // re-optimize — twice per run
      Web.anchorCorpus(
          Web.consolidateEdges(edges, "dst",
            redirects.unionByName(softRedirects), canonPages)
            .localCheckpoint(true))
        .orderBy(col("dst"))
    }),

    // FRONTIER ON FINAL URLS (the last clause of r18 verdict #3): a
    // discovery stream where every 4th sighting arrives via a 301
    // SOURCE url (plus case/port/utm junk on the direct sightings) is
    // keyed on the REDIRECT-RESOLVED final URL before the keep-first
    // fold — so a page's sightings through old addresses count toward
    // the same frontier entry instead of splitting n_seen across
    // duplicate identities. Sightings into redirect CYCLES drop (no
    // fetchable page). Map-only canonicalization + the log-many
    // closure joins + one hash group.
    "tx_frontier_final" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val fam = pmod(col("doc_id"), lit(25))
      val famS = fam.cast("string")
      val h = pmod(fam, lit(4)).cast("string")
      val v = pmod(col("doc_id"), lit(4))
      val raw = docs.select(
        when(v === 3, concat(lit("https://old"), h, lit(".com/r/"),
            famS, lit("?utm_ref=x"), col("doc_id").cast("string")))
          .otherwise(concat(lit("HTTPS://WWW.Site"), h, lit(".COM:443/art/"),
            famS, lit("?utm_source=d"), col("doc_id").cast("string")))
          .as("loc"))
      val fams = docs.select(fam.as("k")).distinct()
      val kS = col("k").cast("string")
      val kh = pmod(col("k"), lit(4)).cast("string")
      val fm = concat(lit("https://site"), kh, lit(".com/art/"), kS)
      val fr1 = concat(lit("https://old"), kh, lit(".com/r/"), kS)
      val fr2 = concat(lit("https://older.com/rr/"), kS)
      val kcyc = pmod(col("k"), lit(10)) === 7
      val redirects = fams.select(explode(array(
          struct(fr1.as("src"), when(kcyc, fr2).otherwise(fm).as("dst")),
          struct(fr2.as("src"), fr1.as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
      val rmap = Web.resolveRedirects(redirects, maxHops = 8)
        .select(col("src").as("_f_src"), col("final_url").as("_f_f"),
          col("status").as("_f_st"))
      raw.select(Web.canonicalUrl(col("loc")).as("url"))
        .join(rmap, col("url") === col("_f_src"), "left")
        .withColumn("final_url",
          when(col("_f_st").isNull, col("url"))
            .when(col("_f_st") === "resolved", col("_f_f")))
        .filter(col("final_url").isNotNull)
        .groupBy(col("final_url"))
        .agg(count(lit(1)).as("n_seen"))
        .orderBy(col("final_url"))
    }),

    // CRAWL CAPSTONE (r18 verdict #5): WARC bytes → training corpus,
    // every seam composed in ONE pipeline — real gzipped WARC records
    // carrying four charset shapes (undeclared UTF-8, header latin-1,
    // MISLABELED utf-8-over-latin-1 → fallback, undeclared EUC-KR
    // hangul → detected), 301 REDIRECT records (application/http
    // bodies with a Location line), noindex pages, and base-href'd
    // rel=canonical links. Crawl side: gunzip → parse → decodeText
    // sniff → robots-meta compliance → htmlText → length quality gate
    // → canonical consolidation where the AMP variant's canonical
    // lands on a REDIRECT SOURCE (canonical-onto-redirect — the
    // canonical map's targets are pushed through the redirect
    // closure), collapsing every family onto its main URL. The funnel
    // surfaces charset-route counts (n_detected / n_fallback) as
    // quality columns so mojibake risk is measurable (r18 missing
    // #2). Oracle: every decoded text, gate, and final URL re-derived
    // arithmetically — a hash match proves the encode → container →
    // sniff → parse → consolidate loop end to end. Scale shape:
    // partition-local container work, map-only extraction, log-many
    // closure joins, one final hash group.
    "tx_crawl_corpus" -> ((s, dir) => {
      import graft.operators.Warc
      import java.nio.charset.StandardCharsets
      // the container+decode map below is the query's heaviest per-row
      // work, and the documents fixture is ONE parquet row group — the
      // guide §2.5 one-unsplittable-file case: without a spread the
      // whole WARC gzip/parse/decode pass runs in a single task.
      // Repartition the 8-byte id column to the session's parallelism
      // ONLY when the scan under-parallelizes (at real scale the scan
      // splits naturally and this is a no-op); per-record output is
      // partition-invariant (each record round-trips independently —
      // batching only shapes container boundaries), so the result is
      // bit-identical.
      val ids = Tables.load(s, dir, "documents").select(col("doc_id"))
      val np = s.sparkContext.defaultParallelism
      val docs = if (ids.rdd.getNumPartitions < np)
        ids.repartition(np) else ids
      val schema = org.apache.spark.sql.types.StructType(Seq(
        "kind", "url", "dst", "html", "charset", "source").map(n =>
        org.apache.spark.sql.types.StructField(n,
          org.apache.spark.sql.types.StringType, nullable = false)))
      val rdd = docs.rdd.mapPartitions { rows =>
        rows.grouped(32).flatMap { batch =>
          val recs = batch.map { r =>
            val id = r.getLong(0)
            val fam = id % 25; val w = id % 4; val c = id % 6
            val h = fam % 4
            val mainUrl = s"https://site$h.com/art/$fam"
            val mobileUrl = s"https://m.site$h.com/art/${fam}m"
            val ampUrl = s"https://amp.site$h.com/amp/$fam"
            val oldUrl = s"https://old$h.com/r/$fam"
            if (w == 3) {
              (oldUrl, Some("application/http"),
                ("HTTP/1.1 301 Moved Permanently\r\nLocation: " +
                  mainUrl + "\r\n\r\n")
                  .getBytes(StandardCharsets.ISO_8859_1))
            } else {
              val flavor =
                if (c == 1 || c == 4) "café ±"
                else if (c == 2 || c == 5) "한국어 본문 내용"
                else "plain"
              val text = if (id % 13 == 11) "tiny"
                else s"Article $fam rev $id $flavor body content " +
                  "for the corpus quality gate"
              val noidx = if (id % 11 == 5)
                "<meta name=\"robots\" content=\"noindex\">" else ""
              val (url, head) = w match {
                case 0L => (mainUrl + s"?utm_source=w$id", noidx)
                case 1L => (mobileUrl, noidx +
                  s"""<link rel="canonical" href="$mainUrl">""")
                case _ => (ampUrl, noidx +
                  s"""<base href="https://old$h.com/r/">""" +
                  s"<link rel=canonical href=$fam>")
              }
              val html =
                s"<html><head>$head</head><body>$text</body></html>"
              val (ct, bytes) = c match {
                case 1L => (Some("text/html; charset=iso-8859-1"),
                  html.getBytes(StandardCharsets.ISO_8859_1))
                case 4L => (Some("text/html; charset=utf-8"),
                  html.getBytes(StandardCharsets.ISO_8859_1))
                case 2L | 5L => (None, html.getBytes(
                  java.nio.charset.Charset.forName("EUC-KR")))
                case _ => (None, html.getBytes(StandardCharsets.UTF_8))
              }
              (url, ct, bytes)
            }
          }
          val gz = Warc.gzip(Warc.writeRecordsTyped(recs))
          // ---- crawl side: everything below reads only the container
          Warc.parseRecords(Warc.gunzip(gz)).map { rec =>
            val uri = rec.header("WARC-Target-URI").get
            val ct = rec.header("Content-Type")
            if (ct.contains("application/http")) {
              val body = new String(rec.body, StandardCharsets.ISO_8859_1)
              val loc = "Location:[ \t]*([^\r\n]+)".r
                .findFirstMatchIn(body).map(_.group(1).trim).getOrElse("")
              org.apache.spark.sql.Row("redirect", uri, loc, "", "", "")
            } else {
              val d = Warc.decodeText(rec.body, ct)
              org.apache.spark.sql.Row("page", uri, "", d.text,
                d.charset, d.source)
            }
          }
        }
      }
      // the container/decode work runs ONCE; redirect split, the
      // canonical map, and the final join all read the checkpoint
      val raw = s.createDataFrame(rdd, schema).localCheckpoint(true)
      val redirects = raw.filter(col("kind") === "redirect")
        .select(col("url").as("src"), col("dst"))
      // the parse/extract projection (one fat codegen unit) runs ONCE;
      // the canonical map input and the final join read the checkpoint
      // staged effectiveCanonical (r20): the inlined column form's
      // duplicated resolver subtrees cost seconds of per-job driver
      // analysis — see Web.withEffectiveCanonical
      val pages = Web.withEffectiveCanonical(
          raw.filter(col("kind") === "page")
            .filter(!Web.metaRobots(col("html")).getField("noindex")),
          "url", "html", "decl")
        .select(Web.canonicalUrl(col("url")).as("url"), col("decl"),
          Web.htmlText(col("html")).as("clean"),
          col("charset"), col("source"))
        .filter(length(col("clean")) >= 20)
        .localCheckpoint(true)
      // ONE shared doubling loop resolves BOTH closures (r19 verdict
      // #2: two independent closures paid the fixed per-round job cost
      // twice); redirect chains are single-hop here and canonical
      // chains ≤ 2 hops, so an 8-hop budget (3 rounds) serves both
      val maps = Web.resolveCrawlGraphs(redirects,
        pages.select(col("url"), col("decl")).distinct(),
        urlCol = "url", canonCol = "decl", maxHops = 8, canonHops = 8)
      val cmap = maps.canonicals
      val rmap = maps.redirects
        .select(col("src").as("_t_src"), col("final_url").as("_t_f"),
          col("status").as("_t_st"))
      // canonical-onto-redirect: the canonical map's TARGETS go
      // through the redirect closure before they key the corpus
      val fmap = cmap.join(rmap, col("canon_url") === col("_t_src"),
          "left")
        .select(col("url"),
          when(col("_t_st") === "resolved", col("_t_f"))
            .otherwise(col("canon_url")).as("final_url"))
      pages.join(fmap, Seq("url"))
        .groupBy(col("final_url"))
        .agg(count(lit(1)).as("n_crawls"),
          countDistinct(col("url")).as("n_pages"),
          count(when(col("source") === "detected", 1)).as("n_detected"),
          count(when(col("source") === "fallback", 1)).as("n_fallback"),
          md5(min(col("clean"))).as("text_md5"))
        .withColumnRenamed("final_url", "canon_url")
        .orderBy(col("canon_url"))
    }),

    // STREAMING URL frontier (15th oracle-gated state kind): the same
    // discovered-URL relation (already XML-unescaped — the codec is the
    // batch twin's job) arrives as a 4-micro-batch file stream; each
    // trigger canonicalizes, robots-filters, and merges a per-URL
    // (sum, min-lastmod) increment into the frontier state. The fold is
    // a keyed commutative monoid, so the fixed point equals the batch
    // funnel exactly and SHARES tx_url_frontier's oracle verbatim —
    // the continuous-discovery form of the same crawl loop.
    "stream_url_frontier" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val h = pmod(col("doc_id"), lit(4))
      val pathDir = element_at(array(lit("/item/"), lit("/private/")),
        pmod(floor(col("doc_id") / lit(4)).cast("long"), lit(2)).cast("int")
          + 1)
      val raw = docs.select(col("doc_id"),
        concat(lit("HTTPS://WWW.Site"), h.cast("string"),
          lit(".COM:443"), pathDir,
          pmod(col("doc_id"), lit(100)).cast("string"),
          lit("?utm_source=map"), col("doc_id").cast("string"),
          lit("&ref=sm#f")).as("loc"),
        concat(lit("2026-0"),
          (pmod(col("doc_id"), lit(9)) + 1).cast("string"),
          lit("-01")).as("lastmod"))
      val tmp = graft.Graft.scratchDir("graft_stream_frontier")
      raw.repartitionByRange(4, col("doc_id"))
        .write.mode("overwrite").parquet(tmp)
      val rules = Web.parseRobots(
        s.createDataFrame(FixRobots).toDF("host", "body"))
        .localCheckpoint(true)
      try graft.streaming.EventStream
        .ingestUrlFrontier(s, tmp,
          raw.select(col("loc"), col("lastmod")).schema, rules)
        .orderBy(col("url"))
      finally graft.streaming.EventStream.deleteDir(tmp)
    }),

    // WARC → MEDIA routing (r15 verdict task #6 — the crawl container
    // feeding BOTH pipelines): one gzipped WARC stream carries text/html
    // records AND real PNG records (every 5th doc rendered via the
    // mm_png_roundtrip contract), tagged by Content-Type. The crawl side
    // reads ONLY the container bytes: parse → route on the Content-Type
    // header → images through the real ImageIO decode → grid resize →
    // dHash; text through md5. The oracle re-derives both branches from
    // text alone (never sees a container or a PNG), so the hash match
    // proves container round trip, header routing, AND the codec path.
    // Partition-local end to end — payload bytes exist only inside the
    // mapPartitions iterator; only (id, kind, dims, hex sig) rows flow
    // into the final orderBy (spec-pinned).
    "tx_warc_media" -> ((s, dir) => {
      import graft.operators.Warc
      import graft.{MediaCodecs, Multimodal}
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text"))
      val outSchema = StructType(Seq(
        StructField("media_id", LongType, nullable = false),
        StructField("kind", StringType, nullable = false),
        StructField("dim1", IntegerType, nullable = false),
        StructField("dim2", IntegerType, nullable = false),
        StructField("sig", StringType, nullable = false)))
      val rGrid = Multimodal.PhashGridRows
      val cGrid = Multimodal.PhashGridCols
      val rdd = docs.rdd.mapPartitions { rows =>
        rows.grouped(32).flatMap { batch =>
          val recs = batch.map { r =>
            val id = r.getLong(0)
            val text = r.getString(1)
            if (id % 5 == 0) {
              val k = (id % 3 + 1).toInt
              val grid = MediaCodecs.mdGrid256(text)
              val w = cGrid * k
              val px = Array.tabulate(rGrid * k * w) { i =>
                grid((i / w / k) * cGrid + (i % w) / k)
              }
              ("https://ex.com/media/" + id, Some("image/png"),
                MediaCodecs.encodeGrayPng(w, rGrid * k, px))
            } else
              ("https://ex.com/doc/" + id, Some("text/html"),
                text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          }
          val gz = Warc.gzip(Warc.writeRecordsTyped(recs))
          // ---- crawl side: everything below reads only the gzipped WARC
          Warc.parseRecords(Warc.gunzip(gz)).map { rec =>
            val uri = rec.header("WARC-Target-URI").get
            val id = uri.substring(uri.lastIndexOf('/') + 1).toLong
            if (rec.header("Content-Type").exists(_.startsWith("image/"))) {
              val img = MediaCodecs.decodeImage(rec.body)
              val ph = Multimodal.dHash(
                MediaCodecs.grayGrid(img, rGrid, cGrid))
              Row(id, "image", img.getWidth, img.getHeight, f"$ph%016x")
            } else {
              val md = java.security.MessageDigest.getInstance("MD5")
              Row(id, "text", rec.body.length, 0,
                md.digest(rec.body).map("%02x".format(_)).mkString)
            }
          }
        }
      }
      s.createDataFrame(rdd, outSchema).orderBy(col("media_id"))
    }),

    // The crawl→corpus funnel composed end to end: every document gets
    // the tx_html_extract markup AND a crawl URL where doc_id % 200
    // identifies the PAGE (several docs are re-crawls of one page, their
    // URLs differing only in tracking params / fragments — doc_id-varying
    // utm and #Sec noise). Extract text, gate on link density (< 800 bp —
    // placed where it BITES on this fixture: p90 of the distribution is
    // ~983, so the boilerplate-heaviest pages are really cut) and length
    // (≥ 150 chars, cuts the short tail), then
    // collapse re-crawls by canonical URL keeping the earliest crawl
    // (min doc_id — the reference keep-first dedup convention). One
    // shuffle total (the canonical-URL group); everything upstream is
    // codegen regex projection.
    "tx_web_corpus" -> ((s, dir) => {
      // robots-meta compliance fixture (r17 verdict task #4): every
      // 7th doc (±3) is noindex — it must LEAVE the corpus; the ±2
      // docs carry an index,follow robots meta and the ±1 docs a
      // name=description DECOY whose content says noindex — both must
      // SURVIVE (name match + whole-token content discipline)
      val m7 = pmod(col("doc_id"), lit(7))
      val metaTag = when(m7 === 3,
          lit("<meta name=\"robots\" content=\"noindex, follow\">"))
        .when(m7 === 2,
          lit("<meta name=\"robots\" content=\"index, follow\">"))
        .when(m7 === 1,
          lit("<meta name=\"description\" content=\"noindex nofollow\">"))
        .otherwise(lit(""))
      val html = concat(
        lit("<html><head>"), metaTag,
        lit("<title>D"), col("doc_id").cast("string"),
        lit("</title><script type=\"text/javascript\">var x = "),
        col("doc_id").cast("string"),
        lit(";</script><style>.c { color: red }</style></head>"),
        lit("<body><!-- nav --><h1>Doc "), col("doc_id").cast("string"),
        lit("</h1><p>"), col("text"), lit("</p>"),
        element_at(array(lit(""), lit(FixAnchor), lit(FixAnchor * 2),
          lit(FixAnchor * 3)), pmod(col("doc_id"), lit(4)).cast("int") + 1),
        lit(FixTail))
      val url = concat(
        lit("HTTPS://WWW.Site"), pmod(col("doc_id"), lit(50)).cast("string"),
        lit(".COM:443/page/"), pmod(col("doc_id"), lit(200)).cast("string"),
        lit("?utm_source=crawl"), col("doc_id").cast("string"),
        lit("&ref=r#Sec"), pmod(col("doc_id"), lit(3)).cast("string"))
      val extracted = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          Web.canonicalUrl(url).as("canon_url"),
          Web.htmlText(html).as("clean"),
          Web.linkDensityBp(html).as("ld_bp"),
          Web.metaRobots(html).getField("noindex").as("noindex"))
        .filter(col("ld_bp") < 800 && length(col("clean")) >= 150 &&
          !col("noindex"))
        .drop("noindex")
      extracted
        .groupBy(col("canon_url"))
        .agg(min(col("doc_id")).as("doc_id"),
          count(lit(1)).as("n_crawls"))
        .join(extracted.select(col("doc_id"), col("clean"), col("ld_bp")),
          Seq("doc_id"))
        .select(col("canon_url"), col("doc_id"), col("n_crawls"),
          md5(encode(col("clean"), "UTF-8")).as("text_md5"),
          col("ld_bp"))
        .orderBy(col("canon_url"))
    })
  )

  override def oracle: Map[String, String] = Map(
    "q23_sweepline_dates" ->
      """WITH conds AS (
        |  SELECT o_orderpriority AS name,
        |    strftime(min(o_orderdate), '%Y%m%d') AS lo_d,
        |    strftime(max(o_orderdate), '%Y%m%d') AS hi_d,
        |    count(*) AS w
        |  FROM orders GROUP BY o_orderpriority, o_orderstatus),
        |ec AS (
        |  SELECT name, epoch(strptime(lo_d, '%Y%m%d'))::BIGINT AS lo,
        |    epoch(strptime(hi_d, '%Y%m%d'))::BIGINT AS hi, w
        |  FROM conds),
        |events AS (
        |  SELECT name, lo AS point, 0 AS tie, w AS delta FROM ec
        |  UNION ALL SELECT name, hi, 1, -w FROM ec),
        |eagg AS (SELECT name, point, tie, sum(delta) AS delta
        |         FROM events GROUP BY name, point, tie),
        |run AS (SELECT name, point, tie,
        |  sum(delta) OVER (PARTITION BY name ORDER BY point, tie
        |    ROWS UNBOUNDED PRECEDING) AS running,
        |  lead(point) OVER (PARTITION BY name ORDER BY point, tie) AS next_point
        |  FROM eagg)
        |SELECT name,
        |  strftime(to_timestamp(point), '%Y%m%d') AS lo_d,
        |  strftime(to_timestamp(next_point), '%Y%m%d') AS hi_d,
        |  CAST(running AS BIGINT) AS score
        |FROM run
        |WHERE next_point IS NOT NULL AND next_point > point AND running > 0
        |ORDER BY name, lo_d""".stripMargin,

    "q24_literal_lists" ->
      """WITH t(name, raw) AS (VALUES
        |  ('segs', '[''BUILDING'',''MACHINERY'']'),
        |  ('range', '[100, 250]'),
        |  ('single', '[''SINGLE'']'),
        |  ('scalar', '42'))
        |SELECT name,
        |  array_to_string(string_split(regexp_replace(raw, '[\[\]'' ]', '', 'g'), ','), '|') AS vals,
        |  len(string_split(regexp_replace(raw, '[\[\]'' ]', '', 'g'), ',')) AS n
        |FROM t ORDER BY name""".stripMargin,

    "q26_condition_codec" ->
      """WITH raw(camp_id, score, target_condi) AS (VALUES
        |  ('C1', 85.5, 'string %^ c_mktsegment %^ in %^ [''BUILDING'',''MACHINERY''] !@#$ integer %^ o_totalprice %^ between %^ [100000, 300000]'),
        |  ('C2', 62.25, 'integer %^ o_totalprice %^ greater %^ 250000 !@#$ datePopup %^ o_orderdate %^ less %^ 19970101'),
        |  ('C3', 40.0, 'datePopup %^ o_orderdate %^ between %^ [''19950101'',''19961231''] !@#$ string %^ o_orderpriority %^ in %^ [''1-URGENT'']')),
        |conds AS (
        |  SELECT camp_id, score, unnest(string_split(target_condi, '!@#$')) AS cond
        |  FROM raw),
        |parts AS (
        |  SELECT camp_id, CAST(score AS DOUBLE) AS score,
        |    trim(string_split(cond, '%^')[1]) AS cond_form,
        |    trim(string_split(cond, '%^')[2]) AS feature,
        |    trim(string_split(cond, '%^')[3]) AS op,
        |    trim(string_split(cond, '%^')[4]) AS value_str
        |  FROM conds),
        |vals AS (
        |  SELECT *, string_split(regexp_replace(value_str, '[\[\]'' ]', '', 'g'), ',') AS v
        |  FROM parts),
        |str_rows AS (
        |  SELECT feature AS name, 'string' AS kind, unnest(v) AS value,
        |    '' AS lo, '' AS hi, score AS w
        |  FROM vals WHERE cond_form = 'string'),
        |int_rows AS (
        |  SELECT feature AS name, 'integer' AS kind, '' AS value,
        |    CASE WHEN op = 'less' THEN '0' ELSE v[1] END AS lo,
        |    CASE WHEN op = 'less' THEN v[1]
        |         WHEN op = 'greater' THEN '9999999999'
        |         ELSE coalesce(v[2], v[1]) END AS hi,
        |    score AS w
        |  FROM vals WHERE cond_form = 'integer'),
        |date_rows AS (
        |  SELECT feature AS name, 'datePopup' AS kind, '' AS value,
        |    CASE WHEN op = 'less' THEN '20200101' ELSE v[1] END AS lo,
        |    CASE WHEN op = 'less' THEN v[1]
        |         WHEN op = 'greater' THEN '20301231'
        |         ELSE coalesce(v[2], v[1]) END AS hi,
        |    score AS w
        |  FROM vals WHERE cond_form = 'datePopup')
        |SELECT * FROM (
        |  SELECT * FROM str_rows UNION ALL SELECT * FROM int_rows
        |  UNION ALL SELECT * FROM date_rows)
        |ORDER BY name, kind, value, lo, w""".stripMargin,

    "q25_operator_scan" ->
      """WITH t(name, prmp) AS (VALUES
        |  ('seg_cond', 'c_mktsegment = @v'),
        |  ('price_cond', 'o_totalprice BETWEEN @lo @hi'),
        |  ('prio_cond', 'o_orderpriority IN @list'),
        |  ('custom', 'doc n_chars ::op:: kwd')),
        |x AS (SELECT name, string_split(prmp, ' ') AS toks FROM t),
        |p AS (SELECT name, toks,
        |  least(
        |    coalesce(nullif(list_position(toks, '='), 0), 9223372036854775807),
        |    coalesce(nullif(list_position(toks, 'BETWEEN'), 0), 9223372036854775807),
        |    coalesce(nullif(list_position(toks, 'IN'), 0), 9223372036854775807),
        |    coalesce(nullif(list_position(toks, '::op::'), 0), 9223372036854775807)) AS j
        |  FROM x)
        |SELECT name, array_to_string(toks[1:j-1], ' ') AS column_nm,
        |  toks[j] AS op
        |FROM p ORDER BY name""".stripMargin,

    // The SAME fixture markup (shared constants) and the SAME regex
    // pipeline, GENERATED from Web's pattern/entity tables ('g' flag =
    // Spark's replace-all default) — the md5 gates every
    // strip/decode/collapse step.
    "tx_html_extract" ->
      s"""WITH src AS (
         |  SELECT doc_id,
         |    ${fixtureHtmlSql("D")}
         |      AS html
         |  FROM documents),
         |stripped AS (
         |  SELECT doc_id,
         |    ${htmlTextSql("html")} AS clean,
         |    ${anchorsJoinedSql("html", "")} AS linktxt,
         |    ${anchorsJoinedSql("html", " ")} AS linkjoined,
         |    len(regexp_extract_all(html, ${sqlLit(Web.AnchorPattern)}, 1))
         |      AS n_links
         |  FROM src),
         |cleaned AS (
         |  SELECT *, ${htmlTextSql("linkjoined")} AS linkclean FROM stripped)
         |SELECT doc_id, md5(clean) AS text_md5,
         |  CAST(length(clean) AS INTEGER) AS clean_len,
         |  CAST(n_links AS INTEGER) AS n_links,
         |  CAST(length(linktxt) AS INTEGER) AS link_chars,
         |  CAST(floor(length(linkclean) * 10000.0
         |    / greatest(length(clean), 1)) AS INTEGER) AS link_density_bp
         |FROM cleaned ORDER BY doc_id""".stripMargin,

    // Same canonicalization passes in RE2: authority-prefix lowercase,
    // fragment, scheme-default port (delimiter-captured, no lookahead),
    // www, and the three separator-exact utm strips.
    "tx_url_canonical" ->
      """WITH src AS (
        |  SELECT doc_id,
        |    'HTTPS://WWW.ShopSite' || CAST(doc_id % 50 AS VARCHAR)
        |    || '.COM:443/Item/' || CAST(doc_id AS VARCHAR)
        |    || '?utm_source=feed&id=' || CAST(doc_id % 7 AS VARCHAR)
        |    || '&utm_campaign=Spring&ref=Home#Sec'
        |    || CAST(doc_id % 3 AS VARCHAR) AS u
        |  FROM documents),
        |canon AS (
        |  SELECT doc_id,
        |    regexp_replace(regexp_replace(regexp_replace(
        |      regexp_replace(regexp_replace(regexp_replace(
        |      regexp_replace(
        |        lower(regexp_extract(u,
        |          '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', 0))
        |        || regexp_replace(u,
        |             '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', ''),
        |      '#.*', ''),
        |      '^(https://[^/:?#]*):443([/?#]|$)', '\1\2'),
        |      '^(http://[^/:?#]*):80([/?#]|$)', '\1\2'),
        |      '^(https?://)www\.', '\1'),
        |      '&utm_[^&#]*', '', 'g'),
        |      '\?utm_[^&#]*&', '?'),
        |      '\?utm_[^&#]*$', '') AS canon_url
        |  FROM src),
        |parts AS (
        |  SELECT doc_id, canon_url,
        |    regexp_extract(canon_url, '^[a-z][a-z0-9+.-]*://([^/:?#]+)', 1)
        |      AS host
        |  FROM canon)
        |SELECT doc_id, canon_url, host,
        |  CASE WHEN regexp_matches(host, '[^.]+\.[^.]+$')
        |    THEN regexp_extract(host, '([^.]+\.[^.]+)$', 1)
        |    ELSE host END AS domain
        |FROM parts ORDER BY doc_id""".stripMargin,

    // The full PSL algorithm re-derived: rules parsed into
    // plain/wildcard/exception kinds, every host suffix (INCLUDING the
    // host itself) matched — exact base for plain/exception, the
    // suffix's parent for wildcards — exceptions prevail (public suffix
    // = rule minus leading label), else most labels; registrable domain
    // = public suffix + 1 label, EMPTY when host == public suffix;
    // non-matching hosts take the two-label fallback with
    // source='fallback'.
    "tx_url_domain_psl" ->
      """WITH hosts(host) AS (VALUES
        |  ('a.b.example.co.uk'), ('www.example.com'), ('example.com.au'),
        |  ('localhost'), ('svc.internal.corp'), ('uk'),
        |  ('foo.bar.ck'), ('bar.ck'), ('www.ck'), ('co.uk')),
        |psl(rule) AS (VALUES
        |  ('com'), ('org'), ('co.uk'), ('com.au'), ('uk'),
        |  ('*.ck'), ('!www.ck')),
        |rules AS (
        |  SELECT rule,
        |    CASE WHEN rule LIKE '!%' THEN 'exc'
        |         WHEN rule LIKE '*.%' THEN 'wild'
        |         ELSE 'plain' END AS kind,
        |    CASE WHEN rule LIKE '!%' THEN substr(rule, 2)
        |         WHEN rule LIKE '*.%' THEN substr(rule, 3)
        |         ELSE rule END AS base
        |  FROM psl),
        |h AS (SELECT host, string_split(host, '.') AS labels,
        |        len(string_split(host, '.')) AS n FROM hosts),
        |cand AS (
        |  SELECT host, labels, n,
        |    array_to_string(labels[CAST(u.i + 1 AS INTEGER):CAST(n AS INTEGER)], '.') AS suffix,
        |    coalesce(array_to_string(labels[CAST(u.i + 2 AS INTEGER):CAST(n AS INTEGER)], '.'), '') AS parent,
        |    n - u.i AS slen
        |  FROM h, LATERAL unnest(range(0, n)) u(i)),
        |exact AS (
        |  SELECT c.host, c.labels, c.n,
        |    CASE WHEN r.kind = 'exc' THEN c.slen - 1 ELSE c.slen END AS ps_len,
        |    r.kind = 'exc' AS is_exc
        |  FROM cand c JOIN rules r ON r.kind <> 'wild' AND c.suffix = r.base),
        |wild AS (
        |  SELECT c.host, c.labels, c.n, c.slen AS ps_len, false AS is_exc
        |  FROM cand c JOIN rules r
        |    ON r.kind = 'wild' AND c.slen >= 2 AND c.parent = r.base),
        |m AS (
        |  SELECT host, labels, n,
        |    max(CASE WHEN is_exc THEN ps_len END) AS exc_ps,
        |    max(CASE WHEN NOT is_exc THEN ps_len END) AS norm_ps
        |  FROM (SELECT * FROM exact UNION ALL SELECT * FROM wild)
        |  GROUP BY host, labels, n),
        |matched AS (
        |  SELECT host,
        |    CASE WHEN coalesce(exc_ps, norm_ps) = n THEN ''
        |      ELSE array_to_string(labels[CAST(n - coalesce(exc_ps, norm_ps) AS INTEGER):CAST(n AS INTEGER)], '.')
        |      END AS domain,
        |    'psl' AS source
        |  FROM m),
        |unmatched AS (
        |  SELECT h.host,
        |    CASE WHEN regexp_matches(h.host, '[^.]+\.[^.]+$')
        |      THEN regexp_extract(h.host, '([^.]+\.[^.]+)$', 1)
        |      ELSE h.host END AS domain,
        |    'fallback' AS source
        |  FROM h WHERE h.host NOT IN (SELECT host FROM matched))
        |SELECT host, domain, source FROM
        |  (SELECT * FROM matched UNION ALL SELECT * FROM unmatched)
        |ORDER BY host""".stripMargin,

    // RFC 9309 re-derived: line split with positions, comment strip,
    // group ids via lag + running sum, *-group selection, §2.2.3
    // regex translation, longest-rule-then-allow priority via struct
    // max.
    "tx_robots_filter" -> robotsFilterOracle("*"),

    // Same derivation with the exact-token group selection for
    // 'otherbot' (case-insensitive) shadowing the *-groups per host.
    "tx_robots_agent" -> robotsFilterOracle("OtherBot"),

    // Crawl-delay: selected-group min of numeric values (regex-gated
    // cast — non-numeric reads null → -1); Sitemap: host-global
    // distinct-sorted join. Both from the same VALUES bodies.
    "tx_robots_meta" ->
      (s"""WITH ${robotsGroupCtes("*")},
         |""".stripMargin +
      raw"""delays AS (
        |  SELECT host, min(CASE WHEN regexp_matches(g.value,
        |      '^[0-9]+(\.[0-9]+)?$$') THEN CAST(g.value AS DOUBLE) END)
        |    AS crawl_delay
        |  FROM grp g JOIN selg USING (host, group_id)
        |  WHERE g.key = 'crawl-delay' GROUP BY host),
        |sm AS (
        |  SELECT host, array_to_string(list_sort(list_distinct(
        |    list(value))), '|') AS sitemaps
        |  FROM kept WHERE key = 'sitemap' AND value <> '' GROUP BY host)
        |SELECT r.host, coalesce(d.crawl_delay, -1.0) AS crawl_delay,
        |  coalesce(s.sitemaps, '') AS sitemaps
        |FROM (SELECT DISTINCT host FROM robots) r
        |LEFT JOIN delays d ON r.host = d.host
        |LEFT JOIN sm s ON r.host = s.host
        |ORDER BY r.host""".stripMargin),

    // The frontier re-derived from documents directly (never sees the
    // XML): canonical URL + path by construction, the shared robots
    // rule CTEs, longest-prefix-then-allow, allowed-only keep-first.
    "tx_url_frontier" -> frontierOracle,

    // The streamed fold's fixed point IS the batch funnel (keyed
    // commutative monoid — split-independent), so the oracle is shared
    // verbatim.
    "stream_url_frontier" -> frontierOracle,

    // Every final target and hop count re-derived ARITHMETICALLY (no
    // recursion in SQL): the engine's path to the same values runs
    // through 6 path-doubling self-joins; a 4-cycle's cur lands back
    // on itself after 64 ≡ 0 (mod 4) hops, so the unresolved rows'
    // final_url is deterministically the source itself.
    "tx_redirect_resolve" ->
      """WITH e AS (
        |  SELECT doc_id, CAST(doc_id // 4 AS BIGINT) AS f,
        |    doc_id % 4 AS p
        |  FROM documents)
        |SELECT
        |  'https://r.com/f' || CAST(f AS VARCHAR) || '/p'
        |    || CAST(p AS VARCHAR) AS src,
        |  CASE WHEN f % 10 = 7
        |    THEN 'https://r.com/f' || CAST(f AS VARCHAR) || '/p'
        |      || CAST(p AS VARCHAR)
        |    ELSE 'https://final.com/f' || CAST(f AS VARCHAR) END
        |    AS final_url,
        |  CASE WHEN f % 10 = 7 THEN NULL
        |    ELSE CAST(4 - p AS BIGINT) END AS hops,
        |  CASE WHEN f % 10 = 7 THEN 'unresolved' ELSE 'resolved' END
        |    AS status
        |FROM e ORDER BY src""".stripMargin,

    // The consolidation re-derived: every (doc_id % 40) article group
    // collapses onto its main URL through the amp → mobile → main
    // 2-hop chain the engine must PARSE and path-double its way
    // through — except the cycle groups (g % 10 = 9), whose mobile/amp
    // members keep their own urls while main stays separate.
    "tx_canonical_collapse" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 40 AS g, doc_id % 3 AS v
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    CASE
        |      WHEN g % 10 = 9 AND v = 1 THEN
        |        'https://m.site' || CAST(g % 4 AS VARCHAR) || '.com/art/'
        |          || CAST(g AS VARCHAR) || 'm'
        |      WHEN g % 10 = 9 AND v = 2 THEN
        |        'https://amp.site' || CAST(g % 4 AS VARCHAR) || '.com/amp/'
        |          || CAST(g AS VARCHAR)
        |      ELSE 'https://site' || CAST(g % 4 AS VARCHAR) || '.com/art/'
        |        || CAST(g AS VARCHAR) END AS canon_url
        |  FROM d)
        |SELECT canon_url, min(doc_id) AS first_doc, count(*) AS n_pages
        |FROM m GROUP BY canon_url ORDER BY canon_url""".stripMargin,

    // Every family's six link identities re-derived onto the ONE main
    // URL arithmetically (the engine must parse the meta-refresh and
    // path-double the redirect AND canonical chains to get there);
    // cycle families' R1/R2 links vanish (WHERE NOT) — and so do
    // their F links, whose refresh edge points INTO the redirect
    // cycle — and the bounded anchor top-k mirrors the anchorCorpus
    // oracle shape. The identity w varies per doc-block (doc_id //
    // 25), independent of the family (r19 ADVICE #4).
    "tx_graph_consolidate" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 25 AS k, (doc_id // 25) % 6 AS w
        |  FROM documents
        |  WHERE NOT ((doc_id % 25) % 10 = 7
        |    AND (doc_id // 25) % 6 IN (1, 2, 5))),
        |edges AS (
        |  SELECT doc_id,
        |    'https://site' || CAST(k % 4 AS VARCHAR) || '.com/art/'
        |      || CAST(k AS VARCHAR) AS dst,
        |    CASE w WHEN 0 THEN 'main link' WHEN 1 THEN 'old link'
        |      WHEN 2 THEN 'older link' WHEN 3 THEN 'mobile link'
        |      WHEN 4 THEN 'amp link'
        |      ELSE 'refresh link' END AS anchor
        |  FROM d),
        |counts AS (
        |  SELECT dst, count(*) AS n_links,
        |    count(DISTINCT doc_id) AS n_docs,
        |    count(DISTINCT anchor) AS n_anchors
        |  FROM edges GROUP BY dst),
        |pa AS (
        |  SELECT dst, anchor, count(*) AS cnt
        |  FROM edges GROUP BY dst, anchor),
        |rk AS (
        |  SELECT dst, anchor, cnt, row_number() OVER (
        |    PARTITION BY dst ORDER BY cnt DESC, anchor) AS rn
        |  FROM pa),
        |tops AS (
        |  SELECT dst, array_to_string(
        |    list(anchor ORDER BY cnt DESC, anchor), '|') AS anchors
        |  FROM rk WHERE rn <= 8 GROUP BY dst)
        |SELECT c.dst, c.n_links, c.n_docs, c.n_anchors, t.anchors
        |FROM counts c JOIN tops t USING (dst)
        |ORDER BY c.dst""".stripMargin,

    // Every resolved target re-derived ARITHMETICALLY (no resolver in
    // SQL — the from-text-twin convention): the engine's path to the
    // same strings runs through anchor extraction → effective-base
    // selection (<base href> on every 5th doc) → page-level meta
    // nofollow drop (±7 mod 11: ALL edges gone) → per-edge
    // rel=nofollow drop → RFC resolution → canonicalization. The /nf/
    // family NEVER appears here (edges really dropped), nofollow PAGES
    // contribute zero rows, and base-carrying docs' relative/rooted/
    // query-only targets land on the BASE origin/directory.
    "tx_link_edges" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(doc_id % 4 AS VARCHAR) AS h,
        |    CAST(doc_id % 3 AS VARCHAR) AS a,
        |    CAST(doc_id % 2 AS VARCHAR) AS b,
        |    CAST(doc_id % 50 AS VARCHAR) AS p,
        |    CAST(doc_id % 7 AS VARCHAR) AS k,
        |    (doc_id % 5 = 0) AS isb
        |  FROM documents
        |  WHERE doc_id % 11 <> 7),
        |d2 AS (
        |  SELECT *,
        |    CASE WHEN isb THEN 'https://bse' || a || '.com'
        |         ELSE 'https://site' || h || '.com' END AS org
        |  FROM d),
        |edges AS (
        |  SELECT doc_id,
        |    'https://ext' || k || '.com/x?a=1&b=2' AS dst,
        |    'ext & link' AS anchor FROM d2
        |  UNION ALL SELECT doc_id,
        |    'https://cdn.site' || h || '.com/lib', 'cdn lib' FROM d2
        |  UNION ALL SELECT doc_id,
        |    org || '/top/item' || p, 'rooted' FROM d2
        |  UNION ALL SELECT doc_id,
        |    org || CASE WHEN isb THEN '/bd' || b ELSE '/sec' || a END
        |      || '/up' || p,
        |    'up & away' FROM d2
        |  UNION ALL SELECT doc_id,
        |    org || CASE WHEN isb THEN '/bd' || b || '/sub/'
        |      ELSE '/sec' || a || '/sub' || b || '/page' || p END
        |      || '?page=2',
        |    'next page' FROM d2
        |  UNION ALL SELECT doc_id,
        |    org || '/keep' || p, 'kept & safe' FROM d2)
        |SELECT doc_id, dst, anchor FROM edges
        |ORDER BY doc_id, dst""".stripMargin,

    // The tx_link_edges arithmetic edge list aggregated by target:
    // exact in-link / referring-doc / distinct-anchor counts, and the
    // TOP-8 anchors by (count DESC, anchor ASC) — the bounded form
    // (r18 verdict #2); DuckDB re-derives the same top-k with the same
    // deterministic tiebreak via row_number + ordered list().
    "tx_anchor_corpus" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(doc_id % 4 AS VARCHAR) AS h,
        |    CAST(doc_id % 3 AS VARCHAR) AS a,
        |    CAST(doc_id % 2 AS VARCHAR) AS b,
        |    CAST(doc_id % 50 AS VARCHAR) AS p,
        |    CAST(doc_id % 7 AS VARCHAR) AS k,
        |    (doc_id % 5 = 0) AS isb
        |  FROM documents
        |  WHERE doc_id % 11 <> 7),
        |d2 AS (
        |  SELECT *,
        |    CASE WHEN isb THEN 'https://bse' || a || '.com'
        |         ELSE 'https://site' || h || '.com' END AS org
        |  FROM d),
        |edges AS (
        |  SELECT doc_id,
        |    'https://ext' || k || '.com/x?a=1&b=2' AS dst,
        |    'ext & link' AS anchor FROM d2
        |  UNION ALL SELECT doc_id,
        |    'https://cdn.site' || h || '.com/lib',
        |    'cdn lib ' || CAST(doc_id % 13 AS VARCHAR) FROM d2
        |  UNION ALL SELECT doc_id,
        |    org || '/top/item' || p, 'rooted' FROM d2
        |  UNION ALL SELECT doc_id,
        |    org || CASE WHEN isb THEN '/bd' || b ELSE '/sec' || a END
        |      || '/up' || p,
        |    'up & away' FROM d2
        |  UNION ALL SELECT doc_id,
        |    org || CASE WHEN isb THEN '/bd' || b || '/sub/'
        |      ELSE '/sec' || a || '/sub' || b || '/page' || p END
        |      || '?page=2',
        |    'next page' FROM d2
        |  UNION ALL SELECT doc_id,
        |    org || '/keep' || p, 'kept & safe' FROM d2),
        |counts AS (
        |  SELECT dst, count(*) AS n_links,
        |    count(DISTINCT doc_id) AS n_docs,
        |    count(DISTINCT anchor) AS n_anchors
        |  FROM edges GROUP BY dst),
        |pa AS (
        |  SELECT dst, anchor, count(*) AS cnt
        |  FROM edges GROUP BY dst, anchor),
        |rk AS (
        |  SELECT dst, anchor, cnt, row_number() OVER (
        |    PARTITION BY dst ORDER BY cnt DESC, anchor) AS rn
        |  FROM pa),
        |tops AS (
        |  SELECT dst, array_to_string(
        |    list(anchor ORDER BY cnt DESC, anchor), '|') AS anchors
        |  FROM rk WHERE rn <= 8 GROUP BY dst)
        |SELECT c.dst, c.n_links, c.n_docs, c.n_anchors, t.anchors
        |FROM counts c JOIN tops t USING (dst)
        |ORDER BY c.dst""".stripMargin,

    // The consolidated frontier re-derived: direct sightings normalize
    // onto the main URL by canonicalization alone; the v=3 sightings
    // must travel the redirect closure to land there (cycle families'
    // v=3 rows vanish — WHERE NOT).
    "tx_frontier_final" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 25 AS fam
        |  FROM documents
        |  WHERE NOT ((doc_id % 25) % 10 = 7 AND doc_id % 4 = 3))
        |SELECT
        |  'https://site' || CAST(fam % 4 AS VARCHAR) || '.com/art/'
        |    || CAST(fam AS VARCHAR) AS final_url,
        |  count(*) AS n_seen
        |FROM d GROUP BY fam ORDER BY final_url""".stripMargin,

    // The capstone re-derived arithmetically: the gates reduce to row
    // filters (w=3 redirect records, %11=5 noindex, %13=11 short), the
    // decoded text and its charset ROUTE follow from c=doc_id%6 alone
    // (the engine must sniff/detect its way to the same strings), and
    // every kept page's final URL is its family's main article — amp
    // pages only via canonical→redirect composition. min(clean) is a
    // bytewise string min in both engines (BMP text: UTF-8 byte order
    // = code-point order = UTF-16 order).
    "tx_crawl_corpus" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 25 AS fam, doc_id % 4 AS w,
        |    doc_id % 6 AS c
        |  FROM documents
        |  WHERE doc_id % 4 <> 3 AND doc_id % 11 <> 5
        |    AND doc_id % 13 <> 11),
        |t AS (
        |  SELECT fam, w,
        |    'Article ' || CAST(fam AS VARCHAR) || ' rev ' ||
        |      CAST(doc_id AS VARCHAR) || ' ' ||
        |      CASE WHEN c IN (1, 4) THEN 'café ±'
        |           WHEN c IN (2, 5) THEN '한국어 본문 내용'
        |           ELSE 'plain' END ||
        |      ' body content for the corpus quality gate' AS clean,
        |    CASE WHEN c IN (2, 5) THEN 'detected'
        |         WHEN c = 4 THEN 'fallback'
        |         WHEN c = 1 THEN 'header' ELSE 'default' END AS source
        |  FROM d)
        |SELECT
        |  'https://site' || CAST(fam % 4 AS VARCHAR) || '.com/art/'
        |    || CAST(fam AS VARCHAR) AS canon_url,
        |  count(*) AS n_crawls,
        |  count(DISTINCT w) AS n_pages,
        |  count(CASE WHEN source = 'detected' THEN 1 END) AS n_detected,
        |  count(CASE WHEN source = 'fallback' THEN 1 END) AS n_fallback,
        |  md5(min(clean)) AS text_md5
        |FROM t GROUP BY fam ORDER BY canon_url""".stripMargin,

    // The schedule re-derived: same canonical-URL frontier + rule
    // regexes, the meta oracle's delay CTE (agent '*'), per-host
    // row_number over (n_seen DESC, url), integer deci-second offsets.
    "tx_frontier_schedule" ->
      (s"""WITH ${robotsRulesCtes()},
         |""".stripMargin +
      raw"""delays AS (
        |  SELECT host, min(CASE WHEN regexp_matches(g.value,
        |      '^[0-9]+(\.[0-9]+)?$$') THEN CAST(g.value AS DOUBLE) END)
        |    AS crawl_delay
        |  FROM grp g JOIN selg USING (host, group_id)
        |  WHERE g.key = 'crawl-delay' GROUP BY host),
        |docs2 AS (
        |  SELECT doc_id, doc_id % 4 AS h,
        |    (CASE WHEN CAST((doc_id // 4) % 2 AS INTEGER) = 0
        |       THEN '/item/' ELSE '/private/' END)
        |      || CAST(doc_id % 100 AS VARCHAR) || '?ref=sm' AS pathq
        |  FROM documents),
        |canon AS (
        |  SELECT doc_id,
        |    'https://site' || CAST(h AS VARCHAR) || '.com' || pathq AS url,
        |    'site' || CAST(h AS VARCHAR) || '.com' AS host,
        |    pathq AS path
        |  FROM docs2),
        |m AS (
        |  SELECT c.doc_id, c.url, c.host, c.path,
        |    r.prefix, r.rule, length(r.prefix) AS plen
        |  FROM canon c LEFT JOIN rules r
        |    ON c.host = r.host AND regexp_matches(c.path, r.regex)),
        |best AS (
        |  SELECT doc_id, url, host,
        |    max(CASE WHEN prefix IS NOT NULL THEN struct_pack(
        |      plen := plen, is_allow := (rule = 'allow'), prefix := prefix)
        |      END) AS b
        |  FROM m GROUP BY doc_id, url, host),
        |fr AS (
        |  SELECT url, host, count(*) AS n_seen
        |  FROM best WHERE coalesce(b.is_allow, true) GROUP BY url, host),
        |sched AS (
        |  SELECT f.url, f.host, f.n_seen,
        |    CAST(row_number() OVER (PARTITION BY f.host
        |      ORDER BY f.n_seen DESC, f.url) - 1 AS INTEGER) AS rank,
        |    coalesce(d.crawl_delay, 1.0) AS delay
        |  FROM fr f LEFT JOIN delays d ON f.host = d.host)
        |SELECT url, host, n_seen, rank,
        |  rank * CAST(round(delay * 10) AS BIGINT) AS fetch_offset_ds
        |FROM sched ORDER BY url""".stripMargin),

    // The recrawl schedule re-derived: the frontier CTEs with a
    // date-only epoch (date-days·86400), priority = n_seen·30 +
    // epoch-days, per-host row_number over (priority DESC, url).
    "tx_frontier_recrawl" ->
      (s"""WITH ${robotsRulesCtes()},
         |""".stripMargin +
      raw"""delays AS (
        |  SELECT host, min(CASE WHEN regexp_matches(g.value,
        |      '^[0-9]+(\.[0-9]+)?$$') THEN CAST(g.value AS DOUBLE) END)
        |    AS crawl_delay
        |  FROM grp g JOIN selg USING (host, group_id)
        |  WHERE g.key = 'crawl-delay' GROUP BY host),
        |docs2 AS (
        |  SELECT doc_id, doc_id % 4 AS h,
        |    (CASE WHEN CAST((doc_id // 4) % 2 AS INTEGER) = 0
        |       THEN '/item/' ELSE '/private/' END)
        |      || CAST(doc_id % 100 AS VARCHAR) || '?ref=sm' AS pathq,
        |    doc_id % 100 % 9 + 1 AS mth
        |  FROM documents),
        |canon AS (
        |  SELECT doc_id,
        |    'https://site' || CAST(h AS VARCHAR) || '.com' || pathq AS url,
        |    'site' || CAST(h AS VARCHAR) || '.com' AS host,
        |    pathq AS path,
        |    CAST(date_diff('day', DATE '1970-01-01',
        |      CAST(strptime('2026-0' || CAST(mth AS VARCHAR) || '-01',
        |        '%Y-%m-%d') AS DATE)) AS BIGINT) * 86400 AS ep
        |  FROM docs2),
        |m AS (
        |  SELECT c.doc_id, c.url, c.host, c.path, c.ep,
        |    r.prefix, r.rule, length(r.prefix) AS plen
        |  FROM canon c LEFT JOIN rules r
        |    ON c.host = r.host AND regexp_matches(c.path, r.regex)),
        |best AS (
        |  SELECT doc_id, url, host, ep,
        |    max(CASE WHEN prefix IS NOT NULL THEN struct_pack(
        |      plen := plen, is_allow := (rule = 'allow'), prefix := prefix)
        |      END) AS b
        |  FROM m GROUP BY doc_id, url, host, ep),
        |fr AS (
        |  SELECT url, host, count(*) AS n_seen, min(ep) AS first_epoch
        |  FROM best WHERE coalesce(b.is_allow, true) GROUP BY url, host),
        |pri AS (
        |  SELECT *, n_seen * 30 +
        |    CAST(floor(first_epoch / 86400.0) AS BIGINT) AS priority
        |  FROM fr),
        |sched AS (
        |  SELECT p.url, p.host, p.n_seen, p.first_epoch, p.priority,
        |    CAST(row_number() OVER (PARTITION BY p.host
        |      ORDER BY p.priority DESC, p.url) - 1 AS INTEGER) AS rank,
        |    coalesce(d.crawl_delay, 1.0) AS delay
        |  FROM pri p LEFT JOIN delays d ON p.host = d.host)
        |SELECT url, host, n_seen, first_epoch, priority, rank,
        |  rank * CAST(round(delay * 10) AS BIGINT) AS fetch_offset_ds
        |FROM sched ORDER BY url""".stripMargin),

    // Re-derived from the VALUES bodies + documents alone (never sees
    // XML or gzip): per-host announced-sitemap counts multiply the
    // group sizes, rule regexes gate, and each lastmod form reduces to
    // its epoch by integer math (date-days·86400 + time − offset).
    "tx_frontier_discover" ->
      (s"""WITH ${robotsRulesCtes()},
         |""".stripMargin +
      """smn AS (
        |  SELECT host, count(DISTINCT value) AS n_sm FROM kept
        |  WHERE key = 'sitemap' AND value <> '' GROUP BY host),
        |docs2 AS (
        |  SELECT doc_id, doc_id % 4 AS h,
        |    (CASE WHEN CAST((doc_id // 4) % 2 AS INTEGER) = 0
        |       THEN '/item/' ELSE '/private/' END)
        |      || CAST(doc_id % 100 AS VARCHAR) || '?ref=sm' AS pathq,
        |    doc_id % 100 % 9 + 1 AS mth,
        |    doc_id % 3 AS f
        |  FROM documents),
        |epochs AS (
        |  SELECT doc_id, h, pathq,
        |    CAST(date_diff('day', DATE '1970-01-01',
        |      CAST(strptime('2026-0' || CAST(mth AS VARCHAR) || '-01',
        |        '%Y-%m-%d') AS DATE)) AS BIGINT) * 86400
        |    + CASE CAST(f AS INTEGER) WHEN 0 THEN 0
        |        WHEN 1 THEN 900 - 32400 ELSE 23400 END AS ep
        |  FROM docs2),
        |canon AS (
        |  SELECT doc_id,
        |    'https://site' || CAST(h AS VARCHAR) || '.com' || pathq AS url,
        |    'site' || CAST(h AS VARCHAR) || '.com' AS host,
        |    pathq AS path, ep
        |  FROM epochs),
        |m AS (
        |  SELECT c.doc_id, c.url, c.host, c.path, c.ep,
        |    r.prefix, r.rule, length(r.prefix) AS plen
        |  FROM canon c LEFT JOIN rules r
        |    ON c.host = r.host AND regexp_matches(c.path, r.regex)),
        |best AS (
        |  SELECT doc_id, url, host, ep,
        |    max(CASE WHEN prefix IS NOT NULL THEN struct_pack(
        |      plen := plen, is_allow := (rule = 'allow'), prefix := prefix)
        |      END) AS b
        |  FROM m GROUP BY doc_id, url, host, ep)
        |SELECT t.url, count(*) * s.n_sm AS n_seen,
        |  min(t.ep) AS first_epoch
        |FROM best t JOIN smn s ON t.host = s.host
        |WHERE coalesce(t.b.is_allow, true)
        |GROUP BY t.url, s.n_sm
        |ORDER BY t.url""".stripMargin),

    // Both branches re-derived from TEXT only (the mm_png_roundtrip
    // pixel/bit derivation for the image branch, md5/octet_length for
    // the text branch); the engine's path to the same values runs
    // through WARC write → gzip → gunzip → parse → Content-Type route →
    // real PNG decode.
    "tx_warc_media" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, text, length(text) AS L
        |  FROM documents WHERE doc_id % 5 = 0),
        |cells AS (
        |  SELECT media_id, i,
        |    ('0x' || substr(md5(substr(text, CAST((i * L) // 66 AS INTEGER) + 1,
        |       CAST(((i + 1) * L) // 66 AS INTEGER)
        |         - CAST((i * L) // 66 AS INTEGER))), 1, 2))::BIGINT AS px
        |  FROM m, range(0, 66) t(i)),
        |bits AS (
        |  SELECT a.media_id,
        |    CASE WHEN b.px > a.px
        |      THEN 1::BIGINT << CAST((a.i // 11) * 10 + (a.i % 11) AS INTEGER)
        |      ELSE 0::BIGINT END AS p
        |  FROM cells a JOIN cells b
        |    ON b.media_id = a.media_id AND b.i = a.i + 1
        |  WHERE a.i % 11 < 10),
        |h AS (SELECT media_id, CAST(sum(p) AS BIGINT) AS ph
        |      FROM bits GROUP BY media_id),
        |img AS (
        |  SELECT media_id, 'image' AS kind,
        |    CAST(11 * (media_id % 3 + 1) AS INTEGER) AS dim1,
        |    CAST(6 * (media_id % 3 + 1) AS INTEGER) AS dim2,
        |    printf('%016x', ph) AS sig
        |  FROM h),
        |txt AS (
        |  SELECT doc_id AS media_id, 'text' AS kind,
        |    CAST(octet_length(encode(text)) AS INTEGER) AS dim1,
        |    0 AS dim2, md5(text) AS sig
        |  FROM documents WHERE doc_id % 5 <> 0)
        |SELECT * FROM (SELECT * FROM img UNION ALL SELECT * FROM txt)
        |ORDER BY media_id""".stripMargin,

    // Re-derives the record fields from text only; the engine's path to
    // the same values runs through WARC write → gzip → gunzip → parse.
    "tx_warc_roundtrip" ->
      """SELECT 'https://ex.com/doc/' || CAST(doc_id AS VARCHAR) AS uri,
        |  md5(text) AS body_md5,
        |  CAST(octet_length(encode(text)) AS INTEGER) AS body_len
        |FROM documents ORDER BY uri""".stripMargin,

    // Every decoded page re-derived from doc_id arithmetic (the oracle
    // never sees bytes, a container, or a charset): the engine's path
    // to the same strings runs through per-charset byte ENCODING →
    // WARC+gzip → parse → BOM/header/meta/strict-UTF-8 sniff → decode.
    // The md5 matches only if the non-ASCII chars survived each
    // charset's byte round trip — including the mislabeled case 3,
    // where trusting the utf-8 header would corrupt é/± into
    // replacement garbage.
    "tx_warc_charset" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    'Doc ' || CAST(doc_id AS VARCHAR) || ' café ±' AS txt,
        |    CAST(doc_id % 10 AS INTEGER) AS c
        |  FROM documents),
        |shaped AS (
        |  SELECT doc_id,
        |    CASE c WHEN 2 THEN '<meta charset="iso-8859-1">' || txt
        |      WHEN 6 THEN '문서 ' || CAST(doc_id AS VARCHAR) || ' 한국어'
        |      WHEN 7 THEN '文档 ' || CAST(doc_id AS VARCHAR)
        |        || ' 中文全文内容测试'
        |      WHEN 8 THEN '文件 ' || CAST(doc_id AS VARCHAR)
        |        || ' 中文全文內容測試'
        |      WHEN 9 THEN 'Doc ' || CAST(doc_id AS VARCHAR) || ' don'
        |        || chr(146) || 't won' || chr(146) || 't can'
        |        || chr(146) || 't stop the test page body with plain'
        |        || ' ascii filler text to keep density low'
        |      ELSE txt END AS text,
        |    CASE c WHEN 0 THEN 'utf-8' WHEN 4 THEN 'utf-8'
        |      WHEN 5 THEN 'utf-16le' WHEN 6 THEN 'euc-kr'
        |      WHEN 7 THEN 'gb18030' WHEN 8 THEN 'big5'
        |      ELSE 'iso-8859-1' END AS charset,
        |    CASE c WHEN 0 THEN 'default' WHEN 1 THEN 'header'
        |      WHEN 2 THEN 'meta' WHEN 3 THEN 'fallback'
        |      WHEN 6 THEN 'detected' WHEN 7 THEN 'detected'
        |      WHEN 8 THEN 'detected' WHEN 9 THEN 'fallback'
        |      ELSE 'bom' END AS source
        |  FROM base)
        |SELECT doc_id, charset, source,
        |  CAST(length(text) AS INTEGER) AS n_chars,
        |  md5(text) AS text_md5
        |FROM shaped ORDER BY doc_id""".stripMargin,

    // The funnel re-derived: same markup/URL fixtures, same regex
    // extraction pipeline, same gates, same keep-first collapse. The
    // robots-meta gate reduces to the ±3 (mod 7) row filter — the
    // noindex docs the Spark side must drop by PARSING its metas (the
    // ±2 robots index,follow and ±1 description-decoy docs carry metas
    // too and must survive; a substring or name-blind matcher would
    // cut them and hash-mismatch here).
    "tx_web_corpus" ->
      s"""WITH src AS (
         |  SELECT doc_id,
         |    ${fixtureHtmlSql("D")}
         |      AS html,
         |    'HTTPS://WWW.Site' || CAST(doc_id % 50 AS VARCHAR)
         |    || '.COM:443/page/' || CAST(doc_id % 200 AS VARCHAR)
         |    || '?utm_source=crawl' || CAST(doc_id AS VARCHAR)
         |    || '&ref=r#Sec' || CAST(doc_id % 3 AS VARCHAR) AS u
         |  FROM documents),
         |ext AS (
         |  SELECT doc_id,
         |    regexp_replace(regexp_replace(regexp_replace(
         |      regexp_replace(regexp_replace(regexp_replace(
         |      regexp_replace(
         |        lower(regexp_extract(u,
         |          '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', 0))
         |        || regexp_replace(u,
         |             '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', ''),
         |      '#.*', ''),
         |      '^(https://[^/:?#]*):443([/?#]|$$)', '\\1\\2'),
         |      '^(http://[^/:?#]*):80([/?#]|$$)', '\\1\\2'),
         |      '^(https?://)www\\.', '\\1'),
         |      '&utm_[^&#]*', '', 'g'),
         |      '\\?utm_[^&#]*&', '?'),
         |      '\\?utm_[^&#]*$$', '') AS canon_url,
         |    ${htmlTextSql("html")} AS clean,
         |    ${htmlTextSql(anchorsJoinedSql("html", " "))} AS linkclean
         |  FROM src),
        |scored AS (
        |  SELECT doc_id, canon_url, clean,
        |    CAST(floor(length(linkclean) * 10000.0
        |      / greatest(length(clean), 1)) AS INTEGER) AS ld_bp
        |  FROM ext),
        |gated AS (
        |  SELECT * FROM scored
        |  WHERE ld_bp < 800 AND length(clean) >= 150 AND doc_id % 7 <> 3),
        |kept AS (
        |  SELECT canon_url, min(doc_id) AS doc_id, count(*) AS n_crawls
        |  FROM gated GROUP BY canon_url)
        |SELECT k.canon_url, k.doc_id, k.n_crawls,
        |  md5(g.clean) AS text_md5, g.ld_bp
        |FROM kept k JOIN gated g ON g.doc_id = k.doc_id
        |ORDER BY k.canon_url""".stripMargin
  )
}
