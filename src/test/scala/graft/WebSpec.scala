package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Web

/** [[graft.operators.Web]] — HTML extraction + URL canonicalization edge
  * cases the fixture-driven oracles don't reach: script-content leaks,
  * port-before-query, utm-only query strings, hosts without a dot. */
class WebSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def one(in: String, c: org.apache.spark.sql.Column => org.apache.spark.sql.Column): String = {
    val df = spark.createDataFrame(Seq(Tuple1(in))).toDF("u")
    df.select(c(col("u")).as("out")).collect()(0).getString(0)
  }

  test("htmlText drops script/style/comment CONTENT (not just tags), " +
      "decodes entities, collapses whitespace") {
    val html = "<html><body><script>var secret = 1;</script>" +
      "<style>.x { color: red }</style><!-- hidden -->" +
      "<p>Hello   &amp;\n <b>world</b>&nbsp;&lt;ok&gt;</p></body></html>"
    val got = one(html, Web.htmlText)
    assert(got == "Hello & world <ok>")
    assert(!got.contains("secret") && !got.contains("color") &&
      !got.contains("hidden"))
  }

  test("htmlText is case-insensitive on tags and decodes &amp; LAST: " +
      "<SCRIPT> content never leaks, escaped entities stay literal") {
    val html = "<SCRIPT>var secret = 1;</SCRIPT><STYLE>.x{}</STYLE>" +
      "<P>shows &amp;lt; as text</P><A HREF=\"/x\">Go</A><a>bare</a>"
    val got = one(html, Web.htmlText)
    assert(!got.contains("secret") && !got.contains(".x{}"),
      s"uppercase subtree leaked: '$got'")
    // &amp;lt; is the TEXT '&lt;', not the markup '<'
    assert(got.contains("shows &lt; as text"), s"double-decoded: '$got'")
    // anchors: uppercase and attribute-less forms both captured
    val anchors = spark.createDataFrame(Seq(Tuple1(html))).toDF("u")
      .select(Web.anchorTexts(col("u")).as("a")).collect()(0)
      .getSeq[String](0)
    assert(anchors == Seq("Go", "bare"), s"anchors: $anchors")
  }

  test("linkDensityBp is commensurate: an image-only anchor contributes " +
      "its visible text (none), and the ratio never exceeds 10000") {
    def bp(h: String): Int = {
      val df = spark.createDataFrame(Seq(Tuple1(h))).toDF("u")
      df.select(Web.linkDensityBp(col("u")).as("b")).collect()(0).getInt(0)
    }
    assert(bp("<a href=\"/x\"><img src=\"/y.png\"></a><p>hi</p>") == 0)
    val allLinks = "<a href=\"/x\">every single char is anchor text</a>"
    assert(bp(allLinks) <= 10000 && bp(allLinks) > 9000)
  }

  test("linkDensityBp: boilerplate-heavy page scores high, prose low, " +
      "zero anchors give 0") {
    val nav = "<body>" + ("<a href=\"/x\">Section link text</a>" * 8) +
      "<p>hi</p></body>"
    val prose = "<body><p>" + ("lorem ipsum dolor sit amet " * 20) +
      "</p><a href=\"/x\">more</a></body>"
    def bp(h: String): Int = {
      val df = spark.createDataFrame(Seq(Tuple1(h))).toDF("u")
      df.select(Web.linkDensityBp(col("u")).as("b")).collect()(0).getInt(0)
    }
    assert(bp(nav) > 3000, s"nav page scored ${bp(nav)}")
    assert(bp(prose) < 1000, s"prose scored ${bp(prose)}")
    assert(bp("<p>plain</p>") == 0)
  }

  test("canonicalUrl: case, www, default ports (incl. port-before-query " +
      "and bare-authority), fragments, and utm params in every position") {
    val cases = Seq(
      "HTTPS://WWW.Example.COM:443/Path?a=1#f" ->
        "https://example.com/Path?a=1",
      "https://example.com:443?q=1" -> "https://example.com?q=1",
      "http://Example.com:80" -> "http://example.com",
      "http://example.com:8080/x" -> "http://example.com:8080/x", // non-default kept
      "https://a.com/p?utm_source=x" -> "https://a.com/p",
      "https://a.com/p?utm_a=1&utm_b=2" -> "https://a.com/p",
      "https://a.com/p?utm_a=1&id=2&utm_b=3&z=4" -> "https://a.com/p?id=2&z=4",
      "https://a.com/p?id=2" -> "https://a.com/p?id=2", // untouched
      // path/query case is resource-significant and survives
      "HTTP://A.com/CaseSensitive?Q=Vv" -> "http://a.com/CaseSensitive?Q=Vv")
    cases.foreach { case (in, want) =>
      assert(one(in, Web.canonicalUrl) == want, s"for $in")
    }
  }

  test("property (seeded): canonicalUrl is IDEMPOTENT and scrubs every " +
      "utm param on 300 randomized URL assemblies — one DataFrame pass") {
    val rnd = new scala.util.Random(8161515L)
    def casey(s: String) =
      s.map(c => if (rnd.nextBoolean()) c.toUpper else c)
    val urls = (0 until 300).map { i =>
      val scheme = casey(if (rnd.nextBoolean()) "https" else "http")
      val www = if (rnd.nextBoolean()) casey("www.") else ""
      val host = casey(s"site$i.example.com")
      val port = rnd.nextInt(4) match {
        case 0 => if (scheme.equalsIgnoreCase("https")) ":443" else ":80"
        case 1 => ":8443"
        case _ => ""
      }
      val path = if (rnd.nextBoolean()) s"/P$i/Item" else ""
      val params = new scala.util.Random(i).shuffle(List(
        s"utm_source=s$i", s"id=$i", s"utm_medium=m", s"Ref=R$i"))
        .take(1 + rnd.nextInt(4))
      val query = if (params.nonEmpty) "?" + params.mkString("&") else ""
      val frag = if (rnd.nextBoolean()) s"#Frag$i" else ""
      s"$scheme://$www$host$port$path$query$frag"
    }
    val df = spark.createDataFrame(urls.map(Tuple1(_))).toDF("u")
    val out = df.select(col("u"),
        Web.canonicalUrl(col("u")).as("c1"),
        Web.canonicalUrl(Web.canonicalUrl(col("u"))).as("c2"))
      .collect()
    out.foreach { r =>
      val (u, c1, c2) = (r.getString(0), r.getString(1), r.getString(2))
      assert(c1 == c2, s"not idempotent for $u: '$c1' -> '$c2'")
      assert(!c1.contains("utm_"), s"utm survived for $u: '$c1'")
      assert(!c1.contains("#"), s"fragment survived for $u: '$c1'")
      val prefix = c1.takeWhile(_ != '/') // scheme + ':'
      assert(prefix == prefix.toLowerCase, s"prefix case for $u: '$c1'")
      assert(!c1.matches("^https://[^/:?#]*:443([/?#].*|$)") &&
        !c1.matches("^http://[^/:?#]*:80([/?#].*|$)"),
        s"default port survived for $u: '$c1'")
      // non-utm params survive with their values intact
      val idIn = "[?&]id=([0-9]+)".r
        .findFirstMatchIn(u.replaceAll("utm_[^&#]*", ""))
      idIn.foreach(m =>
        assert(c1.contains("id=" + m.group(1)), s"id param lost for $u"))
    }
  }

  test("urlHost / registrableDomain: subdomains collapse to the last two " +
      "labels; dotless hosts pass through") {
    assert(one("https://a.b.example.com/x", Web.urlHost) == "a.b.example.com")
    val df = spark.createDataFrame(Seq(
      Tuple1("a.b.example.com"), Tuple1("example.com"), Tuple1("localhost")))
      .toDF("h")
    val got = df.select(Web.registrableDomain(col("h")).as("d"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("example.com", "example.com", "localhost"))
  }

  test("registrableDomainPsl: multi-label public suffixes resolve exactly " +
      "(the cases the two-label approximation gets wrong), unknown TLDs " +
      "fall back (source says so), duplicate hosts resolve once") {
    val hosts = spark.createDataFrame(Seq(
      "a.b.example.co.uk", "deep.sub.shop.co.uk", "www.example.com",
      "www.example.com", // duplicate — the mapping must stay distinct
      "example.internal", "single").map(Tuple1(_))).toDF("host")
    val psl = spark.createDataFrame(Seq("com", "co.uk").map(Tuple1(_)))
      .toDF("suffix")
    val rows = graft.operators.Web
      .registrableDomainPsl(hosts, "host", psl).collect()
    val got = rows.map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map(
      "a.b.example.co.uk" -> "example.co.uk",
      "deep.sub.shop.co.uk" -> "shop.co.uk",
      "www.example.com" -> "example.com",
      "example.internal" -> "example.internal", // two-label fallback
      "single" -> "single"))
    val src = rows.map(r => r.getString(0) -> r.getString(2)).toMap
    assert(src("a.b.example.co.uk") == "psl" && src("single") == "fallback" &&
      src("example.internal") == "fallback")
    // distinct mapping: the duplicate host yields ONE row
    assert(rows.length == 5)
  }

  test("registrableDomainPsl: wildcard (*.ck) and exception (!www.ck) " +
      "rules follow the PSL algorithm, and a host that IS a public " +
      "suffix has NO registrable domain (NULL, never itself)") {
    val hosts = spark.createDataFrame(Seq(
      "foo.bar.ck", "x.foo.bar.ck", "bar.ck", "www.ck", "sub.www.ck",
      "co.uk", "uk", "example.co.uk").map(Tuple1(_))).toDF("host")
    val psl = spark.createDataFrame(
      Seq("uk", "co.uk", "*.ck", "!www.ck").map(Tuple1(_))).toDF("suffix")
    val rows = graft.operators.Web
      .registrableDomainPsl(hosts, "host", psl).collect()
    val got = rows.map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got == Map(
      // *.ck: bar.ck is a public suffix → foo.bar.ck registers under it
      "foo.bar.ck" -> Some("foo.bar.ck"),
      "x.foo.bar.ck" -> Some("foo.bar.ck"),
      "bar.ck" -> None, // host IS a (wildcard) public suffix
      // !www.ck carves www.ck back out: its public suffix is ck
      "www.ck" -> Some("www.ck"),
      "sub.www.ck" -> Some("www.ck"),
      "co.uk" -> None, // host IS a plain public suffix
      "uk" -> None,
      "example.co.uk" -> Some("example.co.uk")))
    assert(rows.forall(_.getString(2) == "psl"))
  }

  test("property (seeded): registrableDomainPsl matches a direct " +
      "per-host PSL-algorithm evaluation over 300 random hosts against " +
      "a rule set with plain/wildcard/exception rules — one DataFrame " +
      "pass vs the spec'd reference semantics") {
    val rules = Seq("com", "org", "co.uk", "uk", "com.au",
      "*.ck", "!www.ck", "*.nom.br", "!city.kobe.jp", "*.kobe.jp", "jp")
    // reference implementation, straight from the published algorithm:
    // all matching rules; exception prevails (minus leading label),
    // else most labels; registrable = public suffix + 1 label; host ==
    // public suffix → None; no match → caller's fallback
    def ref(host: String): Option[(Option[String], String)] = {
      val labels = host.split('.')
      val suffixes = labels.indices.map(i => labels.drop(i).mkString("."))
      def labelsOf(s: String) = s.split('.').length
      val exc = suffixes.filter(s => rules.contains("!" + s))
        .map(s => labelsOf(s) - 1)
      val norm = suffixes.filter(rules.contains).map(labelsOf) ++
        suffixes.filter { s =>
          val l = s.split('.')
          l.length >= 2 && rules.contains("*." + l.drop(1).mkString("."))
        }.map(labelsOf)
      val ps = if (exc.nonEmpty) Some(exc.max)
        else if (norm.nonEmpty) Some(norm.max) else None
      ps.map { p =>
        if (p == labels.length) (None, "psl")
        else (Some(labels.takeRight(p + 1).mkString(".")), "psl")
      }
    }
    val rnd = new scala.util.Random(8161600L)
    val tlds = Seq("com", "org", "net", "uk", "co.uk", "ck", "www.ck",
      "nom.br", "x.nom.br", "kobe.jp", "city.kobe.jp", "foo.kobe.jp", "jp")
    val hosts = (0 until 300).map { i =>
      val depth = rnd.nextInt(3)
      val subs = (0 until depth).map(d => s"s$d${i % 7}")
      (subs :+ tlds(rnd.nextInt(tlds.length))).mkString(".")
    }.distinct
    val hostsDf = spark.createDataFrame(hosts.map(Tuple1(_))).toDF("host")
    val pslDf = spark.createDataFrame(rules.map(Tuple1(_))).toDF("suffix")
    val got = graft.operators.Web.registrableDomainPsl(hostsDf, "host", pslDf)
      .collect()
      .map(r => r.getString(0) -> (Option(r.getString(1)), r.getString(2)))
      .toMap
    assert(got.size == hosts.size)
    hosts.foreach { h =>
      val want = ref(h).getOrElse {
        val l = h.split('.')
        (Some(if (l.length >= 2) l.takeRight(2).mkString(".") else h),
          "fallback")
      }
      assert(got(h) == want, s"host $h: got ${got(h)}, want $want")
    }
  }

  test("plan: registrableDomainPsl joins the rule relation as BROADCAST " +
      "hash joins (never a sort-merge — the host table must not shuffle " +
      "for the suffix match at lake scale)") {
    val hosts = spark.createDataFrame(
      (0 until 100).map(i => Tuple1(s"a$i.b.example.co.uk"))).toDF("host")
    val psl = spark.createDataFrame(Seq("com", "co.uk").map(Tuple1(_)))
      .toDF("suffix")
    val plan = graft.operators.Web.registrableDomainPsl(hosts, "host", psl)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast joins:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"unexpected SMJ:\n$plan")
  }

  test("anchorTexts / htmlText tag boundaries: newline- and tab-separated " +
      "attributes match (r15 verdict #1 — the link-farm page whose " +
      "anchors break lines), custom tags (<a-widget>, <scriptfoo>) do " +
      "not match as anchor/script starts") {
    val farm = "<body>" +
      "<a\nhref=\"/1\">one link</a><a\thref=\"/2\">two link</a>" +
      "<a\r\nclass=\"x\"\nhref=\"/3\">three link</a><p>hi</p></body>"
    val anchors = spark.createDataFrame(Seq(Tuple1(farm))).toDF("u")
      .select(Web.anchorTexts(col("u")).as("a")).collect()(0)
      .getSeq[String](0)
    assert(anchors == Seq("one link", "two link", "three link"),
      s"anchors: $anchors")
    val df = spark.createDataFrame(Seq(Tuple1(farm))).toDF("u")
    val bp = df.select(Web.linkDensityBp(col("u")).as("b"))
      .collect()(0).getInt(0)
    assert(bp > 3000, s"line-broken link farm scored $bp bp")
    // custom elements are NOT script/anchor: content survives, text kept
    val custom = "<scriptfoo>keep me</scriptfoo><a-widget>and me</a-widget>" +
      "<script\ntype=\"module\">drop();</script>"
    val got = one(custom, Web.htmlText)
    assert(got == "keep me and me", s"got '$got'")
    val ca = spark.createDataFrame(Seq(Tuple1("<a-widget>w</a-widget>" +
        "<a>real</a>"))).toDF("u")
      .select(Web.anchorTexts(col("u")).as("a")).collect()(0)
      .getSeq[String](0)
    assert(ca == Seq("real"), s"custom tag matched as anchor: $ca")
  }

  test("tag strip is quote-aware: a '>' inside a quoted attribute value " +
      "does not split the tag (no 'b\">' debris in the corpus text); an " +
      "unterminated quote leaves the malformed tag visible instead of " +
      "eating the rest of the document") {
    assert(one("<div data-x=\"a>b\">keep</div>", Web.htmlText) == "keep")
    assert(one("<img alt='5 > 3'><p>text</p>", Web.htmlText) == "text")
    // plain-text comparison operators between tags survive
    assert(one("<p>a &lt; b</p> stray > here", Web.htmlText) ==
      "a < b stray > here")
    // unterminated quote: the tag fails to match and stays visible —
    // the following text is NOT swallowed
    val got = one("<a href=\"broken>rest of doc</p>", Web.htmlText)
    assert(got.contains("rest of doc"), s"text swallowed: '$got'")
  }

  test("anchor/script OPEN tags are quote-aware too (r16 ADVICE): a '>' " +
      "inside a quoted attribute value neither truncates the anchor " +
      "text capture nor leaks script content") {
    // the naive open-tag walk captured 'y\">text' here
    val anchors = spark.createDataFrame(Seq(Tuple1(
        "<a href=\"x>y\">text</a><a title='5 > 3'\nhref=\"/z\">two</a>")))
      .toDF("u")
      .select(Web.anchorTexts(col("u")).as("a")).collect()(0)
      .getSeq[String](0)
    assert(anchors == Seq("text", "two"), s"anchors: $anchors")
    // script subtree with a quoted '>' in its attributes still strips
    val got = one("<script data-x=\"a>b\">var secret = 1;</script>" +
      "<p>keep</p>", Web.htmlText)
    assert(got == "keep", s"script leaked: '$got'")
    // bare and whitespace-attribute forms unchanged
    assert(one("<a>plain</a>", Web.htmlText) == "plain")
    val ld = spark.createDataFrame(Seq(Tuple1(
        "<a href=\"x>y\">text</a><p>prose prose prose</p>"))).toDF("u")
      .select(Web.linkDensityBp(col("u")).as("b")).collect()(0).getInt(0)
    // numerator is 'text' (4 chars), not attribute debris
    assert(ld > 0 && ld < 3000, s"link density $ld")
  }

  test("htmlText entity decode: numeric (&#39;) and hex (&#x27;) " +
      "references and the common named set decode; double-escaped " +
      "forms (&amp;#39;, &#38;amp;) stay literal entity TEXT") {
    assert(one("<p>it&#39;s &#x27;q&#X27; &apos;ok&rsquo;</p>",
      Web.htmlText) == "it's 'q&#X27; 'ok’") // capital X: not in table
    assert(one("<p>a &ndash; b &mdash; c&hellip; 5&deg; &copy;X</p>",
      Web.htmlText) == "a – b — c… 5° ©X")
    // ampersand forms decode in ONE pass, never re-scanning output:
    assert(one("&amp;#39; and &#38;amp; and &#x26;lt;", Web.htmlText) ==
      "&#39; and &amp; and &lt;")
    assert(one("&#38; plain &#x26; amps &amp; too", Web.htmlText) ==
      "& plain & amps & too")
  }

  test("plan: tx_web_corpus pays exactly ONE hash shuffle (the keep-first " +
      "group); the join-back is broadcast and the regex extraction is " +
      "map-side partial-agg input — the 100 TB shape") {
    val df = SparkEntry.queries("tx_web_corpus")(spark, TestSpark.sfDir)
    val plan = df.queryExecution.executedPlan.toString
    val hashExchanges = plan.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning")
    assert(hashExchanges == 1,
      s"expected exactly one hash shuffle, found $hashExchanges:\n$plan")
    assert(plan.contains("BroadcastHashJoin") &&
      !plan.contains("SortMergeJoin"),
      s"join-back must be broadcast:\n$plan")
    // the only aggregate pair is partial-below-exchange / final-above it:
    // the extraction feeds partial_min/partial_count map-side
    assert(plan.contains("partial_min"), s"no map-side partial agg:\n$plan")
  }

  test("tx_web_corpus funnel: gates really cut rows, re-crawls really " +
      "collapse (some page has n_crawls > 1), and every kept doc_id is " +
      "the earliest crawl of its page") {
    val got = SparkEntry.queries("tx_web_corpus")(spark, TestSpark.sfDir)
      .collect()
    val total = Tables.load(spark, TestSpark.sfDir, "documents").count()
    assert(got.nonEmpty && got.length < total,
      s"funnel kept ${got.length} of $total — nothing was cut")
    assert(got.exists(_.getLong(2) > 1), "no page shows a collapsed re-crawl")
    // keep-first: the kept doc_id is the min over its page (doc_id % 200
    // identifies the page in the fixture)
    got.foreach { r =>
      assert(r.getLong(1) % 200 ==
        got.filter(_.getString(0) == r.getString(0)).map(_.getLong(1)).min % 200)
    }
    val pages = got.map(_.getString(0)).distinct
    assert(pages.length == got.length, "canonical URLs must be unique rows")
    // robots-meta compliance (r17 task #4): no noindex doc (±3 mod 7)
    // survives as a kept crawl, while the ±2 (robots index,follow) and
    // ±1 (description decoy saying noindex) docs are still eligible
    assert(!got.exists(_.getLong(1) % 7 == 3),
      "a noindex page leaked into the corpus")
    assert(got.exists(_.getLong(1) % 7 == 2) &&
      got.exists(_.getLong(1) % 7 == 1),
      "meta-carrying docs that are NOT robots-noindex were over-cut")
  }

  test("robots.txt: RFC 9309 group semantics — consecutive User-agent " +
      "lines share a group, only *-groups apply, longest rule wins, " +
      "allow wins length ties, empty Disallow drops, wildcard rules " +
      "MATCH (§2.2.3), hosts without a *-group (or without robots) are " +
      "allow-all") {
    import graft.operators.Web
    val robots = spark.createDataFrame(Seq(
      ("a.com", "User-agent: *\nDisallow: /private/\nAllow: /private/ok\n" +
        "\nUser-agent: evilbot\nDisallow: /"),
      ("b.com", "# welcome\nUser-agent: *\nDisallow:\nDisallow: /*.gif"),
      ("c.com", "User-agent: googlebot\nUser-agent: *\nDisallow: /p\n" +
        "Allow: /p"), // length TIE on /p → allow wins
      ("d.com", "User-agent: otherbot\nDisallow: /"))).toDF("host", "body")
    val rules = Web.parseRobots(robots)
    val got = rules.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set(
      ("a.com", "disallow", "/private/"), ("a.com", "allow", "/private/ok"),
      ("b.com", "disallow", "/*.gif"),
      ("c.com", "disallow", "/p"), ("c.com", "allow", "/p")),
      s"rules: $got")
    val urls = spark.createDataFrame(Seq(
      (1L, "https://a.com/private/x"), (2L, "https://a.com/private/okay"),
      (3L, "https://a.com/public"), (4L, "https://a.com"),
      (5L, "https://b.com/anything.gif"), (6L, "https://c.com/page"),
      (7L, "https://d.com/secret"), (8L, "https://nobots.com/x"),
      (9L, "https://a.com?page=private"), // query-only: path reads /?…
      (10L, "https://b.com/a.gift"))) // *.gif has no end anchor: matches
      .toDF("id", "url")
    val verdicts = Web.robotsFilter(urls, "url", rules)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Boolean]("allowed"), r.getAs[String]("matched_prefix")))
      .toMap
    assert(verdicts == Map(
      1L -> (false, "/private/"), // disallow prefix
      2L -> (true, "/private/ok"), // longer allow beats shorter disallow
      3L -> (true, ""), 4L -> (true, ""), // no match; bare host path = "/"
      5L -> (false, "/*.gif"), // §2.2.3: the wildcard rule really bites
      6L -> (true, "/p"), // tie on /p → allow wins
      7L -> (true, ""), // no *-group → generic crawler unrestricted
      8L -> (true, ""), // no robots at all
      // query-only URL evaluates as /?page=… — NOT as the bare query
      // string, which no /-anchored rule could ever match
      9L -> (true, ""),
      10L -> (false, "/*.gif")), s"verdicts: $verdicts")
  }

  test("robots wildcard/$ translation (RFC 9309 §2.2.3): '*' spans any " +
      "run, trailing '$' anchors the path end, embedded regex " +
      "metachars stay literal, and rule-length priority arbitrates " +
      "wildcard vs prefix matches") {
    import graft.operators.Web
    val robots = spark.createDataFrame(Seq(
      ("a.com", "User-agent: *\nDisallow: /*.php\nAllow: /shared/*.php\n" +
        "Disallow: /tmp$\nDisallow: /a.b\nDisallow: /x*y$")))
      .toDF("host", "body")
    val rules = Web.parseRobots(robots)
    val urls = spark.createDataFrame(Seq(
      (1L, "https://a.com/index.php"), // /*.php
      (2L, "https://a.com/shared/lib.php"), // longer allow wins
      (3L, "https://a.com/tmp"), // $-anchored: exact end
      (4L, "https://a.com/tmpfile"), // NOT anchored-match
      (5L, "https://a.com/a.b"), // literal dot
      (6L, "https://a.com/aXb"), // dot must NOT match as regex-any
      (7L, "https://a.com/x123y"), // * then $
      (8L, "https://a.com/x123yz"))) // $ rejects the tail
      .toDF("id", "url")
    val verdicts = Web.robotsFilter(urls, "url", rules)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Boolean]("allowed"), r.getAs[String]("matched_prefix")))
      .toMap
    assert(verdicts == Map(
      1L -> (false, "/*.php"),
      2L -> (true, "/shared/*.php"),
      3L -> (false, "/tmp$"),
      4L -> (true, ""),
      5L -> (false, "/a.b"),
      6L -> (true, ""),
      7L -> (false, "/x*y$"),
      8L -> (true, "")), s"verdicts: $verdicts")
  }

  test("robots per-agent group selection (RFC 9309 §2.2.1): a group " +
      "matches when its token is a case-insensitive PREFIX of the " +
      "agent token (Googlebot-News obeys a Googlebot group), the " +
      "longest matching token wins per host, else the *-groups apply; " +
      "a host whose ONLY group names the agent flips from allow-all " +
      "to restricted") {
    import graft.operators.Web
    val robots = spark.createDataFrame(Seq(
      ("a.com", "User-agent: *\nDisallow: /private/\n" +
        "\nUser-agent: otherbot\nDisallow: /ob/"),
      ("d.com", "User-agent: otherbot\nDisallow: /"),
      // two prefix candidates — the LONGEST token's group must win
      ("e.com", "User-agent: other\nDisallow: /o/\n" +
        "\nUser-agent: otherbot\nDisallow: /ob2/"))).toDF("host", "body")
    val urls = spark.createDataFrame(Seq(
      (1L, "https://a.com/private/x"), (2L, "https://a.com/ob/x"),
      (3L, "https://d.com/anything"),
      (4L, "https://e.com/o/x"), (5L, "https://e.com/ob2/x")))
      .toDF("id", "url")
    def verdicts(agent: String) =
      Web.robotsFilter(urls, "url", Web.parseRobots(robots, agent = agent))
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Boolean]("allowed"))
        .toMap
    // generic crawler: a.com's * group; d.com/e.com unrestricted
    // (a '*' token is a literal string, never a glob — no prefix match)
    assert(verdicts("*") == Map(1L -> false, 2L -> true, 3L -> true,
      4L -> true, 5L -> true))
    // otherbot: its own groups REPLACE the * group on a.com (RFC: the
    // most specific matching group, not the union), d.com now bites,
    // and on e.com the LONGEST prefix token ("otherbot" > "other")
    // selects /ob2/ only
    assert(verdicts("otherbot") == Map(1L -> true, 2L -> false,
      3L -> false, 4L -> true, 5L -> false))
    assert(verdicts("OtherBot") == verdicts("otherbot"))
    // a PRODUCT-SUFFIXED agent matches by token prefix — the RFC's
    // Googlebot-News example shape
    assert(verdicts("otherbot-news") == verdicts("otherbot"))
    // an agent that only the SHORTER token prefixes: e.com picks /o/
    // (a.com has no matching token → its *-group still applies)
    assert(verdicts("otherx") == Map(1L -> false, 2L -> true, 3L -> true,
      4L -> false, 5L -> true))
    // an agent with no groups anywhere falls back to * everywhere
    assert(verdicts("newbot") == verdicts("*"))
  }

  test("robotsMeta: Crawl-delay is group-scoped (agent selection " +
      "applies, min of parseable values, non-numeric reads null), " +
      "Sitemap is host-global (collected from anywhere, deduped, " +
      "sorted), hosts with neither still get a row") {
    import graft.operators.Web
    val robots = spark.createDataFrame(Seq(
      ("a.com", "User-agent: *\nCrawl-delay: 2.5\nDisallow: /p\n" +
        "Sitemap: https://a.com/s2.xml\n" +
        "User-agent: bot2\nCrawl-delay: 1\n" +
        "Sitemap: https://a.com/s1.xml\nSitemap: https://a.com/s2.xml"),
      ("b.com", "User-agent: *\nCrawl-delay: soon\nDisallow: /x"),
      ("c.com", "User-agent: otherbot\nCrawl-delay: 9\nDisallow: /"),
      ("d.com", "User-agent: *\nDisallow: /q"))).toDF("host", "body")
    def meta(agent: String) =
      Web.robotsMeta(robots, agent = agent).collect()
        .map(r => r.getString(0) ->
          ((Option(r.get(1)).map(_.asInstanceOf[Double]),
            r.getSeq[String](2).toList))).toMap
    val m = meta("*")
    assert(m("a.com") == ((Some(2.5),
      List("https://a.com/s1.xml", "https://a.com/s2.xml"))))
    assert(m("b.com") == ((None, Nil))) // non-numeric delay → null
    // c.com's delay sits in an otherbot group — invisible to *
    assert(m("c.com") == ((None, Nil)))
    assert(m("d.com") == ((None, Nil)))
    assert(m.size == 4)
    // agent selection flips which delay applies
    assert(meta("bot2")("a.com")._1 == Some(1.0))
    assert(meta("otherbot")("c.com")._1 == Some(9.0))
  }

  test("robotsFilter size-routing: the shuffle route returns the same " +
      "verdicts as broadcast, its plan is a ShuffledHashJoin (never a " +
      "sort of the crawl table), and the broadcast route stays " +
      "BroadcastHashJoin") {
    import graft.operators.Web
    val robots = spark.createDataFrame(Seq(
      ("a.com", "User-agent: *\nDisallow: /private/\nAllow: /private/ok"),
      ("b.com", "User-agent: *\nDisallow: /*.gif"))).toDF("host", "body")
    val rules = Web.parseRobots(robots).localCheckpoint(true)
    val urls = spark.createDataFrame((0 until 200).map { i =>
      val host = if (i % 2 == 0) "a.com" else "b.com"
      val path = i % 4 match {
        case 0 => s"/private/$i"
        case 1 => s"/img/$i.gif"
        case 2 => s"/private/ok$i"
        case _ => s"/page/$i"
      }
      (i.toLong, s"https://$host$path")
    }).toDF("id", "url")
    def run(strategy: String) =
      Web.robotsFilter(urls, "url", rules, strategy = strategy)
    val want = run("broadcast").collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Boolean]("allowed"), r.getAs[String]("matched_prefix"))))
      .toMap
    val gotShuffle = run("shuffle").collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Boolean]("allowed"), r.getAs[String]("matched_prefix"))))
      .toMap
    assert(want.exists(!_._2._1) && gotShuffle == want)
    val bPlan = run("broadcast").queryExecution.executedPlan.toString
    assert(bPlan.contains("BroadcastHashJoin") &&
      !bPlan.contains("SortMergeJoin"), s"broadcast route:\n$bPlan")
    val sPlan = run("shuffle").queryExecution.executedPlan.toString
    assert(sPlan.contains("ShuffledHashJoin") &&
      !sPlan.contains("SortMergeJoin") &&
      !sPlan.contains("BroadcastHashJoin"), s"shuffle route:\n$sPlan")
    // auto on a tiny rule set routes to broadcast
    val aPlan = run("auto").queryExecution.executedPlan.toString
    assert(aPlan.contains("BroadcastHashJoin"), s"auto route:\n$aPlan")
  }

  test("w3cEpoch: date-only, full datetimes, Z and ±hh:mm offsets all " +
      "reduce to the same epoch axis (string min is NOT chronological " +
      "min across these); garbage reads null") {
    import graft.operators.Web
    val cases = Seq(
      "2026-03-01" -> Some(1772323200L), // 2026-03-01T00:00:00Z
      "2026-03-01T06:30:00Z" -> Some(1772346600L),
      "2026-03-01T06:30:00.123Z" -> Some(1772346600L), // fraction truncates
      "2026-03-01T00:15:00+09:00" -> Some(1772291700L), // = 02-28T15:15Z
      "2026-03-01T12:00:00-05:00" -> Some(1772384400L), // = 03-01T17:00Z
      "" -> None, "soon" -> None,
      // calendar-invalid: null, never the ANSI throw (one garbage
      // lastmod must not kill the crawl job)
      "2026-02-31" -> None, "2026-13-05T06:30:00Z" -> None)
    val df = spark.createDataFrame(cases.map(c => Tuple1(c._1))).toDF("lm")
    val got = df.select(col("lm"), Web.w3cEpoch(col("lm")).as("e"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    cases.foreach { case (in, want) =>
      assert(got(in) == want, s"for '$in': got ${got(in)}, want $want")
    }
    // the divergence that motivates the typed parse: the +09:00 form is
    // chronologically EARLIEST but sorts lexicographically in the middle
    val strs = cases.take(5).map(_._1)
    assert(strs.min == "2026-03-01")
    assert(cases.take(5).minBy(_._2.get)._1 == "2026-03-01T00:15:00+09:00")
  }

  test("property (seeded): parseRobots + robotsFilter match a direct " +
      "per-host reference evaluation over 40 random robots bodies × " +
      "200 random URLs — group parsing, *-selection, wildcard/$ " +
      "translation, longest-rule/allow-ties all pinned") {
    import graft.operators.Web
    val rnd = new scala.util.Random(8161700L)
    val prefixes = Seq("/", "/a", "/a/", "/a/b", "/ab", "/b/", "/priv",
      "/priv/x", "/*.gif", "/c$", "/a*b/", "/priv*x$")
    def body(): String = {
      val groups = 1 + rnd.nextInt(3)
      (0 until groups).flatMap { _ =>
        val agents = (0 to rnd.nextInt(2)).map(_ =>
          "User-agent: " + (if (rnd.nextBoolean()) "*" else "otherbot"))
        val rules = (0 to rnd.nextInt(4)).map { _ =>
          val kind = if (rnd.nextBoolean()) "Allow" else "Disallow"
          val p = if (rnd.nextInt(5) == 0) ""
            else prefixes(rnd.nextInt(prefixes.length))
          s"$kind: $p" + (if (rnd.nextInt(4) == 0) " # c" else "")
        }
        agents ++ rules
      }.mkString("\n")
    }
    val robots = (0 until 40).map(i => (s"h$i.com", body()))
    // reference: sequential group parse, *-groups' non-empty rules,
    // RFC §2.2.3 rule-to-regex semantics, longest rule wins, allow
    // wins ties
    def refRules(b: String): Seq[(String, String)] = {
      var out = List.empty[(String, String)]
      var agents = List.empty[String]
      var inUa = false
      b.split("\n").map(_.replaceAll("#.*", "").trim).filter(_.nonEmpty)
        .foreach { line =>
          val i = line.indexOf(':')
          val key = line.substring(0, i).trim.toLowerCase
          val v = line.substring(i + 1).trim
          if (key == "user-agent") {
            if (!inUa) agents = Nil
            inUa = true; agents ::= v
          } else if (key == "allow" || key == "disallow") {
            inUa = false
            if (agents.contains("*") && v.nonEmpty) out ::= (key, v)
          }
        }
      out.reverse
    }
    def ruleMatches(rule: String, path: String): Boolean = {
      val endAnchor = rule.endsWith("$")
      val core = if (endAnchor) rule.dropRight(1) else rule
      val regex = core.split("\\*", -1)
        .map(java.util.regex.Pattern.quote).mkString(".*")
      java.util.regex.Pattern
        .compile("^" + regex + (if (endAnchor) "$" else ""))
        .matcher(path).find()
    }
    def refVerdict(rules: Seq[(String, String)],
        path: String): (Boolean, String) = {
      val hits = rules.filter { case (_, p) => ruleMatches(p, path) }
      if (hits.isEmpty) (true, "")
      else {
        val best = hits.maxBy { case (k, p) => (p.length, k == "allow", p) }
        (best._1 == "allow", best._2)
      }
    }
    val urls = (0 until 200).map { i =>
      val h = s"h${rnd.nextInt(40)}.com"
      val p = prefixes(rnd.nextInt(8)) + (rnd.nextInt(4) match {
        case 0 => s"x$i"
        case 1 => s"x$i.gif" // exercises /*.gif
        case 2 => "" // bare prefix — exercises $-anchored exact hits
        case _ => s"b/q$i"
      })
      (i.toLong, s"https://$h$p")
    }
    val robotsDf = spark.createDataFrame(robots).toDF("host", "body")
    val urlsDf = spark.createDataFrame(urls).toDF("id", "url")
    val got = Web.robotsFilter(urlsDf, "url", Web.parseRobots(robotsDf))
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Boolean]("allowed"), r.getAs[String]("matched_prefix")))
      .toMap
    val byHost = robots.toMap
    urls.foreach { case (id, u) =>
      val host = u.stripPrefix("https://").takeWhile(_ != '/')
      val path = u.stripPrefix("https://" + host) match {
        case "" => "/"; case p => p
      }
      val want = refVerdict(refRules(byHost(host)), path)
      assert(got(id) == want,
        s"url $u (robots:\n${byHost(host)}\n): got ${got(id)}, want $want")
    }
  }

  test("robots.txt hardening (r16 review): CRLF bodies parse clean (a " +
      "\\n-only split leaves \\r on every value and silently turns the " +
      "filter allow-all); a leading UTF-8 BOM is stripped (same failure " +
      "class — \\uFEFFUser-agent deselects every group); a URL relation " +
      "carrying its own host column works; reserved output names clash " +
      "loudly; empty dirs of discovered URLs yield a TYPED empty " +
      "frontier") {
    import graft.operators.Web
    val crlf = spark.createDataFrame(Seq(
      ("a.com",
        "\uFEFFUser-agent: *\r\nDisallow: /private/\r\nAllow: /ok\r\n")))
      .toDF("host", "body")
    val rules = Web.parseRobots(crlf)
    val got = rules.collect()
      .map(r => (r.getString(1), r.getString(2))).toSet
    assert(got == Set(("disallow", "/private/"), ("allow", "/ok")),
      s"CRLF body parsed as: $got")
    // URL table with its own host column (the normal crawl shape)
    val urls = spark.createDataFrame(Seq(
      (1L, "https://a.com/private/x", "a.com"),
      (2L, "https://a.com/ok", "a.com"))).toDF("id", "url", "host")
    val v = Web.robotsFilter(urls, "url", rules)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Boolean]("allowed"))
      .toMap
    assert(v == Map(1L -> false, 2L -> true))
    // reserved outputs must not be silently overwritten
    intercept[IllegalArgumentException] {
      Web.robotsFilter(urls.withColumn("allowed",
        org.apache.spark.sql.functions.lit(true)), "url", rules)
    }
    // zero-batch stream → typed empty frontier (orderBy must resolve)
    val emptyDir = java.nio.file.Files.createTempDirectory("frontier_empty")
      .toString
    val srcSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("loc",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("lastmod",
        org.apache.spark.sql.types.StringType)))
    try {
      val f = graft.streaming.EventStream.ingestUrlFrontier(spark,
        emptyDir, srcSchema, rules)
      assert(f.orderBy(col("url")).count() == 0)
    } finally graft.streaming.EventStream.deleteDir(emptyDir)
  }

  test("plan: robotsFilter is MAP-ONLY over the URL table — the rule " +
      "join is broadcast and no exchange partitions the crawl side") {
    import graft.operators.Web
    val robots = spark.createDataFrame(Seq(
      ("a.com", "User-agent: *\nDisallow: /private/"))).toDF("host", "body")
    val urls = spark.createDataFrame(
      (0 until 100).map(i => (i.toLong, s"https://a.com/p/$i")))
      .toDF("id", "url")
    val df = Web.robotsFilter(urls, "url", Web.parseRobots(robots))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"unexpected SMJ:\n$plan")
    // the URL side must not be exchanged: the only exchanges allowed
    // are on the (tiny) rule side feeding the broadcast
    val urlSideExchanges = plan.linesIterator
      .count(l => l.contains("Exchange hashpartitioning(id"))
    assert(urlSideExchanges == 0, s"URL side shuffled:\n$plan")
  }

  test("sitemap parse: <url> entries extract (loc, lastmod) with " +
      "whitespace trim and XML-unescape; lastmod-less entries read " +
      "empty; <sitemapindex> payloads yield child locs via the index " +
      "parser and no <url> entries; &amp;amp; stays literal") {
    import graft.operators.Web
    val xml = "<?xml version=\"1.0\"?><urlset>" +
      "<url><loc>\n https://a.com/x?p=1&amp;q=2 \n</loc>" +
      "<lastmod>2026-01-02</lastmod></url>" +
      "<url><loc>https://a.com/y</loc></url></urlset>"
    val df = spark.createDataFrame(Seq(Tuple1(xml))).toDF("x")
    val got = df.select(explode(Web.sitemapUrls(col("x"))).as("u"))
      .select(Web.xmlUnescape(col("u.loc")).as("loc"), col("u.lastmod"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq(("https://a.com/x?p=1&q=2", "2026-01-02"),
      ("https://a.com/y", "")), s"got $got")
    val index = "<sitemapindex><sitemap><loc> https://a.com/s1.xml " +
      "</loc></sitemap><sitemap><loc>https://a.com/s2.xml</loc>" +
      "</sitemap></sitemapindex>"
    val idf = spark.createDataFrame(Seq(Tuple1(index))).toDF("x")
    assert(idf.select(size(Web.sitemapUrls(col("x")))).collect()(0)
      .getInt(0) == 0)
    val locs = idf.select(Web.sitemapIndexLocs(col("x")).as("l"))
      .collect()(0).getSeq[String](0)
    assert(locs == Seq("https://a.com/s1.xml", "https://a.com/s2.xml"))
    // double-escape discipline matches htmlText's: one pass, no rescan
    assert(one("&amp;amp; and &amp;lt;", Web.xmlUnescape) ==
      "&amp; and &lt;")
    // numeric/hex character references (generated sitemaps commonly
    // numeric-escape) decode too, with the same one-pass amp rule
    assert(one("a?p=1&#38;q=2 &#x26;r &#60;x&#x3e; &#39;", Web.xmlUnescape)
      == "a?p=1&q=2 &r <x> '")
    assert(one("&#38;amp; stays literal", Web.xmlUnescape) ==
      "&amp; stays literal")
  }

  test("tx_url_frontier funnel: robots rules really block (no /private/ " +
      "site0 URLs survive), re-discoveries really collapse (n_seen > 1), " +
      "first_lastmod is the minimum sighting") {
    val got = SparkEntry.queries("tx_url_frontier")(spark, TestSpark.sfDir)
      .collect()
    assert(got.nonEmpty)
    val urls = got.map(_.getString(0))
    assert(urls.forall(_.startsWith("https://site")))
    // site0's Disallow /private/ and site2's Disallow /p bit
    assert(!urls.exists(u => u.startsWith("https://site0.com/private/")),
      "robots-disallowed site0 /private/ URL survived")
    assert(!urls.exists(u => u.startsWith("https://site2.com/private/")),
      "robots-disallowed site2 /p URL survived")
    // allowed families present: site1 private (no rules), site0 item
    assert(urls.exists(_.startsWith("https://site1.com/private/")))
    assert(urls.exists(_.startsWith("https://site0.com/item/")))
    assert(got.exists(_.getLong(1) > 1), "no page collapsed re-discoveries")
    assert(got.forall(_.getString(2).matches("2026-0[1-9]-01")))
  }

  test("stream_url_frontier: the fold really runs across >= 4 " +
      "micro-batches, robots-disallowed URLs never enter state, and the " +
      "streamed fixed point equals the one-shot batch fold row-for-row") {
    import graft.operators.Web
    val robots = spark.createDataFrame(Seq(
      ("a.com", "User-agent: *\nDisallow: /private/"))).toDF("host", "body")
    val rules = Web.parseRobots(robots).localCheckpoint(true)
    val raw = spark.createDataFrame((0 until 80).map { i =>
      (i.toLong,
        s"HTTPS://a.com${if (i % 3 == 0) "/private/" else "/p/"}${i % 10}" +
          s"?utm_source=s$i",
        f"2026-01-${i % 9 + 1}%02d")
    }).toDF("doc_id", "loc", "lastmod")
    val tmp = java.nio.file.Files.createTempDirectory("stream_frontier")
      .toString
    raw.repartitionByRange(4, col("doc_id"))
      .write.mode("overwrite").parquet(tmp)
    var batches = 0L
    val got = try graft.streaming.EventStream
      .ingestUrlFrontier(spark, tmp,
        raw.select(col("loc"), col("lastmod")).schema, rules,
        onBatch = _ => batches += 1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .toSet
    finally graft.streaming.EventStream.deleteDir(tmp)
    assert(batches >= 4, s"only $batches micro-batches")
    assert(got.nonEmpty && !got.exists(_._1.contains("/private/")),
      s"disallowed URL in frontier state: $got")
    // one-shot fold over the whole relation = the same fixed point
    val oneShot = Web.robotsFilter(
        raw.select(Web.canonicalUrl(col("loc")).as("url"), col("lastmod")),
        "url", rules)
      .filter(col("allowed"))
      .groupBy(col("url"))
      .agg(count(lit(1)).as("n_seen"), min(col("lastmod")).as("first"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .toSet
    assert(got == oneShot)
    // the collapse really happened: 80 discoveries, few canonical pages
    assert(got.size < 20 && got.exists(_._2 > 1))
  }

  test("anchorLinks: (href, text) pairs extract across quoting styles " +
      "(double, single, bare), hrefs XML-unescape, texts run the full " +
      "htmlText cleanup, href-less anchors read empty") {
    import graft.operators.Web
    val html = "<a href=\"/a?x=1&amp;y=2\">one &amp; only</a>" +
      "<a\nclass='k'\nhref='../b'><b>two</b> bold</a>" +
      "<a href=page3>three</a><a name=\"anchor\">no link</a>"
    val got = spark.createDataFrame(Seq(Tuple1(html))).toDF("h")
      .select(explode(Web.anchorLinks(col("h"))).as("l"))
      .select(col("l.href"), col("l.text"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq(
      ("/a?x=1&y=2", "one & only"),
      ("../b", "two bold"),
      ("page3", "three"),
      ("", "no link")), s"links: $got")
  }

  test("resolveUrl: absolute, protocol-relative, rooted, query-only, " +
      "fragment-only, empty, and dot-segment relative hrefs all land " +
      "on the RFC 3986 targets") {
    import graft.operators.Web
    val base = "https://site.com/sec/sub/page?q=1#frag"
    val cases = Seq(
      "https://other.com/x" -> "https://other.com/x",
      "//cdn.com/lib" -> "https://cdn.com/lib",
      "/rooted/r" -> "https://site.com/rooted/r",
      "?page=2" -> "https://site.com/sec/sub/page?page=2",
      "#top" -> "https://site.com/sec/sub/page?q=1#top",
      "" -> base,
      "item" -> "https://site.com/sec/sub/item",
      "./item" -> "https://site.com/sec/sub/item",
      "../up" -> "https://site.com/sec/up",
      "../../top" -> "https://site.com/top",
      "../../../over" -> "https://site.com/over", // excess .. drops
      "a/../b/./c" -> "https://site.com/sec/sub/b/c",
      "mailto:x@y.z" -> "mailto:x@y.z")
    val df = spark.createDataFrame(cases.map(c => (base, c._1)))
      .toDF("base", "href")
    val got = df.select(col("href"),
        Web.resolveUrl(col("base"), col("href")).as("r"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (h, want) =>
      assert(got(h) == want, s"href '$h': got ${got(h)}, want $want")
    }
  }

  test("property (seeded): resolveUrl matches a direct RFC 3986 §5.2 " +
      "reference resolution over 400 random (base, href) assemblies — " +
      "merge, dot-segment removal, and every href shape pinned") {
    import graft.operators.Web
    // reference: RFC 5.2.4 remove_dot_segments as the spec's buffer loop
    def refDots(p: String): String = {
      var in = p
      val out = new StringBuilder
      while (in.nonEmpty) {
        if (in.startsWith("../")) in = in.substring(3)
        else if (in.startsWith("./")) in = in.substring(2)
        else if (in.startsWith("/./")) in = "/" + in.substring(3)
        else if (in == "/.") in = "/"
        else if (in.startsWith("/../") || in == "/..") {
          in = if (in == "/..") "/" else "/" + in.substring(4)
          val i = out.lastIndexOf("/")
          out.setLength(if (i >= 0) i else 0)
        } else if (in == "." || in == "..") in = ""
        else {
          val start = if (in.startsWith("/")) 1 else 0
          val i = in.indexOf('/', start)
          val seg = if (i >= 0) in.substring(0, i) else in
          out.append(seg); in = if (i >= 0) in.substring(i) else ""
        }
      }
      out.toString
    }
    def refResolve(base: String, href: String): String = {
      val scheme = base.takeWhile(_ != ':')
      val origin = base.substring(0,
        base.indexOf('/', scheme.length + 3) match {
          case -1 => base.length; case i => i
        })
      val tail = base.substring(origin.length)
      val pathQuery = tail.takeWhile(_ != '#')
      val pathOnly = pathQuery.takeWhile(_ != '?')
      val dir =
        if (pathOnly.contains("/")) pathOnly.take(pathOnly.lastIndexOf('/') + 1)
        else "/"
      if (href.isEmpty) base
      else if (href.matches("^[A-Za-z][A-Za-z0-9+.-]*:.*")) href
      else if (href.startsWith("//")) scheme + ":" + href
      else if (href.startsWith("/")) origin + refDots(href)
      else if (href.startsWith("?")) origin + pathOnly + href
      else if (href.startsWith("#")) origin + pathQuery + href
      else origin + refDots(dir + href)
    }
    val rnd = new scala.util.Random(8171200L)
    val pairs = (0 until 400).map { i =>
      val depth = rnd.nextInt(4)
      val base = s"https://h$i.com" +
        (0 until depth).map(d => s"/d$d").mkString +
        s"/pg$i" + (if (rnd.nextBoolean()) s"?q=$i" else "") +
        (if (rnd.nextInt(3) == 0) "#f" else "")
      val href = rnd.nextInt(8) match {
        case 0 => s"https://abs$i.org/p"
        case 1 => s"//cdn$i.net/x"
        case 2 => s"/r$i/s"
        case 3 => s"?n=$i"
        case 4 => "#sec"
        case 5 => ""
        case _ =>
          (0 until rnd.nextInt(4)).map(_ =>
            if (rnd.nextBoolean()) "../" else "./").mkString +
            (if (rnd.nextBoolean()) s"a$i/b" else s"c$i")
      }
      (base, href)
    }
    val df = spark.createDataFrame(pairs).toDF("base", "href")
    val got = df.select(col("base"), col("href"),
        Web.resolveUrl(col("base"), col("href")).as("r"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getString(2))
      .toMap
    pairs.foreach { case (b, h) =>
      val want = refResolve(b, h)
      assert(got((b, h)) == want,
        s"base $b href '$h': got ${got((b, h))}, want $want")
    }
  }

  test("link graph composes end to end: anchorLinks → pageBase → " +
      "resolveUrl → canonicalUrl edges (nofollow dropped, <base href> " +
      "honored) feed Graph.pagerank identically to the hand-built edge " +
      "list (HTML in, ranked pages out)") {
    import graft.operators.{Graph, Web}
    // 4 pages; page i links to (i+1)%4 twice (relative + rooted) and
    // to page 0 once — page0 must out-rank the rest. Page 2 carries a
    // <base href> into /dir/ from a DIFFERENT directory (its relative
    // hrefs must still land on /dir/ — base-blind resolution would
    // aim them at /other/), and every page carries a rel=nofollow
    // anchor that must never become an edge.
    val pages = (0 until 4).map { i =>
      val url =
        if (i == 2) s"https://g.com/other/p$i" else s"https://g.com/dir/p$i"
      val base =
        if (i == 2) """<base href="https://g.com/dir/x">""" else ""
      val html = base +
        s"""<a href="p${(i + 1) % 4}">next</a>""" +
        s"""<a href="/dir/p${(i + 1) % 4}?utm_source=x">next2</a>""" +
        """<a href="../dir/p0">home</a>""" +
        s"""<a rel="nofollow" href="/spam/s$i">paid</a>"""
      (url, html)
    }
    val df = spark.createDataFrame(pages).toDF("page", "html")
    val edges = df
      .select(col("page"),
        Web.pageBase(col("page"), col("html")).as("eb"),
        explode(Web.anchorLinks(col("html"))).as("l"))
      .filter(col("l.href") =!= "" && !col("l.nofollow"))
      .select(Web.canonicalUrl(col("page")).as("src"),
        Web.canonicalUrl(Web.resolveUrl(col("eb"), col("l.href")))
          .as("dst"))
    val want = spark.createDataFrame(
      (0 until 4).flatMap { i =>
        val src = if (i == 2) s"https://g.com/other/p$i"
          else s"https://g.com/dir/p$i"
        // page 2's relative hrefs resolve against its BASE (/dir/),
        // so its dsts are identical to the base-less pages'; the
        // nofollow /spam/ anchors contribute NO edge
        Seq((src, s"https://g.com/dir/p${(i + 1) % 4}"),
          (src, s"https://g.com/dir/p${(i + 1) % 4}"),
          (src, "https://g.com/dir/p0"))
      }).toDF("src", "dst")
    val gotEdges = edges.collect().map(r =>
      (r.getString(0), r.getString(1))).sorted.toSeq
    assert(gotEdges ==
      want.collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq)
    val gotRank = Graph.pagerank(edges, iters = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val wantRank = Graph.pagerank(want, iters = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(gotRank == wantRank)
    assert(gotRank("https://g.com/dir/p0") == gotRank.values.max,
      s"home page must out-rank: $gotRank")
  }

  test("resolveCanonicals: transitive chains collapse to the terminal " +
      "with exact hop counts, cycles mark status=cycle and KEEP the " +
      "page's own URL, undeclared pages read self, and over-maxHops " +
      "chains fall back to identity") {
    import graft.operators.Web
    val pages = spark.createDataFrame(Seq(
      // 2-hop chain: amp -> mobile -> main (main self-declared)
      ("https://s.com/amp", "https://s.com/m"),
      ("https://s.com/m", "https://s.com/main"),
      ("https://s.com/main", "https://s.com/main"),
      // 2-cycle
      ("https://s.com/cycA", "https://s.com/cycB"),
      ("https://s.com/cycB", "https://s.com/cycA"),
      // long chain c0 -> ... -> c5 (5 hops from c0)
      ("https://s.com/c0", "https://s.com/c1"),
      ("https://s.com/c1", "https://s.com/c2"),
      ("https://s.com/c2", "https://s.com/c3"),
      ("https://s.com/c3", "https://s.com/c4"),
      ("https://s.com/c4", "https://s.com/c5")))
      .toDF("url", "canon_url")
    val got = Web.resolveCanonicals(pages).collect()
      .map(r => r.getString(0) -> ((r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getString(3)))).toMap
    assert(got.size == 10)
    assert(got("https://s.com/amp") ==
      (("https://s.com/main", 2L, "resolved")), s"$got")
    assert(got("https://s.com/m") ==
      (("https://s.com/main", 1L, "resolved")))
    assert(got("https://s.com/main") ==
      (("https://s.com/main", 0L, "self")))
    Seq("cycA", "cycB").foreach { n =>
      assert(got(s"https://s.com/$n") ==
        ((s"https://s.com/$n", -1L, "cycle")), s"$n: $got")
    }
    assert(got("https://s.com/c0") ==
      (("https://s.com/c5", 5L, "resolved")))
    // a 3-hop cap strands c0 (5 hops needed): identity fallback
    val capped = Web.resolveCanonicals(pages, maxHops = 3).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(3))))
      .toMap
    assert(capped("https://s.com/c0") ==
      (("https://s.com/c0", "cycle")), s"capped: $capped")
    assert(capped("https://s.com/c2") ==
      (("https://s.com/c5", "resolved")))
  }

  test("consolidateEdges + pagerank: a duplicate family (redirect " +
      "variants + m-dot/AMP canonical chain of one article) " +
      "concentrates its in-link mass on ONE node (r18 missing #1), " +
      "edges into redirect CYCLES drop, and the consolidated graph's " +
      "pagerank equals the hand-collapsed reference graph's") {
    import graft.operators.{Graph, Web}
    // article M with duplicate identities: R2 -> R1 -> M (redirects),
    // A -> D -> M (canonical chain); a second article X with a
    // redirect CYCLE in front (links there must vanish); five source
    // pages spread their links across the identities
    val redirects = spark.createDataFrame(Seq(
      ("https://old.com/r1", "https://s.com/M"),
      ("https://older.com/r2", "https://old.com/r1"),
      ("https://x.com/cy1", "https://x.com/cy2"),
      ("https://x.com/cy2", "https://x.com/cy1")))
      .toDF("src", "dst")
    val canonPages = spark.createDataFrame(Seq(
      ("https://m.s.com/D", "https://s.com/M"),
      ("https://amp.s.com/A", "https://m.s.com/D")))
      .toDF("url", "canon_url")
    val targets = Seq("https://s.com/M", "https://old.com/r1",
      "https://older.com/r2", "https://m.s.com/D", "https://amp.s.com/A",
      "https://x.com/cy1")
    val edges = spark.createDataFrame(
      targets.zipWithIndex.map { case (t, i) =>
        (s"https://src.com/p$i", t)
      }).toDF("src", "dst")
    val got = Web.consolidateEdges(edges, "dst", redirects, canonPages)
    val gotRows = got.collect().map(r =>
      (r.getAs[String]("src"), r.getAs[String]("dst"))).sorted.toSeq
    // every duplicate-identity link lands on M; the cycle link is GONE
    val want = (0 until 5).map(i => (s"https://src.com/p$i",
      "https://s.com/M")).sorted
    assert(gotRows == want, s"got $gotRows")
    // in-link mass provably concentrates: pagerank over the
    // consolidated graph equals the hand-collapsed reference, and M
    // holds the maximum
    val ref = spark.createDataFrame(want).toDF("src", "dst")
    val gotRank = Graph.pagerank(got, iters = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val wantRank = Graph.pagerank(ref, iters = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(gotRank == wantRank)
    assert(gotRank("https://s.com/M") == gotRank.values.max,
      s"consolidated article must hold the mass: $gotRank")
    // none of the duplicate identities survive as graph nodes
    Seq("r1", "r2", "/D", "/A", "cy").foreach { frag =>
      assert(!gotRank.keys.exists(_.contains(frag)),
        s"duplicate identity $frag leaked into the graph: $gotRank")
    }
  }

  test("scheduleFrontier: per-host fetch slots honor Crawl-delay " +
      "(deci-second integer offsets), more-referenced pages fetch " +
      "first with URL tiebreak, hosts without meta take the default, " +
      "and the only exchange is the per-host window") {
    import graft.operators.Web
    val frontier = spark.createDataFrame(Seq(
      ("https://a.com/p1", 3L), ("https://a.com/p2", 7L),
      ("https://a.com/p3", 3L), ("https://b.com/x", 1L),
      ("https://nobots.com/y", 2L), ("https://nobots.com/z", 2L)))
      .toDF("url", "n_seen")
    val meta = spark.createDataFrame(Seq(
      ("a.com", Some(1.5), Seq.empty[String]),
      ("b.com", None, Seq.empty[String])))
      .toDF("host", "crawl_delay", "sitemaps")
    val got = Web.scheduleFrontier(frontier, "url", meta)
      .collect().map(r => r.getAs[String]("url") ->
        ((r.getAs[Int]("rank"), r.getAs[Long]("fetch_offset_ds")))).toMap
    assert(got == Map(
      // a.com at 1.5s: p2 (n_seen 7) first, then p1/p3 by URL
      "https://a.com/p2" -> ((0, 0L)),
      "https://a.com/p1" -> ((1, 15L)),
      "https://a.com/p3" -> ((2, 30L)),
      // b.com has meta but a null delay → default 1.0s
      "https://b.com/x" -> ((0, 0L)),
      // nobots.com absent from meta entirely → default too
      "https://nobots.com/y" -> ((0, 0L)),
      "https://nobots.com/z" -> ((1, 10L))), s"schedule: $got")
    val plan = Web.scheduleFrontier(frontier, "url", meta)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") &&
      !plan.contains("SortMergeJoin"), s"delay join must broadcast:\n$plan")
    intercept[IllegalArgumentException] {
      Web.scheduleFrontier(frontier.withColumn("rank", lit(1)), "url", meta)
    }
  }

  test("tx_frontier_discover: only robots-ANNOUNCED sitemaps are fetched " +
      "(site3 never enters the frontier), site0's double announcement " +
      "doubles its n_seen, robots rules still gate, and first_epoch is " +
      "the TYPED chronological min — the +09:00 form wins groups where " +
      "a string-min would pick the date-only member") {
    val got = SparkEntry.queries("tx_frontier_discover")(
      spark, TestSpark.sfDir).collect()
    assert(got.nonEmpty)
    val urls = got.map(_.getString(0))
    assert(!urls.exists(_.startsWith("https://site3.com/")),
      "site3 announces no sitemap — its URLs must never be discovered")
    assert(!urls.exists(_.startsWith("https://site0.com/private/")) &&
      !urls.exists(_.startsWith("https://site2.com/private/")),
      "robots-disallowed URLs leaked into the discovered frontier")
    assert(urls.exists(_.startsWith("https://site0.com/item/")) &&
      urls.exists(_.startsWith("https://site1.com/")))
    val bySite = got.groupBy(_.getString(0).stripPrefix("https://")
      .takeWhile(_ != '.'))
    // site0 announces TWO sitemaps, both serving its urlset: every
    // count doubles; site1 announces one: singleton groups stay 1
    assert(bySite("site0").forall(r => r.getLong(1) % 2 == 0 &&
      r.getLong(1) >= 2), "site0 discoveries must double")
    // site1 announces ONE sitemap: its odd-sized re-discovery groups
    // keep odd counts (site0's doubling makes odd counts impossible)
    assert(bySite("site1").exists(_.getLong(1) % 2 == 1))
    // typed min: a group whose min epoch lands at 86400-31500=54900
    // seconds past midnight took the +09:00 form (previous-day
    // 15:15Z) — exactly where min over the raw STRINGS would have
    // picked the lexicographically-smaller date-only member instead
    assert(got.exists(r => ((r.getLong(2) % 86400) + 86400) % 86400 ==
      54900), "no group's chronological min is the +09:00 form")
  }

  test("mergeFrontier (r16 verdict #1): untouched state passes through " +
      "a map-side broadcast anti join — the only hash shuffle carries " +
      "touched ∪ batch rows (∝ batch, NEVER the frontier), and the " +
      "fold equals a full re-aggregation row-for-row") {
    import graft.streaming.EventStream
    // isolated session: AQE off so the physical tree and its shuffle
    // metrics are directly inspectable without QueryStage wrappers
    // (session-scoped conf — the shared TestSpark session is untouched)
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    val stateN = 100000L
    val state = s2.range(stateN).select(
      concat(lit("https://h"), pmod(col("id"), lit(977)),
        lit(".com/p/"), col("id")).as("url"),
      (pmod(col("id"), lit(5)) + 1L).as("n_seen"),
      lit("2026-01-05").as("first_lastmod")).localCheckpoint(true)
    val touched = state.orderBy(col("url")).limit(100)
      .select(col("url"), lit(1L).as("n_seen"),
        lit("2025-12-31").as("first_lastmod"))
    val fresh = s2.range(100).select(
      concat(lit("https://new.com/"), col("id")).as("url"),
      lit(1L).as("n_seen"), lit("2026-02-01").as("first_lastmod"))
    val kept = touched.unionByName(fresh).localCheckpoint(true)
    val merged = EventStream.mergeFrontier(state, kept)
    val planStr = merged.queryExecution.executedPlan.toString
    assert(planStr.contains("BroadcastHashJoin") &&
      planStr.contains("LeftAnti") && planStr.contains("LeftSemi") &&
      !planStr.contains("SortMergeJoin"), s"plan:\n$planStr")
    val hashExchanges = planStr.linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    assert(hashExchanges == 1,
      s"expected exactly one hash shuffle (the touched∪batch merge), " +
        s"found $hashExchanges:\n$planStr")
    // execute and read the shuffle's OWN metrics: rows written must be
    // batch-scale, not frontier-scale (the old state∪batch re-agg wrote
    // the whole frontier through this exchange every trigger)
    val outRows = merged.queryExecution.toRdd.count()
    assert(outRows == stateN + 100, s"merged rows $outRows")
    org.apache.spark.graftutil.BusDrain.waitUntilEmpty(
      s2.sparkContext, 30000)
    val shuffleRows = merged.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        e.metrics("shuffleRecordsWritten").value
    }.sum
    assert(shuffleRows > 0 && shuffleRows <= 1000,
      s"shuffled $shuffleRows rows for a 200-row batch over a " +
        s"$stateN-row frontier — state is being re-shuffled")
    // fold ≡ full re-aggregation (the monoid the oracle re-derives)
    val want = state.unionByName(kept).groupBy(col("url"))
      .agg(sum(col("n_seen")).as("n_seen"),
        min(col("first_lastmod")).as("first_lastmod"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .toSet
    val got = merged.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(got == want)
  }

  test("anchor attribute extraction walks name=value tokens sequentially " +
      "(r17 ADVICE #3): an ' href=\"fake\"' decoy INSIDE another " +
      "attribute's quoted value never shadows the real href, uppercase " +
      "HREF matches, and rel is whole-token (nofollower != nofollow)") {
    val html =
      "<a data-x=' href=\"fake\"' href='/real'>one</a>" +
      "<a HREF=\"/UP\" REL='NoFollow sponsored'>two</a>" +
      "<a rel=\"ugc nofollower\" href=/keep>three</a>" +
      "<a rel href=\"/bare-rel\">four</a>"
    val got = spark.createDataFrame(Seq(Tuple1(html))).toDF("h")
      .select(explode(Web.anchorLinks(col("h"))).as("l"))
      .select(col("l.href"), col("l.text"), col("l.nofollow"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getBoolean(2)))
      .toSeq
    assert(got == Seq(
      ("/real", "one", false),       // decoy swallowed by data-x's token
      ("/UP", "two", true),          // case-insensitive name + rel token
      ("/keep", "three", false),     // 'nofollower' is NOT nofollow
      ("/bare-rel", "four", false)), // valueless rel reads ''
      s"links: $got")
  }

  test("script/style strip falls back to a lenient open tag on an " +
      "unterminated quote (r17 ADVICE #4): the script BODY never leaks " +
      "into extracted text, while tag-boundary discipline still holds " +
      "(<scriptfoo> is not a script) and quoted '>'s still take the " +
      "quote-aware branch") {
    // unterminated quote: quote-aware fails, lenient strips the body
    val got = one("<script data-x=\"a>var secret = 1;</script>" +
      "<p>keep me</p>", Web.htmlText)
    assert(got == "keep me", s"script body leaked: '$got'")
    val st = one("<style media=\"sc>.hide { display: none }</style>" +
      "<p>prose</p>", Web.htmlText)
    assert(st == "prose", s"style body leaked: '$st'")
    // custom tags never match as script starts (the lenient branch
    // keeps the whitespace-before-attributes boundary)
    val custom = one("<scriptfoo>visible words</scriptfoo>" +
      "<script>var x;</script><p>tail</p>", Web.htmlText)
    assert(custom == "visible words tail", s"boundary broke: '$custom'")
    // quoted '>' still quote-aware: body strips, following text stays
    val quoted = one("<script data-x=\"a>b\">var y;</script>rest",
      Web.htmlText)
    assert(quoted == "rest", s"quote-aware branch lost: '$quoted'")
  }

  test("w3cEpoch minute-precision and offset gating (r17 ADVICE #2): " +
      "hh:mm forms parse fully with their offset, and a ±hh:mm-looking " +
      "tail after a date-only (or garbled-time) string is NOT applied") {
    val cases = Seq(
      // minute-precision W3C form: 06:30+09:00 = 2026-02-28T21:30Z
      "2026-03-01T06:30+09:00" ->
        Some((java.time.LocalDate.of(2026, 2, 28).toEpochDay * 86400L)
          + 21 * 3600L + 30 * 60L),
      // full-second forms unchanged
      "2026-03-01T06:30:00+09:00" ->
        Some((java.time.LocalDate.of(2026, 2, 28).toEpochDay * 86400L)
          + 21 * 3600L + 30 * 60L),
      "2026-03-01T06:30:15Z" ->
        Some(java.time.LocalDate.of(2026, 3, 1).toEpochDay * 86400L
          + 6 * 3600L + 30 * 60L + 15),
      // date-only with an offset-shaped tail: the offset must NOT
      // shift midnight (the r17 ADVICE failure read 14h off)
      "2026-03-01junk+09:00" ->
        Some(java.time.LocalDate.of(2026, 3, 1).toEpochDay * 86400L),
      "2026-03-01" ->
        Some(java.time.LocalDate.of(2026, 3, 1).toEpochDay * 86400L),
      "2026-02-31" -> None, // calendar-invalid
      "garbage" -> None)
    val df = spark.createDataFrame(cases.map(c => Tuple1(c._1))).toDF("lm")
    val got = df.select(col("lm"), Web.w3cEpoch(col("lm")).as("e"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    cases.foreach { case (lm, want) =>
      assert(got(lm) == want, s"'$lm': got ${got(lm)}, want $want")
    }
  }

  test("baseHref / pageBase: the FIRST <base href> wins, a relative " +
      "base resolves against the page URL, <basefont> never matches, " +
      "and base-less pages fall back to the page URL") {
    val page = "https://s.com/dir/sub/p"
    val cases = Seq(
      ("<base href=\"https://cdn.s.com/x/\"><base href=\"/late/\">" +
        "<a href=\"r\">t</a>", "https://cdn.s.com/x/"),
      ("<base target=_top href='../up/'>", "https://s.com/dir/up/"),
      ("<basefont size=3><p>no base</p>", page),
      ("<p>nothing</p>", page))
    val df = spark.createDataFrame(cases.map(c => (page, c._1)))
      .toDF("page", "html")
    val got = df.select(col("html"),
        Web.pageBase(col("page"), col("html")).as("b"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (h, want) =>
      assert(got(h) == want, s"html '$h': got ${got(h)}, want $want")
    }
    // base affects resolution end to end: the relative href lands on
    // the base's directory, not the page's
    val edge = df.limit(1)
      .select(explode(Web.anchorLinks(col("html"))).as("l"),
        Web.pageBase(col("page"), col("html")).as("b"))
      .select(Web.resolveUrl(col("b"), col("l.href")).as("dst"))
      .collect()(0).getString(0)
    assert(edge == "https://cdn.s.com/x/r", s"edge: $edge")
  }

  test("metaRobots: name=robots matches case-insensitively, content is " +
      "whole-token over comma/space lists, multiple robots metas UNION " +
      "(most restrictive wins), and decoys (name=description, " +
      "noindexing) never trigger") {
    val cases = Seq(
      ("<meta name=\"robots\" content=\"noindex, follow\">",
        (true, false)),
      ("<meta NAME='Robots' CONTENT='NOFOLLOW'>", (false, true)),
      ("<meta name=robots content=\"index, follow\">" +
        "<meta name=robots content=nofollow>", (false, true)),
      ("<meta name=\"description\" content=\"noindex nofollow\">",
        (false, false)),
      ("<meta name=robots content=\"noindexing,nofollowed\">",
        (false, false)),
      ("<meta name=robots content=\"noindex,nofollow\">", (true, true)),
      ("<p>no meta at all</p>", (false, false)))
    val df = spark.createDataFrame(cases.map(c => Tuple1(c._1))).toDF("h")
    val got = df.select(col("h"), Web.metaRobots(col("h")).as("m"))
      .collect().map(r => r.getString(0) ->
        ((r.getStruct(1).getBoolean(0), r.getStruct(1).getBoolean(1))))
      .toMap
    cases.foreach { case (h, want) =>
      assert(got(h) == want, s"html '$h': got ${got(h)}, want $want")
    }
  }

  test("scheduleFrontier rank is TWO-PASS under host skew (r17 verdict " +
      "#1): the priority-ordered window partitions by (host, bucket), " +
      "never by host alone, and a 90%-one-host frontier ranks " +
      "identically to the reference one-window form") {
    import org.apache.spark.sql.expressions.Window
    // 2000 URLs, 90% on one mega-host, priorities with heavy ties
    val rows = (0 until 2000).map { i =>
      val host = if (i % 10 < 9) "mega.com" else s"h${i % 7}.com"
      (s"https://$host/p/$i", (i % 13).toLong + 1L)
    }
    val frontier = spark.createDataFrame(rows).toDF("url", "n_seen")
    val meta = spark.createDataFrame(
        Seq(("mega.com", Some(2.0), Seq.empty[String])))
      .toDF("host", "crawl_delay", "sitemaps")
    val sched = Web.scheduleFrontier(frontier, "url", meta, buckets = 16)
    // reference: the one-window form (what the oracle runs in SQL)
    val w = Window.partitionBy(Web.urlHost(col("url")))
      .orderBy(col("n_seen").desc, col("url"))
    val want = frontier
      .withColumn("rank", row_number().over(w) - 1)
      .collect().map(r => r.getAs[String]("url") -> r.getAs[Int]("rank"))
      .toMap
    val got = sched.collect()
      .map(r => r.getAs[String]("url") ->
        ((r.getAs[Int]("rank"), r.getAs[Long]("fetch_offset_ds"))))
      .toMap
    assert(got.size == 2000)
    rows.foreach { case (u, _) =>
      assert(got(u)._1 == want(u), s"$u: got ${got(u)._1}, want ${want(u)}")
    }
    // mega.com at 2.0s: slot offsets are rank * 20 deci-seconds
    assert(got.filter(_._1.contains("mega.com"))
      .forall { case (_, (r, o)) => o == r * 20L })
    // plan pin: every DESC-ordered (data) window carries the bucket
    // column in its partition spec — no single-host-partition sort
    val planStr = sched.queryExecution.executedPlan.toString
    val winLines = planStr.linesIterator
      .filter(l => l.contains("Window ") && l.contains(" DESC")).toSeq
    assert(winLines.nonEmpty, s"no DESC window found:\n$planStr")
    assert(winLines.forall(_.contains("_fs_b")),
      s"priority window lost its bucket partition:\n${winLines.mkString("\n")}")
  }

  test("scheduleFrontier under priority-TIE skew (r18 verdict #1): a " +
      "realistic CONSTANT-priority frontier (every URL n_seen=1, 90% " +
      "on one mega-host) still ranks identically to the one-window " +
      "form AND still fans out across buckets on the url half of the " +
      "composite key — the r18 leading-key-only buckets put the whole " +
      "mega-host tie class in ONE partition") {
    import org.apache.spark.sql.expressions.Window
    val rows = (0 until 2000).map { i =>
      val host = if (i % 10 < 9) "mega.com" else s"h${i % 7}.com"
      (s"https://$host/p/${"%05d".format(i)}", 1L)
    }
    val frontier = spark.createDataFrame(rows).toDF("url", "n_seen")
    val meta = spark.createDataFrame(
        Seq(("mega.com", Some(2.0), Seq.empty[String])))
      .toDF("host", "crawl_delay", "sitemaps")
    val sched = Web.scheduleFrontier(frontier, "url", meta, buckets = 16)
    val w = Window.partitionBy(Web.urlHost(col("url")))
      .orderBy(col("n_seen").desc, col("url"))
    val want = frontier.withColumn("rank", row_number().over(w) - 1)
      .collect().map(r => r.getAs[String]("url") -> r.getAs[Int]("rank"))
      .toMap
    val got = sched.collect()
      .map(r => r.getAs[String]("url") -> r.getAs[Int]("rank")).toMap
    assert(got.size == 2000)
    rows.foreach { case (u, _) =>
      assert(got(u) == want(u), s"$u: got ${got(u)}, want ${want(u)}")
    }
    // degeneration pin: the composite (priority, url) boundaries must
    // split the constant-priority tie class across many buckets
    val buckets = frontier.withColumn("_b",
        graft.operators.Scale.compositeBucketId(frontier,
          Seq(("n_seen", true), ("url", false)), 16))
      .groupBy(col("_b")).count().collect()
    assert(buckets.length > 4,
      s"constant priority collapsed to ${buckets.length} bucket(s)")
    assert(buckets.map(_.getLong(1)).max < 1000L,
      s"one bucket holds most of the tie class: ${buckets.toSeq}")
  }

  test("recrawlPriority: a fresher-lastmod URL outranks a more-seen one " +
      "past the pinned 30-days-per-sighting weight, n_seen still " +
      "decides at equal freshness, and null epochs read oldest") {
    val day = 86400L
    val frontier = spark.createDataFrame(Seq(
      // seen twice, 60 days fresher -> must outrank the 3-seen URL
      ("https://a.com/fresh", 2L, Some(20100L * day)),
      ("https://a.com/stale", 3L, Some(20040L * day)),
      // equal epoch: the more-seen URL wins
      ("https://a.com/hot", 5L, Some(20000L * day)),
      ("https://a.com/cold", 1L, Some(20000L * day)),
      // null epoch: oldest possible
      ("https://a.com/nolm", 9L, None)))
      .toDF("url", "n_seen", "first_epoch")
      .withColumn("priority",
        Web.recrawlPriority(col("n_seen"), col("first_epoch")))
    val meta = spark.createDataFrame(
        Seq(("a.com", Some(1.0), Seq.empty[String])))
      .toDF("host", "crawl_delay", "sitemaps")
    val got = Web.scheduleFrontier(frontier, "url", meta,
        priorityCol = "priority")
      .collect().map(r => r.getAs[String]("url") -> r.getAs[Int]("rank"))
      .toMap
    assert(got("https://a.com/fresh") < got("https://a.com/stale"),
      s"freshness must win: $got")
    assert(got("https://a.com/hot") < got("https://a.com/cold"),
      s"n_seen must win at equal freshness: $got")
    assert(got("https://a.com/nolm") == 4, s"null epoch must rank last: $got")
  }

  test("tx_frontier_recrawl on the fixture dir: the 30-days-per-sighting " +
      "weight really bites — some host ranks a fresher once-seen URL " +
      "ABOVE a staler more-seen one, and rank follows (priority DESC, " +
      "url) exactly") {
    val got = SparkEntry.queries("tx_frontier_recrawl")(
      spark, TestSpark.sfDir).collect()
      .map(r => (r.getAs[String]("url"), r.getAs[String]("host"),
        r.getAs[Long]("n_seen"), r.getAs[Long]("priority"),
        r.getAs[Int]("rank")))
    assert(got.nonEmpty)
    val byHost = got.groupBy(_._2)
    // rank is the (priority DESC, url ASC) order position per host
    byHost.foreach { case (host, rows) =>
      val want = rows.sortBy(r => (-r._4, r._1)).zipWithIndex
        .map { case (r, i) => r._1 -> i }.toMap
      rows.foreach(r => assert(r._5 == want(r._1), s"$host ${r._1}"))
    }
    // the freshness flip exists: within one host, a less-seen URL
    // outranks a more-seen one (its priority is higher on epoch-days)
    val flip = byHost.values.exists { rows =>
      rows.exists(a => rows.exists(b =>
        a._3 < b._3 && a._5 < b._5))
    }
    assert(flip, "no host shows a fresher-less-seen URL outranking a " +
      "more-seen one — the freshness term never bit")
  }

  test("resolveRedirects path doubling: exact hop counts along chains, " +
      "cycles and self-redirects come back unresolved with null hops, " +
      "over-maxHops chains are unresolved at a small cap and resolved " +
      "at the default") {
    import graft.operators.Web
    // a 5-hop chain a0→…→a5, a 2-cycle, a self-redirect, a 1-hop
    val edges = spark.createDataFrame(
      (0 until 5).map(i => (s"https://c.com/a$i", s"https://c.com/a${i + 1}"))
        ++ Seq(("https://c.com/loopA", "https://c.com/loopB"),
          ("https://c.com/loopB", "https://c.com/loopA"),
          ("https://c.com/self", "https://c.com/self"),
          ("https://c.com/one", "https://c.com/done")))
      .toDF("src", "dst")
    val got = Web.resolveRedirects(edges).collect()
      .map(r => r.getString(0) ->
        ((r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2),
          r.getString(3)))).toMap
    assert(got.size == 9)
    (0 until 5).foreach { i =>
      assert(got(s"https://c.com/a$i") ==
        (("https://c.com/a5", 5L - i, "resolved")), s"a$i: ${got(s"https://c.com/a$i")}")
    }
    assert(got("https://c.com/one") == (("https://c.com/done", 1L, "resolved")))
    Seq("loopA", "loopB", "self").foreach { n =>
      val (_, h, st) = got(s"https://c.com/$n")
      assert(st == "unresolved" && h == -1L, s"$n: ${got(s"https://c.com/$n")}")
    }
    // a cap below the chain length leaves the tail unresolved: at
    // maxHops=2 (1 doubling round... ceil(log2 2)=1 -> 2 hops) a0 is
    // 5 hops from terminal and must come back unresolved
    val capped = Web.resolveRedirects(edges, maxHops = 2).collect()
      .map(r => r.getString(0) -> r.getString(3)).toMap
    assert(capped("https://c.com/a0") == "unresolved" &&
      capped("https://c.com/a4") == "resolved", s"capped: $capped")
    // non-power-of-two cap (r18 advice): maxHops=5 runs 3 doubling
    // rounds that FOLLOW up to 8 hops, but a chain resolving only at
    // 6–8 hops must still come back unresolved — the post-filter
    // enforces the documented cap, not the round budget. On an 8-hop
    // chain b0→…→b8: b3 (5 hops out) resolves, b0–b2 (6–8 hops) do
    // not; at maxHops=8 the whole chain resolves with exact hops.
    val bEdges = spark.createDataFrame(
      (0 until 8).map(i => (s"https://c.com/b$i", s"https://c.com/b${i + 1}")))
      .toDF("src", "dst")
    val cap5 = Web.resolveRedirects(bEdges, maxHops = 5).collect()
      .map(r => r.getString(0) ->
        ((if (r.isNullAt(2)) -1L else r.getLong(2), r.getString(3)))).toMap
    assert(cap5("https://c.com/b3") == ((5L, "resolved")), s"cap5: $cap5")
    Seq("b0", "b1", "b2").foreach { n =>
      assert(cap5(s"https://c.com/$n") == ((-1L, "unresolved")),
        s"$n must exceed the 5-hop cap: $cap5")
    }
    val cap8 = Web.resolveRedirects(bEdges, maxHops = 8).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(cap8("https://c.com/b0") == 8L, s"cap8: $cap8")
    // DIRTY input: a source observed redirecting to two targets must
    // normalize to ONE row (min dst, deterministic) — without the
    // keep-one, k duplicates fan out k^rounds across the doubling
    // joins (the 100 TB blowup the scaladoc names)
    val dirty = spark.createDataFrame(Seq(
      ("https://c.com/dup", "https://c.com/t2"),
      ("https://c.com/dup", "https://c.com/t1"),
      ("https://c.com/t1", "https://c.com/end")))
      .toDF("src", "dst")
    val dr = Web.resolveRedirects(dirty).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2))))
    assert(dr.length == 2, s"dup src must collapse to one row: ${dr.toSeq}")
    assert(dr.toMap.apply("https://c.com/dup") ==
      (("https://c.com/end", 2L)), s"${dr.toSeq}")
  }

  test("linkCanonical / effectiveCanonical: whole-token rel (stylesheet " +
      "and rel=canonicals never match), FIRST canonical wins, relative " +
      "values resolve against the page base, absent canonical falls " +
      "back to the normalized page URL") {
    import graft.operators.Web
    val page = "https://www.site.com/art/9?utm_source=z"
    val cases = Seq(
      // absolute canonical
      ("<link rel=\"canonical\" href=\"https://site.com/art/9\">",
        "https://site.com/art/9"),
      // relative canonical against an explicit base
      ("<base href=\"https://site.com/art/\">" +
        "<link rel='canonical nofollow' href=9>",
        "https://site.com/art/9"),
      // decoys only: stylesheet rel, and a rel token that merely
      // PREFIXES canonical — self (page URL, normalized)
      ("<link rel=\"stylesheet\" href=\"/css\">" +
        "<link rel=\"canonicals\" href=\"/wrong\">",
        "https://site.com/art/9"),
      // first canonical wins
      ("<link rel=canonical href=\"/first\">" +
        "<link rel=canonical href=\"/second\">",
        "https://site.com/first"),
      ("<p>none at all</p>", "https://site.com/art/9"))
    val df = spark.createDataFrame(cases.map(c => (page, c._1)))
      .toDF("page", "html")
    val got = df.select(col("html"),
        Web.effectiveCanonical(col("page"), col("html")).as("c"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (h, want) =>
      assert(got(h) == want, s"html '$h': got ${got(h)}, want $want")
    }
  }

  test("tx_anchor_corpus on the fixture dir: in-links aggregate per " +
      "target across referring docs, the anchor list is BOUNDED to the " +
      "top-8 by (frequency DESC, text ASC) while n_anchors stays the " +
      "exact distinct count (r18 verdict #2), and the nofollow family " +
      "contributes nothing") {
    val got = SparkEntry.queries("tx_anchor_corpus")(
      spark, TestSpark.sfDir).collect()
      .map(r => (r.getAs[String]("dst"), r.getAs[Long]("n_links"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_anchors"),
        r.getAs[String]("anchors")))
    assert(got.nonEmpty)
    // the ext targets are shared across many docs (doc_id % 7): real
    // aggregation happened, with n_links >= n_docs always
    val ext = got.filter(_._1.startsWith("https://ext"))
    assert(ext.nonEmpty && ext.forall(e => e._2 > 1 && e._2 == e._3 &&
      e._5 == "ext & link"), s"ext rows: ${ext.toSeq}")
    assert(got.forall(e => e._2 >= e._3))
    // the cap BITES: the cdn targets carry mod-13 anchor variety,
    // so some dst has n_anchors > 8 while its list holds exactly 8 —
    // and every list is bounded
    assert(got.forall(_._5.split("\\|").length <= 8))
    val capped = got.filter(e => e._4 > 8)
    assert(capped.nonEmpty, "no dst exceeded the cap — the fixture " +
      "no longer exercises the bounded path")
    capped.foreach { e =>
      assert(e._5.split("\\|").length == 8, s"capped dst ${e._1} lists " +
        s"${e._5.split("\\|").length} anchors")
    }
    // uncapped targets list ALL their anchors (count == n_anchors)
    got.filter(_._4 <= 8).foreach { e =>
      assert(e._5.split("\\|").length == e._4, s"${e._1}: ${e._5}")
    }
    // compliance flowed through: no /nf/ target, and entity-decoded
    // anchor text aggregated verbatim
    assert(!got.exists(_._1.contains("/nf/")), "nofollow target leaked")
    assert(got.exists(_._5.contains("kept & safe")))
  }

  test("tx_frontier_final on the fixture dir: sightings through 301 " +
      "SOURCE urls count toward the SAME frontier entry as direct " +
      "sightings (n_seen no longer splits across duplicate " +
      "identities), and cycle families drop exactly their " +
      "redirect-path sightings") {
    val got = SparkEntry.queries("tx_frontier_final")(
      spark, TestSpark.sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.length == 25, s"${got.length} rows")
    // no redirect-source identity survives as a frontier key
    assert(got.forall(r => r._1.matches("https://site[0-3]\\.com/art/\\d+")),
      s"duplicate identity leaked: ${got.filterNot(_._1.contains("/art/"))}")
    // re-derive per-family expectations from the fixture arithmetic
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id")).collect().map(_.getLong(0))
    val wantBy = docs.groupBy(_ % 25).map { case (fam, ids) =>
      val kept = if (fam % 10 == 7) ids.count(_ % 4 != 3) else ids.length
      (s"https://site${fam % 4}.com/art/$fam", kept.toLong)
    }
    assert(got.toMap == wantBy, "frontier fold diverged")
    // the consolidation really bites: redirect-path sightings exist
    // and land on the main entry (kept > direct-only count) for some
    // non-cycle family
    val bites = docs.groupBy(_ % 25).exists { case (fam, ids) =>
      fam % 10 != 7 && ids.exists(_ % 4 == 3)
    }
    assert(bites, "fixture lost its redirect-path sightings")
  }

  test("URL-level dedup composes: canonical variants of one page collapse " +
      "to a single group, distinct resources stay apart") {
    val urls = Seq(
      "HTTPS://WWW.Shop.COM:443/item/1?utm_source=a",
      "https://shop.com/item/1",
      "https://shop.com/item/1#reviews",
      "https://shop.com/item/2")
    val df = spark.createDataFrame(urls.map(Tuple1(_))).toDF("url")
    val groups = df.groupBy(Web.canonicalUrl(col("url")).as("canon"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(groups == Map("https://shop.com/item/1" -> 3L,
      "https://shop.com/item/2" -> 1L))
  }

  test("plan: scheduleFrontier never broadcasts the hosts-sized delay " +
      "relation (r19 verdict #1 — the last unbounded broadcast on the " +
      "frontier path): the delays join is a shuffle join riding the " +
      "offset window's host partitioning") {
    val rows = (0 until 500).map(i =>
      (s"https://h${i % 97}.com/p/$i", (i % 5).toLong + 1L))
    val frontier = spark.createDataFrame(rows).toDF("url", "n_seen")
    val meta = spark.createDataFrame(
        (0 until 97).map(h => (s"h$h.com", Some(1.5), Seq.empty[String])))
      .toDF("host", "crawl_delay", "sitemaps")
    val sched = Web.scheduleFrontier(frontier, "url", meta, buckets = 8)
    val plan = sched.queryExecution.executedPlan.toString
    assert(plan.contains("_cd_delay"), s"delay column missing:\n$plan")
    // no BroadcastExchange SUBTREE may produce the delay relation
    // (other broadcasts — e.g. the planner size-routing the tiny test
    // fixture on the offsets join — are statistics-driven and fine;
    // the DELAY relation is hosts-sized by construction and must
    // never be built into a broadcast)
    def markerPos(l: String): Int = {
      val m = "[+:]- ".r.findFirstMatchIn(l)
      m.map(_.start).getOrElse(-1)
    }
    val lines = plan.linesIterator.toVector
    val leaked = lines.zipWithIndex
      .filter(_._1.contains("BroadcastExchange"))
      .exists { case (l, idx) =>
        val p = markerPos(l)
        lines.drop(idx + 1).takeWhile(x => markerPos(x) > p)
          .exists(_.contains("_cd_delay"))
      }
    assert(!leaked,
      s"delay relation built into a broadcast:\n$plan")
    assert(plan.contains("ShuffledHashJoin"),
      s"delays join did not take the shuffle route:\n$plan")
    // and the schedule still computes the right offsets
    val got = sched.filter(col("url") === "https://h0.com/p/0").collect()
    assert(got.length == 1 &&
      got(0).getAs[Long]("fetch_offset_ds") ==
        got(0).getAs[Int]("rank") * 15L)
  }

  test("resolveRedirects latest-observation normalization (r19 watch " +
      "#2): with tsCol the newest sighting wins (min-dst only on an " +
      "exact-ts tie); without it the min-dst default is unchanged") {
    val obs = spark.createDataFrame(Seq(
      // a re-pointed over time: b (old) -> c (new); c chains onward
      ("https://a.com/", "https://b.com/", 1L),
      ("https://a.com/", "https://c.com/", 5L),
      // exact-ts tie at the max: min dst among the tied pair only
      ("https://t.com/", "https://z.com/", 7L),
      ("https://t.com/", "https://y.com/", 7L),
      ("https://t.com/", "https://a0.com/", 2L),
      // the chain the re-pointed source must now follow
      ("https://c.com/", "https://final.com/", 9L)))
      .toDF("src", "dst", "ts")
    val latest = Web.resolveRedirects(obs, tsCol = Some("ts"))
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(3)))
      .toMap
    assert(latest("https://a.com/") == ("https://final.com/", "resolved"),
      s"latest observation must win: $latest")
    assert(latest("https://t.com/") == ("https://y.com/", "resolved"),
      s"min-dst tiebreak at the max ts: $latest")
    val legacy = Web.resolveRedirects(obs)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(legacy("https://a.com/") == "https://b.com/",
      s"default min-dst normalization changed: $legacy")
    assert(legacy("https://t.com/") == "https://a0.com/",
      s"default min-dst normalization changed: $legacy")
  }

  test("anchorCorpus null anchors (r19 ADVICE #2): null-anchor edges " +
      "count as in-links but never reach the top-k comparator, and an " +
      "all-null destination keeps its counts row with anchors = ''") {
    val edges = spark.createDataFrame(Seq(
      (1L, "https://x.com/", Option("alpha")),
      (2L, "https://x.com/", Option.empty[String]),
      (3L, "https://x.com/", Option.empty[String]),
      (4L, "https://y.com/", Option.empty[String]),
      (5L, "https://y.com/", Option.empty[String])))
      .toDF("doc_id", "dst", "anchor")
    val got = Web.anchorCorpus(edges).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))).toMap
    assert(got("https://x.com/") == ((3L, 3L, 1L, "alpha")),
      s"null anchors must count as links, not texts: $got")
    assert(got("https://y.com/") == ((2L, 2L, 0L, "")),
      s"an all-null dst must keep its counts row: $got")
  }

  test("resolveCrawlGraphs: the fused tagged loop returns byte-identical " +
      "maps to the two independent closures — chains, cycles, " +
      "over-budget chains, canonical identity fallback, and a node " +
      "that is a source in ONE graph only (tags must not cross-jump)") {
    // redirect graph: 3-hop chain, 2-cycle, 9-hop over-budget chain
    val chain = (0 until 3).map(i =>
      (s"https://r.com/c$i", s"https://r.com/c${i + 1}"))
    val cycle = Seq(("https://r.com/x", "https://r.com/y"),
      ("https://r.com/y", "https://r.com/x"))
    val long = (0 until 9).map(i =>
      (s"https://r.com/l$i", s"https://r.com/l${i + 1}"))
    // the canonical graph declares a chain THROUGH a url that is also
    // a redirect source (https://r.com/c1): in the canonical graph it
    // is terminal — the fused loop must not jump it via the r-graph
    val redirects = spark.createDataFrame(chain ++ cycle ++ long)
      .toDF("src", "dst")
    val canonPages = spark.createDataFrame(Seq(
      ("https://site.com/a", "https://site.com/b"),
      ("https://site.com/b", "https://r.com/c1"),
      ("https://r.com/c1", "https://r.com/c1"), // self-declared
      ("https://site.com/m", "https://site.com/n"), // canonical cycle
      ("https://site.com/n", "https://site.com/m"),
      ("https://site.com/solo", "https://site.com/solo")))
      .toDF("url", "canon_url")
    val fused = Web.resolveCrawlGraphs(redirects, canonPages,
      maxHops = 8, canonHops = 8)
    val wantR = Web.resolveRedirects(redirects, maxHops = 8)
      .collect().map(_.toSeq).toSet
    val wantC = Web.resolveCanonicals(canonPages, maxHops = 8)
      .collect().map(_.toSeq).toSet
    val gotR = fused.redirects.collect().map(_.toSeq).toSet
    val gotC = fused.canonicals.collect().map(_.toSeq).toSet
    assert(gotR == wantR, s"redirect map diverged:\n$gotR\nvs\n$wantR")
    assert(gotC == wantC, s"canonical map diverged:\n$gotC\nvs\n$wantC")
    // the cross-graph pin really bites: c1's canonical resolution is
    // itself (self-declared), never the redirect graph's c3
    val c1 = fused.canonicals
      .filter(col("url") === "https://r.com/c1").collect()(0)
    assert(c1.getString(1) == "https://r.com/c1" &&
      c1.getString(3) == "self", s"tag crossed graphs: $c1")
  }

  test("metaRefresh / metaRefreshRedirects (r19 missing #2): quoted, " +
      "bare, comma-separated, and url-less content forms parse; " +
      "relative targets resolve against the page base; slow " +
      "refreshes, self-refreshes, and name=refresh decoys are not " +
      "redirects") {
    val pages = Seq(
      // 0: instant, quoted absolute target
      ("https://a.com/p0", "<html><head><meta http-equiv=\"refresh\" " +
        "content=\"0; url=https://b.com/x\"></head></html>"),
      // 1: bare url=, relative target, <base href> applies
      ("https://a.com/dir/p1", "<head><base href=\"https://cdn.a.com/lib/\">" +
        "<meta http-equiv=refresh content=\"2;url=next.html\"></head>"),
      // 2: comma separator + uppercase URL= + single quotes
      ("https://a.com/p2", "<meta HTTP-EQUIV='Refresh' " +
        "CONTENT='3 , URL=/go'>"),
      // 3: url-less self-refresh — NOT a redirect
      ("https://a.com/p3", "<meta http-equiv=\"refresh\" content=\"300\">"),
      // 4: slow refresh — a reload widget, not a redirect
      ("https://a.com/p4", "<meta http-equiv=\"refresh\" " +
        "content=\"30;url=https://b.com/slow\">"),
      // 5: name=refresh decoy — no http-equiv, no redirect
      ("https://a.com/p5", "<meta name=\"refresh\" " +
        "content=\"0;url=https://evil.com/\">"),
      // 6: refresh onto ITSELF (after canonicalization) — dropped
      ("https://a.com/p6", "<meta http-equiv=\"refresh\" " +
        "content=\"0;url=https://a.com/p6#frag\"></head>"))
    val df = spark.createDataFrame(pages).toDF("page", "html")
    val parsed = df.select(col("page"),
        Web.metaRefresh(col("html")).as("mr"))
      .collect().map(r => r.getString(0) ->
        ((Option(r.getStruct(1).get(0)), r.getStruct(1).getString(1))))
      .toMap
    assert(parsed("https://a.com/p0") == ((Some(0), "https://b.com/x")))
    assert(parsed("https://a.com/dir/p1") == ((Some(2), "next.html")))
    assert(parsed("https://a.com/p2") == ((Some(3), "/go")))
    assert(parsed("https://a.com/p3") == ((Some(300), "")))
    assert(parsed("https://a.com/p5") == ((None, "")))
    val soft = Web.metaRefreshRedirects(df, "page", "html")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(soft == Map(
      "https://a.com/p0" -> "https://b.com/x",
      // relative target resolves against the BASE, not the page dir
      "https://a.com/dir/p1" -> "https://cdn.a.com/lib/next.html",
      "https://a.com/p2" -> "https://a.com/go"), s"soft: $soft")
  }
}
