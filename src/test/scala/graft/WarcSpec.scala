package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Warc

/** [[graft.operators.Warc]] — byte-level container contracts the fixture
  * round trip can't pin: binary bodies containing the record delimiter,
  * extra/foreign headers, multi-member gzip chains, truncation errors. */
class WarcSpec extends AnyFunSuite {

  test("write ∘ parse = id, including a BINARY body that contains the " +
      "version line bytes (length-driven parsing, never delimiter scan)") {
    val trap = ("evil\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\n" +
      "not a record").getBytes("UTF-8") ++ Array[Byte](0, -1, 13, 10, 0)
    val recs = Seq(
      "https://a.com/1" -> "plain text".getBytes("UTF-8"),
      "https://a.com/2" -> trap,
      "https://a.com/3" -> Array.tabulate[Byte](256)(_.toByte),
      "https://a.com/empty" -> Array[Byte]())
    val back = Warc.parseRecords(Warc.writeRecords(recs))
    assert(back.length == 4)
    back.zip(recs).foreach { case (r, (uri, body)) =>
      assert(r.headers("WARC-Target-URI") == uri)
      assert(r.headers("WARC-Type") == "response")
      assert(r.headers("Content-Length").toInt == body.length)
      assert(java.util.Arrays.equals(r.body, body), s"body of $uri")
    }
  }

  test("parser tolerates foreign headers and extra inter-record CRLFs; " +
      "header values keep their colons (URIs)") {
    val blob = ("WARC/1.0\r\n" +
      "WARC-Type: request\r\n" +
      "WARC-Target-URI: https://x.com/a?q=1:2\r\n" +
      "WARC-Record-ID: <urn:uuid:1234>\r\n" +
      "X-Custom: v: with: colons\r\n" +
      "Content-Length: 2\r\n\r\nhi\r\n\r\n\r\n\r\n" + // extra CRLFs
      "WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: https://x.com/b\r\n" +
      "Content-Length: 0\r\n\r\n\r\n\r\n").getBytes("UTF-8")
    val rs = Warc.parseRecords(blob)
    assert(rs.length == 2)
    assert(rs(0).headers("WARC-Target-URI") == "https://x.com/a?q=1:2")
    assert(rs(0).headers("X-Custom") == "v: with: colons")
    assert(new String(rs(0).body, "UTF-8") == "hi")
    assert(rs(1).body.isEmpty)
  }

  test("writeRecords rejects CR/LF in URIs loudly — a newline there " +
      "would inject forged header lines (e.g. a lying Content-Length)") {
    intercept[IllegalArgumentException] {
      Warc.writeRecords(Seq(
        "https://a.com/x\r\nContent-Length: 999" -> "hi".getBytes("UTF-8")))
    }
    intercept[IllegalArgumentException] {
      Warc.writeRecords(Seq("https://a.com/\ny" -> Array[Byte]()))
    }
  }

  test("truncated blobs and missing Content-Length fail loudly with " +
      "offsets, not silently drop records") {
    val good = Warc.writeRecords(Seq(
      "https://a.com/1" -> "0123456789".getBytes("UTF-8")))
    intercept[IllegalArgumentException] {
      Warc.parseRecords(good.dropRight(8)) // cuts into the body
    }
    intercept[IllegalArgumentException] {
      Warc.parseRecords(("WARC/1.0\r\nWARC-Type: response\r\n\r\n" +
        "body").getBytes("UTF-8"))
    }
    intercept[IllegalArgumentException] {
      Warc.parseRecords("HTTP/1.1 200 OK\r\n\r\n".getBytes("UTF-8"))
    }
  }

  test("gzip round trip is exact and gunzip consumes concatenated " +
      "members (the .warc.gz member-per-record convention)") {
    val a = "first record payload".getBytes("UTF-8")
    val b = Array.tabulate[Byte](10000)(i => (i * 31).toByte)
    assert(java.util.Arrays.equals(Warc.gunzip(Warc.gzip(a)), a))
    // member chain: gzip(a) ++ gzip(b) must decompress to a ++ b
    val chained = Warc.gunzip(Warc.gzip(a) ++ Warc.gzip(b))
    assert(java.util.Arrays.equals(chained, a ++ b))
    // and a gzipped WARC blob survives end to end
    val recs = Seq("https://a.com/z" -> b)
    val back = Warc.parseRecords(
      Warc.gunzip(Warc.gzip(Warc.writeRecords(recs))))
    assert(java.util.Arrays.equals(back.head.body, b))
  }

  test("property (seeded): write ∘ parse = id over 60 random blobs of " +
      "random binary bodies — lengths 0–2000, bytes spanning the full " +
      "range including CRLF and header-like sequences") {
    val rnd = new scala.util.Random(20250816L)
    (1 to 60).foreach { blobIdx =>
      val recs = (0 until 1 + rnd.nextInt(8)).map { i =>
        val body = new Array[Byte](rnd.nextInt(2001))
        rnd.nextBytes(body)
        // splice header-shaped bytes into some bodies to hunt for
        // delimiter-scan bugs
        if (body.length > 40 && rnd.nextBoolean()) {
          val trap = "\r\nWARC/1.0\r\nContent-Length: 0\r\n\r\n"
            .getBytes("UTF-8")
          System.arraycopy(trap, 0, body, rnd.nextInt(body.length - 40),
            trap.length)
        }
        (s"https://ex.com/$blobIdx/$i?q=${rnd.nextInt(100)}", body)
      }
      val back = Warc.parseRecords(
        Warc.gunzip(Warc.gzip(Warc.writeRecords(recs))))
      assert(back.length == recs.length, s"blob $blobIdx record count")
      back.zip(recs).foreach { case (r, (uri, body)) =>
        assert(r.headers("WARC-Target-URI") == uri)
        assert(java.util.Arrays.equals(r.body, body),
          s"blob $blobIdx body of $uri")
      }
    }
  }

  test("tx_warc_roundtrip on the fixture dir matches a direct per-doc " +
      "derivation (the oracle twin, engine-side)") {
    val spark = TestSpark.spark
    val got = SparkEntry.queries("tx_warc_roundtrip")(spark, TestSpark.sfDir)
      .collect()
    assert(got.nonEmpty)
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => "https://ex.com/doc/" + r.getLong(0) -> r.getString(1))
      .toMap
    assert(got.length == docs.size)
    val md = java.security.MessageDigest.getInstance("MD5")
    got.take(50).foreach { r =>
      val text = docs(r.getString(0))
      md.reset()
      val want = md.digest(text.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(r.getString(1) == want && r.getInt(2) ==
        text.getBytes("UTF-8").length, s"record ${r.getString(0)}")
    }
  }

  test("typed records: Content-Type survives the round trip, None omits " +
      "the header, header() is case-insensitive (externally-produced " +
      "WARCs vary header case), CR/LF in a content type is rejected") {
    val recs = Seq(
      ("https://x/1", Some("image/png"), Array[Byte](1, 2, 3)),
      ("https://x/2", Some("text/html; charset=utf-8"), "hi".getBytes),
      ("https://x/3", None, "bare".getBytes))
    val back = Warc.parseRecords(Warc.writeRecordsTyped(recs))
    assert(back.map(_.header("Content-Type")) ==
      Seq(Some("image/png"), Some("text/html; charset=utf-8"), None))
    // case-insensitive accessor, exact-case map untouched
    assert(back(0).header("content-type") == Some("image/png"))
    assert(back(0).header("WARC-TARGET-URI") == Some("https://x/1"))
    assert(back(0).headers.get("content-type").isEmpty)
    // untyped writer ≡ typed writer with None (byte-identical output)
    val untyped = Warc.writeRecords(Seq(("https://x/3", "bare".getBytes)))
    assert(java.util.Arrays.equals(untyped,
      Warc.writeRecordsTyped(Seq(("https://x/3", None, "bare".getBytes)))))
    intercept[IllegalArgumentException] {
      Warc.writeRecordsTyped(Seq(("https://x/1",
        Some("image/png\r\nContent-Length: 0"), Array[Byte](1))))
    }
  }

  test("header() fallback is DETERMINISTIC on forged case-variant " +
      "duplicates: two spellings of one header that survive the " +
      "exact-name collapse resolve to the lexicographically smallest " +
      "key, same answer every run (r16 ADVICE)") {
    val rec = Warc.Record(Map(
      "Content-Type" -> "a", "content-type" -> "b", "CONTENT-TYPE" -> "c",
      "WARC-Target-URI" -> "u"), Array[Byte]())
    // exact-case wins outright when present
    assert(rec.header("Content-Type") == Some("a"))
    // no exact match: minimum key among the case variants —
    // "CONTENT-TYPE" < "Content-Type" < "content-type"
    assert(rec.header("CoNtEnT-tYpE") == Some("c"))
    assert((1 to 20).map(_ => rec.header("CoNtEnT-tYpE")).distinct.size == 1)
  }

  test("tx_warc_media routes on the Content-Type header and never " +
      "shuffles payload bytes: every 5th doc decodes as a real PNG " +
      "(dims from the decoded image), the rest hash as text; the only " +
      "exchange carries the tiny projected schema") {
    val spark = TestSpark.spark
    val df = SparkEntry.queries("tx_warc_media")(spark, TestSpark.sfDir)
    // payload-shuffle pin: the plan's row schema has NO binary column —
    // payloads exist only inside the mapPartitions iterator
    assert(!df.schema.exists(_.dataType ==
      org.apache.spark.sql.types.BinaryType))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("binary"),
      s"binary column in the physical plan:\n$plan")
    val got = df.collect()
    val total = Tables.load(spark, TestSpark.sfDir, "documents").count()
    assert(got.length == total)
    got.foreach { r =>
      val id = r.getLong(0)
      if (id % 5 == 0) {
        val k = (id % 3 + 1).toInt
        assert(r.getString(1) == "image" && r.getInt(2) == 11 * k &&
          r.getInt(3) == 6 * k, s"media $id")
        assert(r.getString(4).matches("[0-9a-f]{16}"), s"media $id sig")
      } else {
        assert(r.getString(1) == "text" && r.getInt(3) == 0, s"doc $id")
        assert(r.getString(4).matches("[0-9a-f]{32}"), s"doc $id sig")
      }
    }
    // the image branch really ran the codec: its dHash equals the
    // direct mdGrid256 → dHash derivation (PNG encode→decode is the
    // only path between them)
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
      .filter(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.lit(5)) === 0)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    got.filter(_.getLong(0) % 5 == 0).take(20).foreach { r =>
      val want = Multimodal.dHash(MediaCodecs.mdGrid256(docs(r.getLong(0))))
      assert(r.getString(4) == f"$want%016x", s"media ${r.getLong(0)}")
    }
  }

  test("decodeText sniff chain (r17 missing #1): BOM > header > meta > " +
      "strict UTF-8, declared charsets are tried STRICTLY with a " +
      "latin-1 fallback on contradicting bytes, unknown charset names " +
      "fall through, and the BOM is stripped from the text") {
    import java.nio.charset.StandardCharsets._
    val txt = "naïve café ±§"
    // undeclared valid UTF-8 → default
    val d0 = Warc.decodeText(txt.getBytes(UTF_8), Some("text/html"))
    assert(d0 == Warc.DecodedText(txt, "utf-8", "default"), s"$d0")
    // header-declared latin-1 (quoted, mixed case)
    val d1 = Warc.decodeText(txt.getBytes(ISO_8859_1),
      Some("text/html; Charset=\"ISO-8859-1\""))
    assert(d1 == Warc.DecodedText(txt, "iso-8859-1", "header"), s"$d1")
    // meta prescan (no header)
    val metaDoc = "<html><head><meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=iso-8859-1\"></head>" + txt
    val d2 = Warc.decodeText(metaDoc.getBytes(ISO_8859_1), None)
    assert(d2 == Warc.DecodedText(metaDoc, "iso-8859-1", "meta"), s"$d2")
    // MISLABELED: header says utf-8, bytes are latin-1 → strict decode
    // rejects, latin-1 fallback recovers the exact text
    val d3 = Warc.decodeText(txt.getBytes(ISO_8859_1),
      Some("text/html; charset=utf-8"))
    assert(d3 == Warc.DecodedText(txt, "iso-8859-1", "fallback"), s"$d3")
    // undeclared invalid UTF-8 → fallback too
    val d3b = Warc.decodeText(txt.getBytes(ISO_8859_1), None)
    assert(d3b.source == "fallback" && d3b.text == txt, s"$d3b")
    // BOMs win over a (wrong) header and are stripped
    val d4 = Warc.decodeText(
      Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
        txt.getBytes(UTF_8), Some("text/html; charset=iso-8859-1"))
    assert(d4 == Warc.DecodedText(txt, "utf-8", "bom"), s"$d4")
    val d5 = Warc.decodeText(
      Array[Byte](0xFF.toByte, 0xFE.toByte) ++ txt.getBytes(UTF_16LE), None)
    assert(d5 == Warc.DecodedText(txt, "utf-16le", "bom"), s"$d5")
    val d6 = Warc.decodeText(
      Array[Byte](0xFE.toByte, 0xFF.toByte) ++ txt.getBytes(UTF_16BE), None)
    assert(d6 == Warc.DecodedText(txt, "utf-16be", "bom"), s"$d6")
    // unknown charset name: the chain continues (here to valid UTF-8)
    val d7 = Warc.decodeText(txt.getBytes(UTF_8),
      Some("text/html; charset=martian-9"))
    assert(d7 == Warc.DecodedText(txt, "utf-8", "default"), s"$d7")
    // parameter-boundary discipline (r18 advice): an x-charset=
    // extension parameter is NOT a charset declaration — the chain
    // falls through to the default instead of mis-decoding as SJIS
    assert(Warc.charsetParam("text/html; x-charset=shift_jis").isEmpty)
    assert(Warc.charsetParam(
      "text/plain; name=\"charset=evil.txt\"").isEmpty)
    assert(Warc.charsetParam("text/html;charset=euc-kr") ==
      Some("euc-kr"))
    assert(Warc.charsetParam("Charset=UTF-8") == Some("UTF-8"))
    val d7b = Warc.decodeText(txt.getBytes(UTF_8),
      Some("text/html; x-charset=iso-8859-1"))
    assert(d7b == Warc.DecodedText(txt, "utf-8", "default"), s"$d7b")
    // same boundary in the meta prescan: data-charset never declares
    val decoy = "<meta data-charset=\"iso-8859-1\">" + txt
    val d7c = Warc.decodeText(decoy.getBytes(UTF_8), None)
    assert(d7c == Warc.DecodedText(decoy, "utf-8", "default"), s"$d7c")
    // meta BEYOND the prescan window is ignored (chain falls through)
    val far = " " * Warc.MetaPrescanBytes +
      "<meta charset=\"iso-8859-1\">" + txt
    val d8 = Warc.decodeText(far.getBytes(ISO_8859_1), None)
    assert(d8.source == "fallback", s"$d8")
    // empty body decodes to '' via the default branch
    assert(Warc.decodeText(Array.emptyByteArray, None) ==
      Warc.DecodedText("", "utf-8", "default"))
  }

  test("property (seeded): the decode→extract seam round-trips 150 " +
      "random (charset, declaration, markup) assemblies — decodeText " +
      "reproduces the exact source string for every declared, " +
      "detectable, or latin-1-consistent page, and htmlText over the " +
      "decoded markup equals a driver-side reference extraction " +
      "(oracle parity is blind to shared-seam defects — r16 lesson)") {
    import java.nio.charset.{Charset, StandardCharsets}
    val rnd = new scala.util.Random(4242)
    val pools = Seq(
      ("ascii", "the quick brown fox 0123456789"),
      ("latin", "café naïve déjà"),
      ("hangul", "가나다라마바사아자차카타파하 한국어 문서 내용"),
      ("kana", "あいうえお カキクケコ です ます"))
    def randText(pool: String): String =
      (1 to (3 + rnd.nextInt(8))).map { _ =>
        val words = pool.split(" ")
        words(rnd.nextInt(words.length))
      }.mkString(" ")
    val cases = (1 to 150).map { i =>
      val (kind, pool) = pools(rnd.nextInt(pools.length))
      val cs = kind match {
        case "hangul" => if (rnd.nextBoolean()) "UTF-8" else "EUC-KR"
        case "kana" => if (rnd.nextBoolean()) "UTF-8" else "Shift_JIS"
        case "latin" => if (rnd.nextBoolean()) "UTF-8" else "ISO-8859-1"
        case _ => Seq("UTF-8", "ISO-8859-1", "EUC-KR")(rnd.nextInt(3))
      }
      val decl = rnd.nextInt(3) // 0 header, 1 meta, 2 none
      // every latin text carries at least one é-before-space byte pair
      // (0xE9 0x20) — invalid as an EUC-KR OR Shift_JIS sequence, so an
      // UNDECLARED latin-1 page can never be mis-detected as CJK (a
      // body of only 'naïve's is otherwise valid Shift_JIS bytes)
      val body = randText(pool) +
        (if (kind == "latin") " café x" else "")
      val head = if (decl == 1)
        s"""<meta charset="${cs.toLowerCase}">""" else ""
      val html = s"<html><head>$head</head><body> $body  </body></html>"
      val ct = if (decl == 0) Some(s"text/html; charset=$cs")
        else Some("text/html")
      (i, html, body, Charset.forName(cs), ct)
    }
    cases.foreach { case (i, html, _, cs, ct) =>
      val bytes = html.getBytes(cs)
      // every assembly is self-consistent: declared pages decode via
      // their declaration, undeclared UTF-8/ASCII via the default,
      // undeclared CJK via the detector, undeclared latin-1 via the
      // (byte-identical) latin-1 fallback — the TEXT must round-trip
      // exactly in all of them
      val d = Warc.decodeText(bytes, ct)
      assert(d.text == html, s"case $i lost text: $d\nhtml=$html")
    }
    // the extract half of the seam, through the real column path
    val df = TestSpark.spark.createDataFrame(
        cases.map { case (i, html, _, cs, ct) =>
          (i, Warc.decodeText(html.getBytes(cs), ct).text)
        }).toDF("i", "html")
      .select(col("i"), graft.operators.Web.htmlText(col("html")).as("t"))
    val got = df.collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    cases.foreach { case (i, _, body, _, _) =>
      // driver-side reference: tags carry no text here, so the clean
      // text is the body with whitespace collapsed and trimmed
      val want = body.replaceAll("\\s+", " ").trim
      assert(got(i) == want, s"case $i: got '${got(i)}', want '$want'")
    }
  }

  test("tx_warc_charset on the fixture dir: all ten sniff shapes " +
      "appear, the mislabeled AND curly-quote-trap pages really took " +
      "the fallback route, and the undeclared hangul/GB18030/Big5 " +
      "pages took the DETECTED route under the right charset") {
    val got = SparkEntry.queries("tx_warc_charset")(
      TestSpark.spark, TestSpark.sfDir).collect()
    assert(got.nonEmpty)
    val bySrc = got.groupBy(_.getString(2)).view.mapValues(_.length).toMap
    assert(Set("default", "header", "meta", "fallback", "bom", "detected")
      .subsetOf(bySrc.keySet), s"sources: $bySrc")
    got.foreach { r =>
      val id = r.getLong(0)
      val want = (id % 10) match {
        case 0 => ("utf-8", "default")
        case 1 => ("iso-8859-1", "header")
        case 2 => ("iso-8859-1", "meta")
        case 3 => ("iso-8859-1", "fallback")
        case 4 => ("utf-8", "bom")
        case 5 => ("utf-16le", "bom")
        case 6 => ("euc-kr", "detected")
        case 7 => ("gb18030", "detected")
        case 8 => ("big5", "detected")
        case _ => ("iso-8859-1", "fallback")
      }
      assert((r.getString(1), r.getString(2)) == want, s"doc $id")
    }
  }

  test("detectLegacyCjk (r18 missing #2): an undeclared EUC-KR hangul " +
      "page decodes correctly with source=detected, an undeclared " +
      "Shift_JIS kana page picks SJIS, declared charsets still win, " +
      "zero-evidence bytes keep the latin-1 fallback, and ASCII/UTF-8 " +
      "never reach the detector") {
    val kr = "한국어 문서 내용 테스트"
    val eucKr = java.nio.charset.Charset.forName("EUC-KR")
    val sjis = java.nio.charset.Charset.forName("Shift_JIS")
    // undeclared EUC-KR hangul → detected, text reproduced exactly
    val d1 = Warc.decodeText(kr.getBytes(eucKr), Some("text/html"))
    assert(d1 == Warc.DecodedText(kr, "euc-kr", "detected"), s"$d1")
    // undeclared Shift_JIS kana → detected as SJIS (the kana score
    // discriminates even when the bytes are also valid EUC-KR)
    val jp = "日本語のテストです、ひらがなとカタカナ"
    val d2 = Warc.decodeText(jp.getBytes(sjis), None)
    assert(d2.charset == "shift_jis" && d2.source == "detected" &&
      d2.text == jp, s"$d2")
    // a DECLARED charset still wins over detection
    val d3 = Warc.decodeText(kr.getBytes(eucKr),
      Some("text/html; charset=euc-kr"))
    assert(d3 == Warc.DecodedText(kr, "euc-kr", "header"), s"$d3")
    // latin-1-ish bytes with no CJK evidence keep the fallback
    val noise = "naïve café ±§"
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(Warc.decodeText(noise, None).source == "fallback")
    // valid UTF-8 never reaches the detector
    val d4 = Warc.decodeText(kr.getBytes("UTF-8"), None)
    assert(d4 == Warc.DecodedText(kr, "utf-8", "default"), s"$d4")
  }

  test("detectLegacyCjk zh candidates (r19 missing #1): undeclared " +
      "GB18030 and Big5 pages detect — frequency-scored, since each " +
      "usually strict-decodes in the OTHER zh charset too — markup- " +
      "wrapped bodies included, and the r19-ADVICE cp1252 curly-quote " +
      "trap keeps the measurable fallback (its SJIS/GB18030 decodes " +
      "are valid but carry no kana and fail the ideograph gates)") {
    import java.nio.charset.Charset
    val gb = Charset.forName("GB18030")
    val b5 = Charset.forName("Big5")
    val zhS = "文档 42 中文全文内容测试"
    val d1 = Warc.decodeText(zhS.getBytes(gb), Some("text/html"))
    assert(d1 == Warc.DecodedText(zhS, "gb18030", "detected"), s"$d1")
    val zhT = "文件 42 中文全文內容測試"
    val d2 = Warc.decodeText(zhT.getBytes(b5), None)
    assert(d2 == Warc.DecodedText(zhT, "big5", "detected"), s"$d2")
    // markup-wrapped: ASCII tags dilute density — the 5% gate must
    // still pass a real page shape
    val page = "<html><head></head><body>Article 3 rev 99 " +
      "中文全文内容测试的一个是不了 body content for the corpus " +
      "quality gate</body></html>"
    val d3 = Warc.decodeText(page.getBytes(gb), None)
    assert(d3 == Warc.DecodedText(page, "gb18030", "detected"), s"$d3")
    // the cp1252 trap (r19 ADVICE medium): '’' = 0x92 before 't' is a
    // VALID Shift_JIS and GB18030 ideograph pair — the old
    // ideographs-alone score silently upgraded this to mojibake with
    // source="detected"; the native-evidence + density gates must
    // keep the measurable latin-1 fallback
    val trap = "Doc 42 don’t won’t can’t stop the test page body " +
      "with plain ascii filler text to keep density low"
    val d4 = Warc.decodeText(
      trap.getBytes(Charset.forName("windows-1252")), None)
    assert(d4.source == "fallback" && d4.charset == "iso-8859-1", s"$d4")
    // undeclared EUC-KR still beats the structurally-valid GB decode
    // of the same bytes (frequency discriminates, not validity)
    val krTxt = "한국어 본문 내용"
    val d5 = Warc.decodeText(
      krTxt.getBytes(Charset.forName("EUC-KR")), None)
    assert(d5 == Warc.DecodedText(krTxt, "euc-kr", "detected"), s"$d5")
  }
}
