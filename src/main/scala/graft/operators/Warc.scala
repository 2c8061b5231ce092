package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** WARC (Web ARChive, ISO 28500) container codec — the entry format of
  * web-crawl training corpora — implemented byte-level against the spec,
  * JDK-only, plus real gzip via `java.util.zip` (a `.warc.gz` is
  * concatenated gzip members; `GZIPInputStream` consumes member chains
  * natively, which [[gunzip]] relies on).
  *
  * Writer and parser are exact inverses ([[writeRecords]] ∘
  * [[parseRecords]] = id, spec-pinned), which is what lets the
  * `tx_warc_roundtrip` driver query be a full hash-matched oracle: the
  * engine containers fixture documents into real gzipped WARC blobs and
  * parses them back; the oracle re-derives the record fields from the
  * TEXT, so a match proves both codec directions.
  *
  * Scale shape: blobs are assembled and parsed WITHIN a partition (a
  * record's output depends only on its own row, so no grouping shuffle is
  * needed — chunking is partition-local, exactly how a distributed WARC
  * writer shards) and bodies are `Array[Byte]` end to end (binary-safe —
  * a body may be an image, not text). */
object Warc {

  /** One parsed record: its WARC headers (name → value, names
    * case-preserved; REPEATED header names collapse to the LAST
    * occurrence — WARC named fields are single-valued, and a forged
    * duplicate must not shadow the value the parser acted on) and raw
    * body bytes. Prefer [[Record.header]] over raw map access:
    * externally-produced WARCs vary header-name case freely. */
  final case class Record(headers: Map[String, String], body: Array[Byte]) {
    /** Case-insensitive header lookup (exact-case match wins when both
      * exist). The fallback is DETERMINISTIC: among case-variant
      * spellings it takes the lexicographically smallest key — a forged
      * record carrying both `Content-Type` and `content-type` resolves
      * the same way on every run (a collectFirst over the unordered Map
      * did not). */
    def header(name: String): Option[String] =
      headers.get(name).orElse {
        val variants = headers.filter(_._1.equalsIgnoreCase(name))
        if (variants.isEmpty) None else Some(variants.minBy(_._1)._2)
      }
  }

  private val Crlf = "\r\n"

  /** Serialize (uri, body) pairs as a spec-shaped WARC blob: per record a
    * `WARC/1.0` version line, `WARC-Type: response`, `WARC-Target-URI`,
    * `Content-Length` (bytes of the body — the field a parser MUST trust,
    * since bodies are binary and may contain anything, including the
    * record delimiter itself), a blank line, the body, and the two blank
    * lines the spec requires between records. */
  def writeRecords(records: Seq[(String, Array[Byte])]): Array[Byte] =
    writeRecordsTyped(records.map { case (u, b) => (u, None, b) })

  /** [[writeRecords]] with an optional `Content-Type` per record — the
    * header a crawl consumer ROUTES on (text extraction vs image decode;
    * the `tx_warc_media` funnel). `None` omits the header, keeping the
    * untyped writer's byte output unchanged. */
  def writeRecordsTyped(
      records: Seq[(String, Option[String], Array[Byte])]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    records.foreach { case (uri, contentType, body) =>
      // a CR/LF inside the URI or content type would inject header lines
      // (e.g. a forged Content-Length) and break the write∘parse
      // identity — reject loudly; crawl URIs are attacker-influenced
      require(!uri.exists(c => c == '\r' || c == '\n'),
        s"URI contains CR/LF: ${uri.take(80)}")
      contentType.foreach(ct =>
        require(!ct.exists(c => c == '\r' || c == '\n'),
          s"Content-Type contains CR/LF: ${ct.take(80)}"))
      val header = "WARC/1.0" + Crlf +
        "WARC-Type: response" + Crlf +
        "WARC-Target-URI: " + uri + Crlf +
        contentType.fold("")(ct => "Content-Type: " + ct + Crlf) +
        "Content-Length: " + body.length + Crlf + Crlf
      out.write(header.getBytes(StandardCharsets.UTF_8))
      out.write(body)
      out.write((Crlf + Crlf).getBytes(StandardCharsets.UTF_8))
    }
    out.toByteArray
  }

  /** Parse a WARC blob into records. Walks version-line → headers →
    * `Content-Length` bytes of body → inter-record blank lines; header
    * values are everything after the first ": " (URIs contain colons).
    * Body extraction is LENGTH-driven, never delimiter-driven — a body
    * containing the bytes "WARC/1.0" must not split a record. */
  def parseRecords(blob: Array[Byte]): Seq[Record] = {
    val out = Seq.newBuilder[Record]
    var pos = 0
    def lineAt(p: Int): (String, Int) = {
      var e = p
      while (e + 1 < blob.length &&
        !(blob(e) == '\r'.toByte && blob(e + 1) == '\n'.toByte)) e += 1
      require(e + 1 < blob.length, s"unterminated line at offset $p")
      (new String(blob, p, e - p, StandardCharsets.UTF_8), e + 2)
    }
    while (pos < blob.length) {
      // tolerate inter-record CRLFs (the spec's two, or more)
      if (pos + 1 < blob.length && blob(pos) == '\r'.toByte &&
          blob(pos + 1) == '\n'.toByte) { pos += 2 }
      else {
        val (version, afterVersion) = lineAt(pos)
        require(version.startsWith("WARC/"),
          s"expected WARC version line at offset $pos, got '$version'")
        var p = afterVersion
        val headers = Map.newBuilder[String, String]
        var contentLength = -1
        var line = ""
        while ({ val (l, np) = lineAt(p); line = l; p = np; l.nonEmpty }) {
          val sep = line.indexOf(": ")
          require(sep > 0, s"malformed header '$line'")
          val k = line.substring(0, sep)
          val v = line.substring(sep + 2)
          headers += k -> v
          if (k.equalsIgnoreCase("Content-Length")) contentLength = v.toInt
        }
        require(contentLength >= 0, "record without Content-Length")
        require(p + contentLength <= blob.length,
          s"truncated body at offset $p (need $contentLength)")
        out += Record(headers.result(),
          java.util.Arrays.copyOfRange(blob, p, p + contentLength))
        pos = p + contentLength
      }
    }
    out.result()
  }

  /** A charset-sniffed body decode: the text, the charset that decoded
    * it (JVM canonical name, lowercased), and which SIGNAL decided —
    * `bom` | `header` | `meta` | `default` | `fallback`. */
  final case class DecodedText(text: String, charset: String,
      source: String)

  /** The `charset=` parameter of a Content-Type header value
    * (case-insensitive, optional quotes), None when absent. The
    * parameter NAME is matched at a parameter boundary (start of
    * value, `;`, `,`, or whitespace — the same whole-token discipline
    * as the HTML rel/robots matchers): a `x-charset=shift_jis`
    * extension parameter or a filename containing `charset=` never
    * mis-routes the sniff chain. */
  def charsetParam(contentType: String): Option[String] = {
    val m = java.util.regex.Pattern
      .compile("(?i)(?:^|[;,\\s])charset[ \t]*=[ \t]*\"?([A-Za-z0-9_.:+-]+)\"?")
      .matcher(contentType)
    if (m.find()) Some(m.group(1)) else None
  }

  /** How many leading bytes the meta prescan reads — the WHATWG
    * encoding-sniffing convention (browsers prescan the first KiB for
    * a `<meta charset>` before committing to a decoder). */
  val MetaPrescanBytes: Int = 1024

  private def charsetOf(name: String): Option[java.nio.charset.Charset] =
    try Some(java.nio.charset.Charset.forName(name.trim))
    catch { case _: IllegalArgumentException => None }

  private def strictDecode(bytes: Array[Byte], off: Int,
      cs: java.nio.charset.Charset): Option[String] =
    try {
      val dec = cs.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      Some(dec.decode(java.nio.ByteBuffer.wrap(bytes, off,
        bytes.length - off)).toString)
    } catch { case _: java.nio.charset.CharacterCodingException => None }

  // the `charset` attribute/param name needs a boundary on its left
  // (tag whitespace or a quote/semicolon from an http-equiv content
  // value) so a `data-charset=` attribute never reads as a declaration
  private val MetaCharsetPattern = java.util.regex.Pattern.compile(
    "(?i)<meta[ \t\r\n](?:[^>]*[ \t\r\n\"';])?charset[ \t\r\n]*=" +
      "[ \t\r\n]*[\"']?([A-Za-z0-9_.:+-]+)")

  /** Decode a crawl body's BYTES to text with charset sniffing — the
    * boundary between the binary-safe WARC container and the
    * string-typed HTML pipeline (r17 missing #1: real crawls are full
    * of non-UTF-8 and MISLABELED pages; parsing raw bytes as UTF-8
    * silently corrupts them). Signal precedence, the WHATWG
    * encoding-sniffing order:
    *
    *  1. a BOM wins outright (UTF-8 / UTF-16LE / UTF-16BE; stripped
    *     from the text),
    *  2. else the Content-Type header's `charset=` parameter,
    *  3. else a prescan of the first [[MetaPrescanBytes]] bytes (read
    *     as Latin-1 — the meta tag itself is ASCII) for a
    *     `<meta charset=…>` / `http-equiv` declaration,
    *  4. else strict UTF-8,
    *  5. else legacy-CJK content detection ([[detectLegacyCjk]] —
    *     EUC-KR / Shift_JIS / GB18030 / Big5, native-script-gated
    *     and frequency-scored, `source = "detected"`).
    *
    * Every DECLARED charset is tried STRICTLY (malformed input
    * REPORTs, never silently replaces): a declaration the bytes
    * contradict — the classic mislabeled-latin-1-as-utf-8 page — falls
    * back to ISO-8859-1, which decodes any byte sequence, and the
    * result carries `source = "fallback"` so downstream quality gates
    * can weight it. Unknown charset names are treated as undeclared
    * (the sniff chain continues). Pure per-row JVM work — runs inside
    * the same mapPartitions seam as the WARC parse; only decoded
    * strings leave the partition. */
  def decodeText(body: Array[Byte],
      contentType: Option[String] = None): DecodedText = {
    def label(cs: java.nio.charset.Charset): String =
      cs.name().toLowerCase(java.util.Locale.ROOT)
    def latin1 = new String(body, StandardCharsets.ISO_8859_1)
    def fallback = DecodedText(latin1, "iso-8859-1", "fallback")
    val n = body.length
    // 1. BOM
    val bom =
      if (n >= 3 && body(0) == 0xEF.toByte && body(1) == 0xBB.toByte &&
        body(2) == 0xBF.toByte) Some((StandardCharsets.UTF_8, 3))
      else if (n >= 2 && body(0) == 0xFF.toByte && body(1) == 0xFE.toByte)
        Some((StandardCharsets.UTF_16LE, 2))
      else if (n >= 2 && body(0) == 0xFE.toByte && body(1) == 0xFF.toByte)
        Some((StandardCharsets.UTF_16BE, 2))
      else None
    bom match {
      case Some((cs, off)) =>
        strictDecode(body, off, cs)
          .map(t => DecodedText(t, label(cs), "bom")).getOrElse(fallback)
      case None =>
        // 2. header, 3. meta prescan — first KNOWN declaration wins
        val header = contentType.flatMap(charsetParam).flatMap(charsetOf)
        val declared = header.map((_, "header")).orElse {
          val win = new String(body, 0, math.min(n, MetaPrescanBytes),
            StandardCharsets.ISO_8859_1)
          val m = MetaCharsetPattern.matcher(win)
          (if (m.find()) charsetOf(m.group(1)) else None).map((_, "meta"))
        }
        declared match {
          case Some((cs, src)) =>
            strictDecode(body, 0, cs)
              .map(t => DecodedText(t, label(cs), src)).getOrElse(fallback)
          case None =>
            // 4. strict UTF-8, 5. legacy-CJK detection, 6. latin-1 net
            strictDecode(body, 0, StandardCharsets.UTF_8)
              .map(t => DecodedText(t, "utf-8", "default"))
              .orElse(detectLegacyCjk(body))
              .getOrElse(fallback)
        }
    }
  }

  /** The highest-frequency hanzi of running Chinese text — the union
    * of the standard simplified and traditional frequency lists (the
    * top of every published zh frequency table; traditional variants
    * included where the forms differ). The FREQUENCY discriminator
    * of [[detectLegacyCjk]]'s zh candidates: GB and Big5 byte ranges
    * overlap so heavily that a page in one usually strict-decodes in
    * the other — to WRONG ideographs, which hit this set at the
    * ~1-2% random rate instead of the ~30% running-text rate. */
  val CommonHanzi: Set[Char] =
    ("的一是不了人我在有他这中大来上国个到说们为子和你地出道也时年" +
      "得就那要下以生会自着去之过家学对可她里后小么心多天而能好都然" +
      "没日于起还发成事只作当想看文无开手十用主行方又如前所本见经头" +
      "面公同三已老从动两长知民样现分将外但身些与高意进把法此实回二" +
      "理美点月明其种声全工己话儿者向情部正名定女问力机给等几很业最" +
      "间新什打便位因重被走电四第门相次东政海口使教西再平真听世气信" +
      "北少关并内加化由却代军产入先山五太水万市眼体别处总才场师书比" +
      "住员九笑性通目华报立马命张活难神数件安表原车白应路期叫死常提" +
      "感金何更反题墨哥器识验讲按像却斯品呢川即指争副周党完间回件形" +
      "這個們來時為說國學對裡後發沒無於點還經頭長與書東車馬門問間陽" +
      "雲電話應總體讓觀歡愛戰寫讀語聽").toSet

  /** The highest-frequency hangul syllables of running Korean text
    * (top of the published syllable-frequency tables) — the same
    * frequency discriminator for the EUC-KR candidate: GB2312 bytes
    * are structurally valid EUC-KR and decode to hangul-row
    * syllables, but random syllables hit this set at the ~2% rate
    * where real Korean running text hits ~35%. */
  val CommonHangul: Set[Char] =
    ("이다의에는가을하고지를은서대로있것들사기어나그자수전적도부국" +
      "문와인생소정제상시중내용해주위성보요원본과년만동장리러니스한" +
      "습무엇일걸음식당신래간단말같면좋아오려운모습발했래또거겠네요" +
      "공간경우치면터레메타트프라마바카파타차").toSet
      .filter(c => c >= 0xAC00 && c <= 0xD7A3)

  /** Minimum CJK-ideograph count AND maximum body-share below which a
    * zh candidate is not trusted (r19 ADVICE medium: a cp1252 page
    * whose only non-ASCII bytes are curly-quote pairs strict-decodes
    * in GB18030 to a few scattered ideographs — positive-looking
    * evidence the density gates must reject). */
  val MinZhIdeographs: Int = 4

  /** Content-heuristic detection for UNDECLARED legacy CJK pages (r18
    * missing #2; GB18030/Big5 added in r20 — r19 missing #1: legacy
    * zh pages, a large share of the pre-2010 web, previously always
    * landed in the latin-1 fallback). Runs ONLY after strict UTF-8
    * fails (pure-ASCII and modern pages never get here). Each
    * candidate charset must decode the whole body STRICTLY, and a
    * candidate is ELIGIBLE only with native-script evidence (r19
    * ADVICE medium — ideographs alone are NOT evidence, because
    * cp1252 punctuation pairs like `’t` are valid Shift_JIS/GB18030
    * ideograph codes: the exact silent-mojibake class the detector
    * exists to prevent):
    *
    *  - EUC-KR: ≥1 Hangul syllable; score `2·hangul + ideographs +
    *    6·common-syllables` ([[CommonHangul]] — GB2312 bytes decode
    *    to structurally-valid hangul, so frequency, not validity,
    *    discriminates),
    *  - Shift_JIS: ≥1 kana; score `2·kana + ideographs` (kana is
    *    already distinctive — EUC-KR hangul bytes read as SJIS
    *    HALFWIDTH katakana, outside the scored fullwidth range),
    *  - GB18030 / Big5: ≥[[MinZhIdeographs]] ideographs AND ≥5% of
    *    decoded chars AND ≥1 [[CommonHanzi]] hit; score
    *    `2·ideographs + 6·common-hanzi` (the two zh encodings
    *    usually both strict-decode — the wrong one to garbage hanzi
    *    that miss the frequency table).
    *
    * The strictly-highest eligible score wins; ties and zero
    * eligibility return None and the caller keeps the MEASURABLE
    * latin-1 fallback, so the detector can only upgrade pages it has
    * positive evidence for. `source = "detected"` lets corpus
    * funnels count the route separately from declarations. */
  def detectLegacyCjk(body: Array[Byte]): Option[DecodedText] = {
    def decoded(name: String): Option[DecodedText] =
      charsetOf(name).flatMap(cs => strictDecode(body, 0, cs).map(t =>
        DecodedText(t, cs.name().toLowerCase(java.util.Locale.ROOT),
          "detected")))
    def ideo(t: String): Long =
      t.count(c => c >= 0x4E00 && c <= 0x9FFF).toLong
    val euc = decoded("EUC-KR").flatMap { d =>
      val hangul = d.text.count(c => c >= 0xAC00 && c <= 0xD7A3).toLong
      if (hangul == 0) None
      else Some((d, 2L * hangul + ideo(d.text) +
        6L * d.text.count(CommonHangul)))
    }
    val sjis = decoded("Shift_JIS").flatMap { d =>
      val kana = d.text.count(c => c >= 0x3040 && c <= 0x30FF).toLong
      if (kana == 0) None else Some((d, 2L * kana + ideo(d.text)))
    }
    def zh(name: String): Option[(DecodedText, Long)] =
      decoded(name).flatMap { d =>
        val i = ideo(d.text)
        val common = d.text.count(CommonHanzi).toLong
        if (i < MinZhIdeographs || i * 20 < d.text.length || common == 0)
          None
        else Some((d, 2L * i + 6L * common))
      }
    val cands = Seq(euc, sjis, zh("GB18030"), zh("Big5")).flatten
    if (cands.isEmpty) None
    else {
      val best = cands.maxBy(_._2)
      if (cands.count(_._2 == best._2) > 1) None else Some(best._1)
    }
  }

  /** Real gzip (RFC 1952) via the JDK — one member. */
  def gzip(bytes: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(bos)
    gz.write(bytes); gz.close()
    bos.toByteArray
  }

  /** Decompress a gzip payload INCLUDING concatenated members — the
    * `.warc.gz` convention is one member per record, and
    * `GZIPInputStream` consumes the member chain natively. */
  def gunzip(bytes: Array[Byte]): Array[Byte] = {
    val in = new GZIPInputStream(new ByteArrayInputStream(bytes))
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    in.close()
    out.toByteArray
  }
}
