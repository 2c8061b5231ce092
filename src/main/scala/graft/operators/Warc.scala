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
