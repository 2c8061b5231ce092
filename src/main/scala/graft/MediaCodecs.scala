package graft

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import javax.imageio.ImageIO

/** REAL media codecs over the [[Multimodal]] decoder seam — JDK-only, no
  * external libraries (this container has no native image/audio stacks, but
  * `javax.imageio` and plain byte parsing ship with Java SE and run
  * headless):
  *
  *   - images: [[ImageIoPixelDecoder]] / [[ImageIoDecoder]] decode PNG /
  *     JPEG / BMP / GIF payloads via `ImageIO`, integer-luma grayscale, and
  *     a deterministic cell-partition area-average down to the
  *     [[Multimodal.PhashGridRows]]×[[Multimodal.PhashGridCols]] phash grid
  *     (every source pixel belongs to exactly one cell — floor-division
  *     assignment, integer sums — so the resize is bit-reproducible across
  *     JVMs and partitions, unlike float bilinear).
  *   - audio: [[encodeWavPcm16]] / [[decodeWavPcm16]] implement the RIFF /
  *     WAVE PCM-16 container by hand (chunk walk, little-endian, odd-size
  *     pad), and [[WavDecoder]] exposes it through the feature seam.
  *
  * These upgrade the r9–r14 "stub decode / decoder seam proven with a
  * test-side BMP parser" boundary (see [[Multimodal.StubPixelDecoder]]) to
  * production codecs for the formats the JDK carries; anything beyond
  * (video containers, MP3/FLAC) stays behind the same traits.
  *
  * Determinism note: gray 8-bit PNG is lossless, so an encode→decode round
  * trip reproduces pixels exactly — that is what lets `mm_png_roundtrip` /
  * `mm_wav_features` be full hash-matched DuckDB oracles rather than
  * rows-only checks (the oracle re-derives the pre-encode content; the
  * engine must recover it through the real codec). JPEG is lossy, so its
  * contract is spec-level (phash stability under re-encode), not
  * oracle-level.
  */
object MediaCodecs {

  // one-time JVM setup: ImageIO must not touch a display or spill its
  // working buffers to temp files on executor disks
  System.setProperty("java.awt.headless", "true")
  ImageIO.setUseCache(false)

  // ---- images ----------------------------------------------------------

  /** Decode any ImageIO-supported payload (PNG/JPEG/BMP/GIF in a stock
    * JDK). Throws on unsupported/corrupt bytes — callers on ingest paths
    * that expect dirty data should wrap (see `decodeImageOpt`). */
  def decodeImage(payload: Array[Byte]): BufferedImage = {
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    require(img != null, "payload is not a decodable image (PNG/JPEG/BMP/GIF)")
    img
  }

  /** Ingest-tolerant variant: undecodable bytes → None (a 100 TB crawl
    * always contains truncated files; a codec exception must drop the row,
    * not the task). NonFatal, not just IOException: the JDK's GIF/JPEG/BMP
    * readers throw IndexOutOfBounds/IllegalArgument/NegativeArraySize on
    * malformed headers (e.g. a GIF whose screen descriptor lies about its
    * palette size) — those must drop the row too. */
  def decodeImageOpt(payload: Array[Byte]): Option[BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(payload)))
    catch { case scala.util.control.NonFatal(_) => None }

  /** Integer ITU-R BT.601 luma — all-integer so every JVM agrees. */
  @inline def luma(argb: Int): Int = {
    val r = (argb >> 16) & 0xff
    val g = (argb >> 8) & 0xff
    val b = argb & 0xff
    (299 * r + 587 * g + 114 * b) / 1000
  }

  /** Deterministic area-average resize to a `rows × cols` grayscale grid:
    * source pixel (x, y) belongs to cell (y·rows/h, x·cols/w) — the same
    * even floor-division slicing [[Multimodal.StubPixelDecoder]] uses on
    * code points — and each cell averages its members with integer sums.
    * Exact when cell blocks are constant (the round-trip fixtures) and
    * stable under any pixel iteration order otherwise. */
  def grayGrid(img: BufferedImage, rows: Int, cols: Int): Array[Int] = {
    val w = img.getWidth
    val h = img.getHeight
    require(w > 0 && h > 0, "empty image")
    val sums = new Array[Long](rows * cols)
    val counts = new Array[Long](rows * cols)
    val gray = img.getType == BufferedImage.TYPE_BYTE_GRAY
    val raster = img.getRaster
    // bulk row fetch: one JNI-free array copy per scanline instead of a
    // virtual call per pixel — the decode loop is the hot path when this
    // runs over a media lake
    val rowBuf = new Array[Int](w)
    var y = 0
    while (y < h) {
      val cy = ((y.toLong * rows) / h).toInt
      if (gray) raster.getSamples(0, y, w, 1, 0, rowBuf)
      else img.getRGB(0, y, w, 1, rowBuf, 0, w)
      var x = 0
      while (x < w) {
        val cx = ((x.toLong * cols) / w).toInt
        val v = if (gray) rowBuf(x) else luma(rowBuf(x))
        sums(cy * cols + cx) += v
        counts(cy * cols + cx) += 1
        x += 1
      }
      y += 1
    }
    // images SMALLER than the grid (1×1 tracking pixels are everywhere in
    // a crawl) leave some cells with no member under floor-division
    // assignment — fill those by nearest-pixel sampling instead of
    // dividing by zero
    Array.tabulate(rows * cols) { i =>
      if (counts(i) > 0) (sums(i) / counts(i)).toInt
      else {
        val x = math.min(w - 1, ((i % cols).toLong * w / cols).toInt)
        val yy = math.min(h - 1, ((i / cols).toLong * h / rows).toInt)
        if (gray) raster.getSample(x, yy, 0) else luma(img.getRGB(x, yy))
      }
    }
  }

  /** Real-codec [[Multimodal.PixelDecoder]]: ImageIO decode + [[grayGrid]]
    * to the phash grid. Drops into [[Multimodal.phash]] /
    * [[Multimodal.phashPairs]] unchanged — decode stays map-only; only the
    * 8-byte hash leaves the partition. */
  class ImageIoPixelDecoder extends Multimodal.PixelDecoder {
    def decodeGray(kind: String, payload: Array[Byte]): Array[Int] =
      grayGrid(decodeImage(payload),
        Multimodal.PhashGridRows, Multimodal.PhashGridCols)
  }

  /** Real-codec [[Multimodal.Decoder]]: width/height from the actual
    * header, one frame, and an 8-dim feature = the 2×4 luma grid scaled to
    * [−1, 1] (deterministic integer pipeline → exact float). */
  class ImageIoDecoder extends Multimodal.Decoder {
    def decode(kind: String, payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
      val img = decodeImage(payload)
      val g = grayGrid(img, 2, 4)
      (img.getWidth, img.getHeight, 1, g.map(v => v / 127.5f - 1.0f))
    }
  }

  /** Encode a row-major grayscale grid (values 0–255) as a REAL 8-bit gray
    * PNG via ImageIO — lossless, so decode recovers the grid exactly. */
  def encodeGrayPng(w: Int, h: Int, px: Array[Int]): Array[Byte] = {
    require(px.length == w * h, s"need $w*$h pixels, got ${px.length}")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, px(y * w + x) & 0xff); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    require(ImageIO.write(img, "png", bos), "no PNG writer in this JVM")
    bos.toByteArray
  }

  /** The md5-cell grayscale grid of a text payload (0–255): cell i's pixel
    * is the FIRST byte of md5 of the i-th even code-point slice — the same
    * slicing contract as [[Multimodal.StubPixelDecoder]] (verbatim
    * re-derivable in DuckDB as `('0x' || substr(md5(substr(text, …)), 1,
    * 2))::BIGINT`), truncated to one byte so it IS a pixel. This is the
    * deterministic "render" half of the PNG round-trip oracle. */
  def mdGrid256(text: String, rows: Int = Multimodal.PhashGridRows,
      cols: Int = Multimodal.PhashGridCols): Array[Int] = {
    val n = rows * cols
    val cp = text.codePointCount(0, text.length)
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(n) { i =>
      val a = text.offsetByCodePoints(0, ((i.toLong * cp) / n).toInt)
      val b = text.offsetByCodePoints(0, (((i + 1).toLong * cp) / n).toInt)
      md.reset()
      md.digest(text.substring(a, b).getBytes(StandardCharsets.UTF_8))(0) & 0xff
    }
  }

  /** Tagged md5-cell grid: cell i's pixel = first md5 byte of (slice_i of
    * `text`, sliced once by the [[mdGrid256]] code-point contract, with
    * `tag` appended before hashing). Slicing the TEXT once keeps cell
    * boundaries identical across tags, so a DuckDB oracle re-derives any
    * tag's grid as `md5(substr(text, …) || tag)` — this is how each GIF
    * frame's content varies by scene while staying oracle-derivable. */
  def mdGridTagged(text: String, tag: String,
      rows: Int = Multimodal.PhashGridRows,
      cols: Int = Multimodal.PhashGridCols): Array[Int] = {
    val n = rows * cols
    val cp = text.codePointCount(0, text.length)
    val md = java.security.MessageDigest.getInstance("MD5")
    val tagBytes = tag.getBytes(StandardCharsets.UTF_8)
    Array.tabulate(n) { i =>
      val a = text.offsetByCodePoints(0, ((i.toLong * cp) / n).toInt)
      val b = text.offsetByCodePoints(0, (((i + 1).toLong * cp) / n).toInt)
      md.reset()
      md.update(text.substring(a, b).getBytes(StandardCharsets.UTF_8))
      md.digest(tagBytes)(0) & 0xff
    }
  }

  // ---- animated GIF (the JDK's real multi-frame container) --------------

  /** Encode row-major grayscale frames (each `w*h`, values 0–255) as a REAL
    * animated GIF via the JDK's sequence writer. GIF palettizes; a 256-gray
    * palette is lossless for gray content, so decode recovers every frame's
    * pixels exactly — the property the `mm_gif_keyframes` oracle rests on. */
  def encodeGifFrames(w: Int, h: Int,
      frames: Seq[Array[Int]]): Array[Byte] = {
    require(frames.nonEmpty, "need at least one frame")
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { px =>
        require(px.length == w * h, s"need $w*$h pixels, got ${px.length}")
        val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { raster.setSample(x, y, 0, px(y * w + x) & 0xff); x += 1 }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Decode every frame of a (possibly animated) GIF payload as LOGICAL
    * SCREENS. Full-frame OPAQUE GIFs (every frame covers the screen at
    * 0,0, no frame is transparent, disposal keeps — the
    * [[encodeGifFrames]]/oracle path) return the reader's frames
    * untouched (palettized TYPE_BYTE_INDEXED; [[grayGrid]]'s getRGB+luma
    * path recovers gray values exactly, luma(v,v,v) = v). A full-size
    * frame carrying a transparent index delta-encodes against the
    * previous screen (r17 ADVICE #1) and routes to compositing like any
    * partial-update frame.
    *
    * OPTIMIZED animations — partial-update frames (sub-rectangles at an
    * image-descriptor offset, under a GIF89a disposal method) — are
    * COMPOSITED (r16 verdict #7; previously loud-rejected): each frame
    * draws onto a persistent ARGB canvas at its offset (transparent
    * pixels leave the canvas through — the reader's IndexColorModel
    * carries the transparent index), the displayed screen is snapshot,
    * and the frame's rect is then disposed per its method —
    * `none`/`doNotDispose` keep it, `restoreToBackgroundColor` clears
    * the rect to transparent (the convention modern decoders follow;
    * cleared pixels read luma 0 downstream), `restoreToPrevious`
    * reverts the canvas to its pre-frame state. What stays loudly
    * rejected: frame rects escaping the logical screen and the spec's
    * undefined disposal values — silently guessing either would hand
    * keyframe/hamming analysis a wrong screen. */
  def decodeGifFrames(payload: Array[Byte]): IndexedSeq[BufferedImage] = {
    val reader = ImageIO.getImageReadersByFormatName("gif").next()
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
    try {
      reader.setInput(iis)
      val n = reader.getNumImages(true)
      require(n > 0, "no frames in GIF payload")
      // the reference rectangle is the LOGICAL SCREEN from the stream
      // metadata — comparing frames against frame 0 would treat a GIF
      // whose every frame is the same sub-rectangle crop of a larger
      // screen (all at offset 0,0) as full-frame; fall back to frame
      // 0's size only when the descriptor is absent
      val (sw, sh) = Option(reader.getStreamMetadata).flatMap { md =>
        val tree = md.getAsTree("javax_imageio_gif_stream_1.0")
          .asInstanceOf[org.w3c.dom.Element]
        val ls = tree.getElementsByTagName("LogicalScreenDescriptor")
        if (ls.getLength == 0) None
        else {
          val e = ls.item(0).asInstanceOf[org.w3c.dom.Element]
          Some((e.getAttribute("logicalScreenWidth").toInt,
            e.getAttribute("logicalScreenHeight").toInt))
        }
      }.getOrElse((reader.getWidth(0), reader.getHeight(0)))
      val metas = (0 until n).map { i =>
        val root = reader.getImageMetadata(i)
          .getAsTree("javax_imageio_gif_image_1.0")
          .asInstanceOf[org.w3c.dom.Element]
        val d = root.getElementsByTagName("ImageDescriptor").item(0)
          .asInstanceOf[org.w3c.dom.Element]
        val gce = root.getElementsByTagName("GraphicControlExtension")
        val (disposal, transparent) =
          if (gce.getLength == 0) ("none", false)
          else {
            val e = gce.item(0).asInstanceOf[org.w3c.dom.Element]
            (e.getAttribute("disposalMethod") match {
              case "" => "none"
              case s => s
            }, e.getAttribute("transparentColorFlag")
              .equalsIgnoreCase("TRUE"))
          }
        (d.getAttribute("imageLeftPosition").toInt,
          d.getAttribute("imageTopPosition").toInt, disposal, transparent)
      }
      val frames = (0 until n).map(reader.read)
      // the fast path requires every frame to FULLY REPAINT the screen:
      // screen-sized at (0,0), OPAQUE (r17 ADVICE #1: optimized GIFs
      // commonly emit full-size frames that delta-encode via the
      // transparent index — returning those raw hands downstream luma
      // the transparent index's palette RGB instead of the composited
      // screen), and a keep disposal (a restore disposal implies the
      // NEXT frame reveals canvas the current one doesn't own)
      val fullFrame = metas.forall(m => m._1 == 0 && m._2 == 0 &&
          !m._4 && (m._3 == "none" || m._3 == "doNotDispose")) &&
        frames.forall(f => f.getWidth == sw && f.getHeight == sh)
      if (fullFrame) frames
      else {
        frames.zip(metas).zipWithIndex.foreach { case ((f, m), i) =>
          require(m._1 >= 0 && m._2 >= 0 && m._1 + f.getWidth <= sw &&
            m._2 + f.getHeight <= sh,
            s"GIF frame $i rect (${m._1},${m._2})+" +
              s"${f.getWidth}x${f.getHeight} escapes the ${sw}x$sh " +
              "logical screen")
          require(Set("none", "doNotDispose", "restoreToBackgroundColor",
            "restoreToPrevious")(m._3),
            s"GIF frame $i has unsupported disposal method '${m._3}'")
        }
        def snapshot(img: BufferedImage): BufferedImage = {
          val c = new BufferedImage(sw, sh, BufferedImage.TYPE_INT_ARGB)
          val g = c.createGraphics()
          g.setComposite(java.awt.AlphaComposite.Src)
          g.drawImage(img, 0, 0, null)
          g.dispose()
          c
        }
        var canvas = new BufferedImage(sw, sh, BufferedImage.TYPE_INT_ARGB)
        val out = IndexedSeq.newBuilder[BufferedImage]
        frames.zip(metas).foreach { case (f, (left, top, disposal, _)) =>
          val before =
            if (disposal == "restoreToPrevious") Some(snapshot(canvas))
            else None
          val g = canvas.createGraphics()
          g.drawImage(f, left, top, null)
          g.dispose()
          out += snapshot(canvas)
          disposal match {
            case "restoreToBackgroundColor" =>
              val g2 = canvas.createGraphics()
              g2.setComposite(java.awt.AlphaComposite.Clear)
              g2.fillRect(left, top, f.getWidth, f.getHeight)
              g2.dispose()
            case "restoreToPrevious" => canvas = before.get
            case _ => ()
          }
        }
        out.result()
      }
    } finally { reader.dispose(); iis.close() }
  }

  // ---- MPEG audio (MP3) frame-header metadata probe ----------------------

  /** MP3 container metadata: what a crawl ROUTES and FILTERS on before
    * ever paying a decode — sample rate, frame count, total bitrate
    * mass (for the average), VBR-ness, and the exact sample-derived
    * duration. */
  final case class Mp3Meta(sampleRate: Int, nFrames: Int, sumKbps: Long,
      vbr: Boolean) {
    /** Layer III MPEG-1 frames carry 1152 samples; duration in integer
      * milliseconds (floor), engine-exact. */
    def durationMs: Long = 1152L * nFrames * 1000L / sampleRate
  }

  /** MPEG-1 Layer III bitrate table (kbps; index 0 = "free format",
    * index 15 = invalid — both loud-rejected by the parser). */
  val Mp3BitrateKbps: Array[Int] =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)

  /** MPEG-1 sample-rate table (index 3 = reserved). */
  val Mp3SampleRates: Array[Int] = Array(44100, 48000, 32000)

  /** Synthesize a REAL MPEG-1 Layer III frame stream (valid sync +
    * header fields + correctly-sized zero payloads — byte-level per the
    * public header layout), optionally prefixed by an ID3v2 tag with a
    * syncsafe size. Not playable audio (payloads are silence-less
    * zeros), but every field a header parser reads is real — the
    * fixture contract [[parseMp3Meta]] is oracle-gated against. */
  def encodeMp3Frames(sampleRateIdx: Int, bitrateIdxs: Seq[Int],
      id3Bytes: Int = 0): Array[Byte] = {
    require(sampleRateIdx >= 0 && sampleRateIdx <= 2, "bad sample rate idx")
    require(bitrateIdxs.nonEmpty &&
      bitrateIdxs.forall(i => i >= 1 && i <= 14), "bitrate idx out of 1..14")
    val out = new ByteArrayOutputStream()
    if (id3Bytes > 0) {
      require(id3Bytes < (1 << 28), "ID3 tag too large for syncsafe size")
      out.write('I'); out.write('D'); out.write('3')
      out.write(4); out.write(0) // version 2.4.0
      out.write(0) // flags
      out.write((id3Bytes >> 21) & 0x7f); out.write((id3Bytes >> 14) & 0x7f)
      out.write((id3Bytes >> 7) & 0x7f); out.write(id3Bytes & 0x7f)
      out.write(new Array[Byte](id3Bytes))
    }
    val sr = Mp3SampleRates(sampleRateIdx)
    bitrateIdxs.foreach { bi =>
      val kbps = Mp3BitrateKbps(bi)
      val frameLen = 144 * kbps * 1000 / sr // padding bit 0
      out.write(0xff)
      out.write(0xfb) // 111 (sync tail) | 11 (MPEG1) | 01 (Layer III) | 1 (no CRC)
      out.write((bi << 4) | (sampleRateIdx << 2)) // bitrate | sr | pad 0 | priv 0
      out.write(0xc0) // mono, no mode ext, not copyrighted... flags byte
      out.write(new Array[Byte](frameLen - 4))
    }
    out.toByteArray
  }

  /** Parse an MPEG-1 Layer III stream's frame headers into [[Mp3Meta]]
    * — LENGTH-driven like the WARC walker (each header's bitrate/rate
    * fields size its own frame; payload bytes are never scanned for
    * sync, so payload bytes that LOOK like sync words cannot split a
    * frame). A leading ID3v2 tag is skipped via its syncsafe size.
    * Loud rejects (a crawl must route malformed audio to quarantine,
    * not mis-measure it): bad sync, reserved version/layer (only
    * MPEG-1 Layer III in scope — documented boundary), free-format or
    * invalid bitrate, reserved sample rate, a mid-stream sample-rate
    * change, and truncated final frames. */
  def parseMp3Meta(payload: Array[Byte]): Mp3Meta = {
    var pos = 0
    if (payload.length >= 10 && payload(0) == 'I' && payload(1) == 'D' &&
        payload(2) == '3') {
      val size = ((payload(6) & 0x7f) << 21) | ((payload(7) & 0x7f) << 14) |
        ((payload(8) & 0x7f) << 7) | (payload(9) & 0x7f)
      pos = 10 + size
      require(pos <= payload.length, "ID3v2 tag runs past the payload")
    }
    var nFrames = 0
    var sumKbps = 0L
    var minKbps = Int.MaxValue
    var maxKbps = 0
    var sampleRate = -1
    while (pos + 4 <= payload.length) {
      val b1 = payload(pos) & 0xff; val b2 = payload(pos + 1) & 0xff
      val b3 = payload(pos + 2) & 0xff
      require(b1 == 0xff && (b2 & 0xe0) == 0xe0,
        f"bad MP3 sync at offset $pos: $b1%02x $b2%02x")
      require(((b2 >> 3) & 3) == 3 && ((b2 >> 1) & 3) == 1,
        s"only MPEG-1 Layer III is in scope (header byte $b2 at $pos)")
      val bi = (b3 >> 4) & 0xf
      require(bi >= 1 && bi <= 14,
        s"free-format/invalid bitrate index $bi at offset $pos")
      val sri = (b3 >> 2) & 3
      require(sri != 3, s"reserved sample-rate index at offset $pos")
      val sr = Mp3SampleRates(sri)
      require(sampleRate < 0 || sampleRate == sr,
        s"sample rate changed mid-stream at offset $pos")
      sampleRate = sr
      val kbps = Mp3BitrateKbps(bi)
      val frameLen = 144 * kbps * 1000 / sr + ((b3 >> 1) & 1)
      require(pos + frameLen <= payload.length,
        s"truncated MP3 frame at offset $pos (need $frameLen)")
      nFrames += 1; sumKbps += kbps
      if (kbps < minKbps) minKbps = kbps
      if (kbps > maxKbps) maxKbps = kbps
      pos += frameLen
    }
    require(nFrames > 0, "no MP3 frames in payload")
    Mp3Meta(sampleRate, nFrames, sumKbps, minKbps != maxKbps)
  }

  // ---- MP4 (ISO BMFF) box-tree metadata probe ----------------------------

  /** MP4 container metadata from the box tree alone: brand, movie-header
    * timescale/duration, track count. */
  final case class Mp4Meta(majorBrand: String, timescale: Long,
      duration: Long, nTracks: Int) {
    def durationMs: Long = duration * 1000L / timescale
  }

  /** Synthesize a minimal REAL ISO BMFF skeleton: `ftyp` (major brand +
    * minor version), `moov` containing a spec-shaped version-0 `mvhd`
    * (full 108-byte layout) and `nTracks` empty `trak` stubs, plus a
    * `free` box so parsers must skip unknown siblings. No media data —
    * the box STRUCTURE is what [[parseMp4Meta]] reads, exactly the part
    * of the format that is public structure rather than codec. */
  def encodeMp4Skeleton(majorBrand: String, timescale: Int, duration: Long,
      nTracks: Int): Array[Byte] = {
    require(majorBrand.length == 4, "major brand must be 4 chars")
    require(timescale > 0 && duration >= 0 && nTracks >= 0)
    val bb = java.nio.ByteBuffer.allocate(16 + 8 + 8 + 108 + nTracks * 8)
    bb.putInt(16); bb.put("ftyp".getBytes(StandardCharsets.US_ASCII))
    bb.put(majorBrand.getBytes(StandardCharsets.US_ASCII)); bb.putInt(0)
    bb.putInt(8); bb.put("free".getBytes(StandardCharsets.US_ASCII))
    bb.putInt(8 + 108 + nTracks * 8)
    bb.put("moov".getBytes(StandardCharsets.US_ASCII))
    bb.putInt(108); bb.put("mvhd".getBytes(StandardCharsets.US_ASCII))
    bb.putInt(0) // version 0 + flags
    bb.putInt(0); bb.putInt(0) // creation, modification
    bb.putInt(timescale); bb.putInt(duration.toInt)
    bb.putInt(0x00010000) // rate 1.0
    bb.putShort(0x0100.toShort); bb.putShort(0) // volume, reserved
    bb.putLong(0) // reserved
    Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
      .foreach(bb.putInt) // unity matrix
    (0 until 6).foreach(_ => bb.putInt(0)) // pre_defined
    bb.putInt(nTracks + 1) // next_track_ID
    (0 until nTracks).foreach { _ =>
      bb.putInt(8); bb.put("trak".getBytes(StandardCharsets.US_ASCII))
    }
    bb.array()
  }

  /** Walk an ISO BMFF payload's box tree for [[Mp4Meta]]: top-level
    * boxes (32-bit size, `size == 1` → 64-bit largesize, `size == 0` →
    * to end-of-file), `ftyp`'s major brand, and inside `moov` the
    * `mvhd` (version 0 AND 1 layouts) plus the `trak` count. Unknown
    * boxes skip by their declared size. Loud rejects: sizes < header,
    * boxes running past the payload, missing ftyp/moov/mvhd. */
  def parseMp4Meta(payload: Array[Byte]): Mp4Meta = {
    val bb = java.nio.ByteBuffer.wrap(payload)
    def boxesIn(start: Long, end: Long): Seq[(String, Long, Long)] = {
      val out = Seq.newBuilder[(String, Long, Long)]
      var pos = start
      while (pos < end) {
        require(pos + 8 <= end, s"truncated box header at $pos")
        val size32 = bb.getInt(pos.toInt).toLong & 0xffffffffL
        val typ = new String(payload, pos.toInt + 4, 4,
          StandardCharsets.US_ASCII)
        val (size, hdr) =
          if (size32 == 1) {
            require(pos + 16 <= end, s"truncated largesize box at $pos")
            (bb.getLong(pos.toInt + 8), 16L)
          } else if (size32 == 0) (end - pos, 8L)
          else (size32, 8L)
        require(size >= hdr, s"box '$typ' at $pos declares size $size")
        require(pos + size <= end,
          s"box '$typ' at $pos runs past the payload")
        out += ((typ, pos + hdr, pos + size))
        pos += size
      }
      out.result()
    }
    val top = boxesIn(0L, payload.length.toLong)
    val brand = top.collectFirst { case ("ftyp", s, e) =>
      require(e - s >= 4, "ftyp too short")
      new String(payload, s.toInt, 4, StandardCharsets.US_ASCII)
    }
    require(brand.nonEmpty, "no ftyp box")
    val moov = top.collectFirst { case ("moov", s, e) => (s, e) }
    require(moov.nonEmpty, "no moov box")
    val kids = boxesIn(moov.get._1, moov.get._2)
    val mvhd = kids.collectFirst { case ("mvhd", s, e) => (s, e) }
    require(mvhd.nonEmpty, "no mvhd box in moov")
    val s = mvhd.get._1.toInt
    val version = payload(s) & 0xff
    val (timescale, duration) =
      if (version == 1)
        (bb.getInt(s + 20).toLong & 0xffffffffL, bb.getLong(s + 24))
      else
        (bb.getInt(s + 12).toLong & 0xffffffffL,
          bb.getInt(s + 16).toLong & 0xffffffffL)
    require(timescale > 0, "mvhd timescale is 0")
    Mp4Meta(brand.get, timescale, duration,
      kids.count(_._1 == "trak"))
  }

  // ---- FLAC STREAMINFO metadata probe ------------------------------------

  /** FLAC stream metadata from the mandatory STREAMINFO block: the
    * fields a crawl routes/filters audio on without touching a single
    * compressed frame. */
  final case class FlacMeta(sampleRate: Int, channels: Int,
      bitsPerSample: Int, totalSamples: Long) {
    def durationMs: Long = totalSamples * 1000L / sampleRate
  }

  /** Synthesize a REAL FLAC header: `fLaC` magic + a spec-shaped
    * STREAMINFO metadata block (34 bytes, bit-packed per the public
    * format: 16+16 block sizes, 24+24 frame sizes, 20-bit sample rate,
    * 3-bit channels−1, 5-bit bps−1, 36-bit total samples, 16-byte MD5
    * zeroed) followed by a PADDING block marked last. No audio frames —
    * [[parseFlacMeta]] reads exactly the structure synthesized here. */
  def encodeFlacHeader(sampleRate: Int, channels: Int, bitsPerSample: Int,
      totalSamples: Long, padBytes: Int = 4): Array[Byte] = {
    require(sampleRate > 0 && sampleRate < (1 << 20), "bad sample rate")
    require(channels >= 1 && channels <= 8, "channels out of 1..8")
    require(bitsPerSample >= 4 && bitsPerSample <= 32, "bps out of 4..32")
    require(totalSamples >= 0 && totalSamples < (1L << 36), "samples > 36b")
    val bb = java.nio.ByteBuffer.allocate(4 + 4 + 34 + 4 + padBytes)
    bb.put("fLaC".getBytes(StandardCharsets.US_ASCII))
    bb.put(0.toByte) // STREAMINFO (type 0), not last
    bb.put(0.toByte); bb.put(0.toByte); bb.put(34.toByte) // 24-bit length
    bb.putShort(4096.toShort); bb.putShort(4096.toShort) // block sizes
    bb.put(0.toByte); bb.put(0.toByte); bb.put(0.toByte) // min frame size
    bb.put(0.toByte); bb.put(0.toByte); bb.put(0.toByte) // max frame size
    // 64 bits: rate(20) | channels-1(3) | bps-1(5) | totalSamples(36)
    val packed = (sampleRate.toLong << 44) |
      ((channels - 1).toLong << 41) | ((bitsPerSample - 1).toLong << 36) |
      totalSamples
    bb.putLong(packed)
    bb.put(new Array[Byte](16)) // MD5 of unencoded audio (zeroed)
    bb.put(0x81.toByte) // PADDING (type 1), LAST-block flag set
    bb.put(0.toByte); bb.put(0.toByte); bb.put(padBytes.toByte)
    bb.put(new Array[Byte](padBytes))
    bb.array()
  }

  /** Parse a FLAC payload's STREAMINFO into [[FlacMeta]] — magic check,
    * metadata-block walk by declared 24-bit lengths (unknown block
    * types skip; the walk stops at the last-block flag), the packed
    * 64-bit rate/channels/bps/samples field unpacked per the spec.
    * Loud rejects: missing magic, STREAMINFO absent or mis-sized,
    * blocks running past the payload, a zero sample rate. */
  def parseFlacMeta(payload: Array[Byte]): FlacMeta = {
    require(payload.length >= 4 &&
      new String(payload, 0, 4, StandardCharsets.US_ASCII) == "fLaC",
      "not a FLAC payload (no fLaC magic)")
    val bb = java.nio.ByteBuffer.wrap(payload)
    var pos = 4
    var meta: Option[FlacMeta] = None
    var last = false
    while (!last) {
      require(pos + 4 <= payload.length,
        s"truncated FLAC metadata-block header at $pos")
      val flags = payload(pos) & 0xff
      last = (flags & 0x80) != 0
      val typ = flags & 0x7f
      val len = ((payload(pos + 1) & 0xff) << 16) |
        ((payload(pos + 2) & 0xff) << 8) | (payload(pos + 3) & 0xff)
      require(pos + 4 + len <= payload.length,
        s"FLAC metadata block at $pos runs past the payload")
      if (typ == 0) {
        require(len == 34, s"STREAMINFO must be 34 bytes, got $len")
        val packed = bb.getLong(pos + 4 + 10)
        val rate = (packed >>> 44).toInt
        require(rate > 0, "STREAMINFO sample rate is 0")
        meta = Some(FlacMeta(rate,
          ((packed >>> 41) & 0x7).toInt + 1,
          ((packed >>> 36) & 0x1f).toInt + 1,
          packed & ((1L << 36) - 1)))
      }
      pos += 4 + len
    }
    require(meta.nonEmpty, "no STREAMINFO block before the last-block flag")
    meta.get
  }

  // ---- audio (RIFF/WAVE PCM-16) ----------------------------------------

  /** Decoded PCM payload: rate, channel count, interleaved 16-bit samples. */
  final case class WavPcm(sampleRate: Int, channels: Int,
      samples: Array[Short])

  /** Encode mono/interleaved 16-bit PCM as a standards-shaped WAV: RIFF
    * header, `fmt ` chunk (PCM, little-endian), `data` chunk with the odd-
    * length pad byte the spec requires. */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Short],
      channels: Int = 1): Array[Byte] = {
    require(channels > 0 && samples.length % channels == 0,
      "interleaved sample count must be a multiple of channels")
    val dataLen = samples.length * 2
    val pad = dataLen % 2 // always 0 for 16-bit, kept for spec fidelity
    val b = ByteBuffer.allocate(44 + dataLen + pad)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes(StandardCharsets.US_ASCII))
    b.putInt(36 + dataLen + pad)
    b.put("WAVE".getBytes(StandardCharsets.US_ASCII))
    b.put("fmt ".getBytes(StandardCharsets.US_ASCII))
    b.putInt(16).putShort(1).putShort(channels.toShort)
    b.putInt(sampleRate).putInt(sampleRate * channels * 2)
    b.putShort((channels * 2).toShort).putShort(16)
    b.put("data".getBytes(StandardCharsets.US_ASCII))
    b.putInt(dataLen)
    samples.foreach(b.putShort)
    b.array()
  }

  /** Parse a WAV payload: walks the chunk list (any order, unknown chunks
    * skipped with their pad bytes — real encoders emit LIST/INFO/fact
    * chunks before data), requires PCM 16-bit. */
  def decodeWavPcm16(payload: Array[Byte]): WavPcm = {
    val b = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    def tag4(): String = {
      val t = new Array[Byte](4); b.get(t)
      new String(t, StandardCharsets.US_ASCII)
    }
    require(payload.length >= 12 && tag4() == "RIFF", "not a RIFF payload")
    b.getInt() // declared riff size — trust the actual buffer instead
    require(tag4() == "WAVE", "not a WAVE form")
    var rate = -1
    var channels = -1
    var dataPos = -1
    var dataLen = -1
    while (b.remaining() >= 8 && (rate < 0 || dataPos < 0)) {
      val tag = tag4()
      val len = b.getInt()
      require(len >= 0 && len <= b.remaining(), s"corrupt chunk '$tag'")
      val next = b.position() + len + (len % 2) // chunks are word-aligned
      tag match {
        case "fmt " =>
          val fmt = b.getShort()
          channels = b.getShort()
          rate = b.getInt()
          b.getInt(); b.getShort() // byte rate, block align
          val bits = b.getShort()
          require(fmt == 1 && bits == 16,
            s"only PCM-16 supported (fmt=$fmt bits=$bits)")
          // a crafted fmt chunk with channels=0 would flow into
          // duration = n/(rate·channels) as Infinity/NaN features —
          // malformed audio must fail LOUDLY here (row-local; the
          // tolerant *Safe paths drop the row)
          require(channels > 0 && rate > 0,
            s"corrupt fmt chunk (channels=$channels rate=$rate)")
        case "data" =>
          // remember the span; decode AFTER the walk, so a data chunk
          // arriving before fmt (any chunk order is spec-legal) works
          dataPos = b.position()
          dataLen = len
        case _ => () // LIST/fact/cue — skip
      }
      b.position(math.min(next, payload.length))
    }
    require(dataPos >= 0, "no data chunk")
    require(rate > 0, "no fmt chunk")
    val samples = new Array[Short](dataLen / 2)
    b.position(dataPos)
    var i = 0
    while (i < samples.length) { samples(i) = b.getShort(); i += 1 }
    WavPcm(rate, channels, samples)
  }

  /** Real-codec audio [[Multimodal.Decoder]]: metadata from the actual WAV
    * header (width := sample count, height := sample rate, frames := 1) and
    * a 4-dim feature — RMS, peak, zero-crossing rate, duration seconds —
    * the standard cheap acoustic stats a filtering pipeline gates on. */
  class WavDecoder extends Multimodal.Decoder {
    def decode(kind: String, payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
      val wav = decodeWavPcm16(payload)
      val n = wav.samples.length
      var sumSq = 0L
      var peak = 0
      var zc = 0
      var i = 0
      while (i < n) {
        val s = wav.samples(i).toInt
        sumSq += s.toLong * s
        if (math.abs(s) > peak) peak = math.abs(s)
        if (i > 0 && s * wav.samples(i - 1).toInt < 0) zc += 1
        i += 1
      }
      val feat = Array(
        if (n == 0) 0f else math.sqrt(sumSq.toDouble / n).toFloat,
        peak.toFloat,
        if (n < 2) 0f else zc.toFloat / (n - 1),
        n.toFloat / (wav.sampleRate * wav.channels))
      (n, wav.sampleRate, 1, feat)
    }
  }
}
