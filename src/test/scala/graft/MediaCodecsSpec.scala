package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[MediaCodecs]] — the REAL JDK codecs behind the multimodal seam.
  * Contracts pinned here:
  *   - gray-PNG encode→decode is lossless (the property the
  *     `mm_png_roundtrip` oracle match rests on);
  *   - [[MediaCodecs.grayGrid]] resize is exact on block images and
  *     deterministic/luma-correct on RGB;
  *   - JPEG — an actually LOSSY codec — keeps phash near for re-encodes and
  *     far for distinct content (the BMP seam spec's contract, now through
  *     `ImageIO`'s real DCT path);
  *   - WAV container round trip is sample-exact, parser skips foreign
  *     chunks, and corrupt/truncated media drop rows, not tasks;
  *   - both decoders ride [[Multimodal.phash]]/[[Multimodal.extractFeatures]]
  *     with a map-only (shuffle-free) lineage — payload bytes never leave
  *     their partition.
  */
class MediaCodecsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def hasShuffle(rdd: org.apache.spark.rdd.RDD[_]): Boolean =
    rdd.dependencies.exists {
      case _: org.apache.spark.ShuffleDependency[_, _, _] => true
      case d => hasShuffle(d.rdd)
    }

  test("gray PNG round trip is lossless and the block resize is exact " +
      "(the mm_png_roundtrip oracle contract)") {
    val rows = Multimodal.PhashGridRows
    val cols = Multimodal.PhashGridCols
    // a deterministic 'random-looking' grid, all 256 values reachable
    val grid = Array.tabulate(rows * cols)(i => (i * 197 + 31) % 256)
    for (k <- 1 to 3) {
      val w = cols * k
      val px = Array.tabulate(rows * k * w) { i =>
        grid((i / w / k) * cols + (i % w) / k)
      }
      val png = MediaCodecs.encodeGrayPng(w, rows * k, px)
      // real PNG signature
      assert((png(0) & 0xff) == 0x89 && png(1) == 'P'.toByte)
      val img = MediaCodecs.decodeImage(png)
      assert(img.getWidth == w && img.getHeight == rows * k)
      assert(MediaCodecs.grayGrid(img, rows, cols).toSeq == grid.toSeq,
        s"k=$k resize did not recover the source grid")
    }
  }

  test("grayGrid on RGB input applies integer BT.601 luma and averages " +
      "within cells deterministically") {
    val img = new java.awt.image.BufferedImage(
      4, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000); img.setRGB(1, 0, 0x00ff00)
    img.setRGB(2, 0, 0x0000ff); img.setRGB(3, 0, 0xffffff)
    img.setRGB(0, 1, 0x000000); img.setRGB(1, 1, 0x808080)
    img.setRGB(2, 1, 0x404040); img.setRGB(3, 1, 0xc0c0c0)
    // 1×1 grid: one cell averaging all 8 lumas (integer division floors)
    val want = Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffffff,
      0x000000, 0x808080, 0x404040, 0xc0c0c0).map(MediaCodecs.luma).sum / 8
    assert(MediaCodecs.grayGrid(img, 1, 1).toSeq == Seq(want))
    // 2×4 grid: identity per pixel
    assert(MediaCodecs.grayGrid(img, 2, 4)(0) == MediaCodecs.luma(0xff0000))
    assert(MediaCodecs.grayGrid(img, 2, 4)(7) == MediaCodecs.luma(0xc0c0c0))
  }

  test("JPEG re-encode (real lossy codec) stays phash-near; distinct " +
      "content stays far; decoder seam is map-only on a DataFrame") {
    def tex(x: Int, y: Int): Int = (x * x * 7 + y * 13 * x + y * y * 3) % 251
    def rgbImage(f: (Int, Int) => Int): java.awt.image.BufferedImage = {
      val im = new java.awt.image.BufferedImage(
        33, 18, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 18; x <- 0 until 33)
        im.setRGB(x, y, f(x, y) * 0x010101)
      im
    }
    def enc(im: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(im, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    val basePng = enc(rgbImage(tex), "png")
    val reJpeg = enc(rgbImage(tex), "jpg") // same pixels, lossy container
    val otherPng = enc(rgbImage((x, y) => tex(y * 2, x)), "png")
    val media = spark.createDataFrame(Seq(
      (1L, "image", basePng), (2L, "image", reJpeg), (3L, "image", otherPng)))
      .toDF("media_id", "kind", "payload")
    val hashed = Multimodal.phash(media, new MediaCodecs.ImageIoPixelDecoder)
    assert(!hasShuffle(hashed.rdd), "real-codec phash lineage has a shuffle")
    val hs = hashed.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hs(1L), hs(2L)) <= 8,
      s"JPEG re-encode moved ${ham(hs(1L), hs(2L))} of 60 bits")
    assert(ham(hs(1L), hs(3L)) > 8,
      s"distinct content only ${ham(hs(1L), hs(3L))} bits apart")
    // metadata decoder reads the real headers of BOTH formats
    val feats = Multimodal
      .extractFeatures(media, new MediaCodecs.ImageIoDecoder)
      .select("media_id", "width", "height").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(feats.values.toSet == Set((33, 18)))
  }

  test("WAV PCM-16 round trip is sample-exact; parser skips foreign " +
      "chunks and word-aligns odd-size ones") {
    val samples = Array.tabulate(501)(i =>
      ((i * 7919L + 13) % 4001L - 2000L).toShort)
    val wav = MediaCodecs.encodeWavPcm16(16000, samples)
    assert(new String(wav, 0, 4, "US-ASCII") == "RIFF")
    val pcm = MediaCodecs.decodeWavPcm16(wav)
    assert(pcm.sampleRate == 16000 && pcm.channels == 1)
    assert(pcm.samples.toSeq == samples.toSeq)
    // splice an odd-size LIST chunk (needs a pad byte) before data, the
    // shape real encoders emit — parser must skip it and stay aligned
    val list = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ "INFOx".getBytes("US-ASCII") ++
      Array[Byte](0) // pad to even
    val spliced = wav.take(36) ++ list ++ wav.drop(36)
    // fix the RIFF size field (bytes 4-7, little-endian)
    val bb = java.nio.ByteBuffer.wrap(spliced)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, spliced.length - 8)
    val pcm2 = MediaCodecs.decodeWavPcm16(spliced)
    assert(pcm2.samples.toSeq == samples.toSeq && pcm2.sampleRate == 16000)
    // stereo interleave survives
    val st = MediaCodecs.decodeWavPcm16(
      MediaCodecs.encodeWavPcm16(8000, samples.take(500), channels = 2))
    assert(st.channels == 2 && st.samples.length == 500)
  }

  test("animated GIF: multi-frame round trip is pixel-exact through the " +
      "real palette/LZW path, and scene cuts land exactly at is_key rows") {
    val rows = Multimodal.PhashGridRows
    val cols = Multimodal.PhashGridCols
    val text = "the quick brown fox jumps over the lazy dog, twice over"
    val nFrames = 12 // scenes 0,0,0,0,0, 1,1,1,1,1, 2,2
    val grids = (0 until nFrames).map(f =>
      MediaCodecs.mdGridTagged(text, "#" + (f / 5)))
    val gif = MediaCodecs.encodeGifFrames(cols, rows, grids)
    assert(new String(gif, 0, 3, "US-ASCII") == "GIF")
    val back = MediaCodecs.decodeGifFrames(gif)
    assert(back.length == nFrames)
    back.zip(grids).zipWithIndex.foreach { case ((img, want), f) =>
      assert(MediaCodecs.grayGrid(img, rows, cols).toSeq == want.toSeq,
        s"frame $f not recovered exactly")
    }
    // frames within a scene hash identically; scene starts are keys
    val hs = back.map(img =>
      Multimodal.dHash(MediaCodecs.grayGrid(img, rows, cols)))
    (0 until nFrames).foreach { f =>
      if (f % 5 != 0) assert(hs(f) == hs(f - 1), s"intra-scene cut at $f")
    }
    assert(hs(0) != hs(5) || hs(5) != hs(10)) // content really varies
  }

  private def lum(img: java.awt.image.BufferedImage, x: Int, y: Int): Int = {
    val rgb = img.getRGB(x, y)
    val (r, g, b) = ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
    (r * 299 + g * 587 + b * 114) / 1000
  }

  /** A REAL optimized GIF via the JDK writer: stream metadata pins the
    * logical screen; each frame carries its own image-descriptor offset
    * and GIF89a disposal method. (pixels, w, h, left, top, disposal).
    * `transparentIndex(i)` marks that palette index transparent in
    * frame i's GraphicControlExtension — the delta-encoding device
    * optimized GIFs use (the gray palette the JDK writer builds maps
    * index v to gray v, so "pixels of value v" are the transparent
    * ones). */
  private def writeOptimizedGif(screenW: Int, screenH: Int,
      frames: Seq[(Array[Int], Int, Int, Int, Int, String)],
      transparentIndex: Int => Option[Int] = _ => None): Array[Byte] = {
    import javax.imageio.{IIOImage, ImageIO, ImageTypeSpecifier}
    import javax.imageio.metadata.IIOMetadataNode
    def mkImg(px: Array[Int], w: Int, h: Int) = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      for (y <- 0 until h; x <- 0 until w)
        raster.setSample(x, y, 0, px(y * w + x) & 0xff)
      img
    }
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      val sname = "javax_imageio_gif_stream_1.0"
      val smd = writer.getDefaultStreamMetadata(null)
      val stree = smd.getAsTree(sname).asInstanceOf[IIOMetadataNode]
      def streamChild(name: String): IIOMetadataNode = {
        val nl = stree.getElementsByTagName(name)
        if (nl.getLength > 0) nl.item(0).asInstanceOf[IIOMetadataNode]
        else { val c = new IIOMetadataNode(name); stree.appendChild(c); c }
      }
      val v = streamChild("Version"); v.setAttribute("value", "89a")
      val lsd = streamChild("LogicalScreenDescriptor")
      lsd.setAttribute("logicalScreenWidth", screenW.toString)
      lsd.setAttribute("logicalScreenHeight", screenH.toString)
      lsd.setAttribute("colorResolution", "8")
      lsd.setAttribute("pixelAspectRatio", "0")
      smd.setFromTree(sname, stree)
      writer.prepareWriteSequence(smd)
      frames.zipWithIndex.foreach { case ((px, w, h, left, top, disposal),
          fi) =>
        val img = mkImg(px, w, h)
        val imd = writer.getDefaultImageMetadata(
          ImageTypeSpecifier.createFromRenderedImage(img), null)
        val iname = "javax_imageio_gif_image_1.0"
        val tree = imd.getAsTree(iname).asInstanceOf[IIOMetadataNode]
        def child(name: String): IIOMetadataNode = {
          val nl = tree.getElementsByTagName(name)
          if (nl.getLength > 0) nl.item(0).asInstanceOf[IIOMetadataNode]
          else { val c = new IIOMetadataNode(name); tree.appendChild(c); c }
        }
        val d = child("ImageDescriptor")
        d.setAttribute("imageLeftPosition", left.toString)
        d.setAttribute("imageTopPosition", top.toString)
        // the JDK default metadata says interlaceFlag=TRUE, and its
        // interlaced write/read round trip drops rows on tiny frames
        // (a 3-row image comes back with row 1 black) — force the
        // sequential layout real optimizers emit
        d.setAttribute("interlaceFlag", "FALSE")
        val gce = child("GraphicControlExtension")
        gce.setAttribute("disposalMethod", disposal)
        gce.setAttribute("userInputFlag", "FALSE")
        gce.setAttribute("transparentColorFlag",
          if (transparentIndex(fi).isDefined) "TRUE" else "FALSE")
        gce.setAttribute("delayTime", "10")
        gce.setAttribute("transparentColorIndex",
          transparentIndex(fi).getOrElse(0).toString)
        imd.setFromTree(iname, tree)
        writer.writeToSequence(new IIOImage(img, null, imd), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  test("optimized-GIF compositing (r16 verdict #7): partial-update " +
      "frames draw onto the logical screen at their descriptor offsets; " +
      "doNotDispose persists, restoreToBackgroundColor clears the rect, " +
      "restoreToPrevious reverts the canvas — every returned frame IS " +
      "the displayed screen") {
    val grad = Array.tabulate(64)(i => (i * 3) % 256)
    val gif = writeOptimizedGif(8, 8, Seq(
      (grad, 8, 8, 0, 0, "doNotDispose"),
      (Array.fill(16)(200), 4, 4, 2, 2, "restoreToBackgroundColor"),
      (Array.fill(4)(50), 2, 2, 0, 0, "restoreToPrevious"),
      (Array.fill(9)(99), 3, 3, 5, 5, "none")))
    val fs = MediaCodecs.decodeGifFrames(gif)
    assert(fs.length == 4 &&
      fs.forall(f => f.getWidth == 8 && f.getHeight == 8))
    def grad2d(x: Int, y: Int) = (y * 8 + x) * 3 % 256
    // frame 0: the full gradient
    assert(lum(fs(0), 1, 0) == grad2d(1, 0) &&
      lum(fs(0), 6, 6) == grad2d(6, 6))
    // frame 1: gradient persisted (doNotDispose) + 200-patch at (2,2)
    assert(lum(fs(1), 3, 3) == 200 && lum(fs(1), 1, 0) == grad2d(1, 0))
    // frame 2: frame 1's rect was CLEARED (restoreToBackgroundColor →
    // transparent, luma 0), 50-patch drawn at (0,0)
    assert(lum(fs(2), 3, 3) == 0 && lum(fs(2), 0, 0) == 50 &&
      lum(fs(2), 1, 0) == 50 && lum(fs(2), 6, 6) == grad2d(6, 6))
    // frame 3: frame 2's patch REVERTED (restoreToPrevious — (1,0) is
    // the gradient again), cleared rect still cleared, 99-patch at (5,5)
    assert(lum(fs(3), 1, 0) == grad2d(1, 0) && lum(fs(3), 3, 3) == 0 &&
      lum(fs(3), 6, 6) == 99)
    // a frame rect escaping the screen still fails loudly
    val bad = writeOptimizedGif(8, 8, Seq(
      (grad, 8, 8, 0, 0, "none"),
      (Array.fill(16)(1), 4, 4, 6, 6, "none")))
    val e = intercept[IllegalArgumentException] {
      MediaCodecs.decodeGifFrames(bad)
    }
    assert(e.getMessage.contains("escapes"), e.getMessage)
  }

  test("full-size TRANSPARENT frames route to compositing, not the " +
      "fast path (r17 ADVICE #1): a screen-sized frame delta-encoding " +
      "via the transparent index shows the PREVIOUS screen through its " +
      "transparent pixels, never the transparent index's palette gray") {
    val grad = Array.tabulate(16)(i => (i * 5) % 256)
    // frame 1 is FULL-SIZE at (0,0) — the exact shape the old fast
    // path waved through raw — but index 37 is transparent: only (0,0)
    // really changes (to 200); everything else must read frame 0
    val delta = Array.fill(16)(37); delta(0) = 200
    val gif = writeOptimizedGif(4, 4, Seq(
      (grad, 4, 4, 0, 0, "doNotDispose"),
      (delta, 4, 4, 0, 0, "doNotDispose")),
      transparentIndex = i => if (i == 1) Some(37) else None)
    val fs = MediaCodecs.decodeGifFrames(gif)
    assert(fs.length == 2 &&
      fs.forall(f => f.getWidth == 4 && f.getHeight == 4))
    assert(lum(fs(0), 1, 1) == grad(5) && lum(fs(0), 3, 3) == grad(15))
    // composited: the delta pixel landed, transparent pixels read
    // through to frame 0's gradient (raw frame 1 would read 37 — the
    // transparent index's palette gray — everywhere but (0,0))
    assert(lum(fs(1), 0, 0) == 200, s"delta pixel: ${lum(fs(1), 0, 0)}")
    assert(lum(fs(1), 1, 1) == grad(5) && lum(fs(1), 3, 3) == grad(15),
      s"transparent pixels must show the previous screen, got " +
        s"${lum(fs(1), 1, 1)}/${lum(fs(1), 3, 3)}")
    // a fully-opaque keep-disposal full-frame GIF still takes the fast
    // path: reader frames come back palettized (not ARGB screens)
    val opaque = writeOptimizedGif(4, 4, Seq(
      (grad, 4, 4, 0, 0, "doNotDispose"),
      (Array.fill(16)(9), 4, 4, 0, 0, "none")))
    val fo = MediaCodecs.decodeGifFrames(opaque)
    assert(fo.forall(_.getType != java.awt.image.BufferedImage.TYPE_INT_ARGB),
      "opaque full-frame GIF should return reader frames untouched")
    // a full-size frame under a RESTORE disposal also leaves the fast
    // path (the next frame reveals canvas the current one cleared)
    val restore = writeOptimizedGif(4, 4, Seq(
      (grad, 4, 4, 0, 0, "restoreToBackgroundColor"),
      (delta, 4, 4, 0, 0, "none")),
      transparentIndex = i => if (i == 1) Some(37) else None)
    val fr = MediaCodecs.decodeGifFrames(restore)
    // frame 0's rect was cleared before frame 1, whose transparent
    // pixels therefore read the CLEARED canvas (luma 0), not the grad
    assert(lum(fr(1), 0, 0) == 200 && lum(fr(1), 1, 1) == 0,
      s"restore disposal: ${lum(fr(1), 0, 0)}/${lum(fr(1), 1, 1)}")
  }

  test("optimized-GIF screens larger than their frames composite onto " +
      "the logical screen (r16's crop-vs-screen guard, now resolved by " +
      "compositing): content lands top-left, the uncovered canvas reads " +
      "transparent, and full-frame GIFs still return reader frames " +
      "untouched") {
    val rows = Multimodal.PhashGridRows
    val cols = Multimodal.PhashGridCols
    val grid = Array.tabulate(rows * cols)(i => (i * 7) % 256)
    val gif = MediaCodecs.encodeGifFrames(cols, rows, Seq(grid, grid))
    // GIF89a header: logical screen width/height are little-endian
    // uint16 at offsets 6..9 — patch the screen LARGER than the frames
    val patched = gif.clone()
    patched(6) = (cols * 2 & 0xff).toByte; patched(7) = 0
    patched(8) = (rows * 2 & 0xff).toByte; patched(9) = 0
    val fs = MediaCodecs.decodeGifFrames(patched)
    assert(fs.length == 2 && fs.forall(f =>
      f.getWidth == cols * 2 && f.getHeight == rows * 2))
    // frame content composites top-left; the uncovered screen is
    // transparent (luma 0)
    assert(lum(fs(0), 1, 0) == grid(1) && lum(fs(0), cols + 1, 0) == 0 &&
      lum(fs(0), 0, rows) == 0)
    // the unpatched GIF still round-trips (full-frame fast path)
    assert(MediaCodecs.decodeGifFrames(gif).length == 2)
  }

  test("MP3 header walk: meta round-trips through real frame bytes, the " +
      "ID3v2 syncsafe skip works, a padded frame sizes itself, and " +
      "malformed streams fail loudly (truncation, free bitrate, " +
      "non-Layer-III, mid-stream rate change)") {
    val mp3 = MediaCodecs.encodeMp3Frames(1, Seq(9, 9, 9), id3Bytes = 17)
    val m = MediaCodecs.parseMp3Meta(mp3)
    assert(m == MediaCodecs.Mp3Meta(48000, 3, 3 * 128L, vbr = false))
    assert(m.durationMs == 1152L * 3 * 1000 / 48000)
    val vbr = MediaCodecs.parseMp3Meta(
      MediaCodecs.encodeMp3Frames(0, Seq(1, 14, 5)))
    assert(vbr == MediaCodecs.Mp3Meta(44100, 3, 32L + 320L + 64L,
      vbr = true))
    // padding bit: frame declares one extra byte — flip it and append
    val one = MediaCodecs.encodeMp3Frames(2, Seq(4))
    val padded = one.clone()
    padded(2) = (padded(2) | 0x02).toByte
    assert(MediaCodecs.parseMp3Meta(padded :+ 0.toByte).nFrames == 1)
    // truncation: the unpadded frame now misses its declared final byte
    intercept[IllegalArgumentException] {
      MediaCodecs.parseMp3Meta(padded)
    }
    // free-format bitrate (index 0) is a loud reject, not a guess
    val free = one.clone(); free(2) = (free(2) & 0x0f).toByte
    intercept[IllegalArgumentException] { MediaCodecs.parseMp3Meta(free) }
    // Layer II header (layer bits 10) is out of scope — loudly
    val l2 = one.clone(); l2(1) = 0xfd.toByte
    intercept[IllegalArgumentException] { MediaCodecs.parseMp3Meta(l2) }
    // a sample-rate change mid-stream is corruption, not a feature
    val a = MediaCodecs.encodeMp3Frames(0, Seq(5))
    val b = MediaCodecs.encodeMp3Frames(1, Seq(5))
    intercept[IllegalArgumentException] {
      MediaCodecs.parseMp3Meta(a ++ b)
    }
    intercept[IllegalArgumentException] {
      MediaCodecs.parseMp3Meta(Array[Byte]())
    }
  }

  test("FLAC STREAMINFO walk: bit-packed fields round-trip (20-bit rate, " +
      "3-bit channels, 5-bit bps, 36-bit samples), unknown metadata " +
      "blocks skip, and missing magic / absent STREAMINFO / mis-sized " +
      "blocks fail loudly") {
    val flac = MediaCodecs.encodeFlacHeader(44100, 2, 16, 123456789L)
    val m = MediaCodecs.parseFlacMeta(flac)
    assert(m == MediaCodecs.FlacMeta(44100, 2, 16, 123456789L))
    assert(m.durationMs == 123456789L * 1000 / 44100)
    // extremes of each packed field
    assert(MediaCodecs.parseFlacMeta(MediaCodecs.encodeFlacHeader(
      8000, 8, 32, (1L << 36) - 1)) ==
      MediaCodecs.FlacMeta(8000, 8, 32, (1L << 36) - 1))
    // an unknown metadata block BEFORE streaminfo skips by length:
    // splice an APPLICATION (type 2) block right after the magic
    val app = Array[Byte](2, 0, 0, 5) ++ Array.fill(5)(0x7f.toByte)
    val spliced = flac.take(4) ++ app ++ flac.drop(4)
    assert(MediaCodecs.parseFlacMeta(spliced) == m)
    intercept[IllegalArgumentException] {
      MediaCodecs.parseFlacMeta("flaC".getBytes("US-ASCII") ++ flac.drop(4))
    }
    // STREAMINFO length lying (35) — loud, not a shifted read
    val bad = flac.clone(); bad(7) = 35
    intercept[IllegalArgumentException] { MediaCodecs.parseFlacMeta(bad) }
    // no STREAMINFO at all: magic + a last-flagged padding block only
    val pad = Array[Byte]("fLaC".getBytes("US-ASCII"): _*) ++
      Array[Byte](0x81.toByte, 0, 0, 2, 0, 0)
    intercept[IllegalArgumentException] { MediaCodecs.parseFlacMeta(pad) }
    // block running past the payload
    intercept[IllegalArgumentException] {
      MediaCodecs.parseFlacMeta(flac.take(20))
    }
  }

  test("MP4 box walk: skeleton meta round-trips (unknown boxes skipped, " +
      "trak stubs counted), version-1 mvhd and largesize/to-EOF box " +
      "sizes parse, and missing moov / lying sizes fail loudly") {
    val mp4 = MediaCodecs.encodeMp4Skeleton("mp42", 1000, 61_500L, 3)
    val m = MediaCodecs.parseMp4Meta(mp4)
    assert(m == MediaCodecs.Mp4Meta("mp42", 1000L, 61500L, 3))
    assert(m.durationMs == 61500L)
    // version-1 mvhd (64-bit times) hand-built: moov > mvhd(v1) + trak
    def box(typ: String, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + body.length)
      bb.putInt(8 + body.length)
      bb.put(typ.getBytes("US-ASCII")); bb.put(body); bb.array()
    }
    val mvhd1 = {
      val bb = java.nio.ByteBuffer.allocate(112)
      bb.putInt(0x01000000) // version 1, flags 0
      bb.putLong(0L); bb.putLong(0L) // creation, modification (64-bit)
      bb.putInt(90000) // timescale
      bb.putLong(450000L) // duration (64-bit)
      bb.array()
    }
    val ftyp = box("ftyp", "isom    ".getBytes("US-ASCII"))
    val moov = box("moov", box("mvhd", mvhd1) ++ box("trak", Array[Byte]()))
    val v1 = MediaCodecs.parseMp4Meta(ftyp ++ moov)
    assert(v1 == MediaCodecs.Mp4Meta("isom", 90000L, 450000L, 1))
    assert(v1.durationMs == 5000L)
    // largesize (size==1 + 64-bit size) and size==0 (to EOF) boxes
    val largeMoov = {
      val inner = box("mvhd", mvhd1)
      val bb = java.nio.ByteBuffer.allocate(16 + inner.length)
      bb.putInt(1); bb.put("moov".getBytes("US-ASCII"))
      bb.putLong(16L + inner.length); bb.put(inner); bb.array()
    }
    val tailFree = {
      val bb = java.nio.ByteBuffer.allocate(12)
      bb.putInt(0); bb.put("free".getBytes("US-ASCII"))
      bb.putInt(0xdead) // trailing junk the size-0 box absorbs
      bb.array()
    }
    assert(MediaCodecs.parseMp4Meta(ftyp ++ largeMoov ++ tailFree) ==
      MediaCodecs.Mp4Meta("isom", 90000L, 450000L, 0))
    // missing moov and a size lying past the payload both fail loudly
    intercept[IllegalArgumentException] { MediaCodecs.parseMp4Meta(ftyp) }
    val lying = mp4.clone()
    lying(3) = 127 // ftyp size claims 127 bytes the payload doesn't hold
    intercept[IllegalArgumentException] {
      MediaCodecs.parseMp4Meta(lying.take(20))
    }
  }

  test("mm_gif_keyframes on the fixture dir: frame counts match metadata " +
      "and every intra-scene row is hamming-0 non-key") {
    val got = SparkEntry.queries("mm_gif_keyframes")(spark, TestSpark.sfDir)
      .collect()
    assert(got.nonEmpty)
    val byMedia = got.groupBy(_.getLong(0))
    byMedia.foreach { case (_, frames) =>
      assert(frames.map(_.getInt(1)).toSeq.sorted ==
        (0 until frames.length))
    }
    got.foreach { r =>
      val f = r.getInt(1)
      if (f == 0) assert(r.getInt(2) == -1 && r.getBoolean(3))
      else if (f % 5 != 0)
        assert(r.getInt(2) == 0 && !r.getBoolean(3),
          s"media ${r.getLong(0)} frame $f: intra-scene change")
    }
    // at least one genuine scene cut exists somewhere in the corpus
    assert(got.exists(r => r.getInt(1) % 5 == 0 && r.getInt(1) > 0 &&
      r.getBoolean(3)))
  }

  test("images SMALLER than the grid (1x1 tracking pixels, tiny icons) " +
      "decode without dividing by zero — empty cells fill by nearest " +
      "pixel, deterministically") {
    // 1×1: every cell must read the single pixel
    val one = new java.awt.image.BufferedImage(
      1, 1, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    one.getRaster.setSample(0, 0, 0, 137)
    assert(MediaCodecs.grayGrid(one,
      Multimodal.PhashGridRows, Multimodal.PhashGridCols).toSeq ==
      Seq.fill(66)(137))
    // 8×3 (< 11 cols, < 6 rows): no crash, and a re-decode agrees
    val small = new java.awt.image.BufferedImage(
      8, 3, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 3; x <- 0 until 8)
      small.getRaster.setSample(x, y, 0, (x * 31 + y * 7) % 256)
    val g1 = MediaCodecs.grayGrid(small, 6, 11)
    assert(g1.length == 66 && g1.sameElements(
      MediaCodecs.grayGrid(small, 6, 11)))
    // and the full pipeline survives a real tiny PNG
    val png = MediaCodecs.encodeGrayPng(1, 1, Array(137))
    assert(new MediaCodecs.ImageIoPixelDecoder()
      .decodeGray("image", png).toSeq == Seq.fill(66)(137))
    val (w, h, _, feat) = new MediaCodecs.ImageIoDecoder()
      .decode("image", png)
    assert(w == 1 && h == 1 && feat.forall(f => !f.isNaN))
  }

  test("WAV chunk order is free: a data chunk BEFORE fmt parses (the " +
      "spec allows any order; the walk decodes data after fmt is known)") {
    val samples = Array[Short](100, -200, 300)
    // hand-build: RIFF | data | fmt
    val data = new java.io.ByteArrayOutputStream()
    val bb = java.nio.ByteBuffer.allocate(12 + 8 + 6 + 8 + 16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(12 + 8 + 6 + 8 + 16 - 8)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("data".getBytes("US-ASCII")).putInt(6)
    samples.foreach(bb.putShort)
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
    bb.putShort(1).putShort(1).putInt(8000).putInt(16000)
    bb.putShort(2).putShort(16)
    val pcm = MediaCodecs.decodeWavPcm16(bb.array())
    assert(pcm.sampleRate == 8000 && pcm.samples.toSeq == samples.toSeq)
  }

  test("corrupt media: decodeImageOpt drops rows, never tasks; truncated " +
      "WAV and non-PCM reject with a message") {
    assert(MediaCodecs.decodeImageOpt("not an image".getBytes).isEmpty)
    assert(MediaCodecs.decodeImageOpt(Array[Byte]()).isEmpty)
    // valid-signature-then-garbage: JDK readers throw RUNTIME exceptions
    // (not IOException) on some malformed headers — NonFatal must catch
    assert(MediaCodecs.decodeImageOpt(
      "GIF89a".getBytes ++ Array.fill[Byte](30)(-1)).isEmpty)
    assert(MediaCodecs.decodeImageOpt(
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10) ++
        Array.fill[Byte](20)(7)).isEmpty)
    val good = MediaCodecs.encodeWavPcm16(8000, Array[Short](1, -2, 3))
    intercept[IllegalArgumentException] {
      MediaCodecs.decodeWavPcm16(good.take(20)) // truncated mid-fmt
    }
    intercept[IllegalArgumentException] {
      val bad = good.clone()
      bad(20) = 3 // fmt code 3 = IEEE float, unsupported
      MediaCodecs.decodeWavPcm16(bad)
    }
    intercept[IllegalArgumentException] {
      MediaCodecs.decodeWavPcm16("RIFFxxxxJUNK".getBytes)
    }
    // and a decodable-but-weird payload: WavDecoder features are finite
    val (n, rate, frames, feat) =
      new MediaCodecs.WavDecoder().decode("audio", good)
    assert(n == 3 && rate == 8000 && frames == 1)
    assert(feat.length == 4 && feat.forall(f => !f.isNaN && !f.isInfinite))
    // zero-crossing rate of (1, -2, 3): both adjacent pairs cross
    assert(math.abs(feat(2) - 1.0f) < 1e-6)
  }

  test("readMediaDir: a real on-disk media lake through the binaryFile " +
      "source — glob prunes at listing, kinds from extensions, payloads " +
      "decode through the real codecs") {
    val dir = java.nio.file.Files.createTempDirectory("media_lake")
    try {
      val grid = Array.tabulate(66)(i => (i * 31) % 256)
      val png = MediaCodecs.encodeGrayPng(11, 6, grid)
      java.nio.file.Files.write(dir.resolve("a.png"), png)
      java.nio.file.Files.write(dir.resolve("b.png"), png)
      val wav = MediaCodecs.encodeWavPcm16(8000, Array[Short](5, -5, 7))
      java.nio.file.Files.write(dir.resolve("c.wav"), wav)
      java.nio.file.Files.write(dir.resolve("junk.dat"),
        "not media".getBytes)
      val media = Multimodal.readMediaDir(spark, dir.toString)
      val rows = media.collect()
      assert(rows.length == 4)
      assert(rows.map(_.getAs[String]("kind")).sorted.toSeq ==
        Seq("audio", "binary", "image", "image"))
      // ids are stable path hashes: re-read yields identical ids, and
      // the 128-bit media_uid rides alongside (distinct per file)
      val again = Multimodal.readMediaDir(spark, dir.toString)
        .select("media_id").collect().map(_.getLong(0)).toSet
      assert(again == rows.map(_.getAs[Long]("media_id")).toSet)
      val uids = rows.map(_.getAs[String]("media_uid"))
      assert(uids.distinct.length == 4 && uids.forall(_.length == 32))
      // glob prunes at LISTING time (junk never opened)
      assert(Multimodal.readMediaDir(spark, dir.toString, "*.png")
        .count() == 2)
      // and the payloads decode through the real codecs end to end
      val imgs = media.filter(col("kind") === "image")
      val feats = Multimodal
        .extractFeatures(imgs, new MediaCodecs.ImageIoDecoder)
        .select("width", "height").collect()
      assert(feats.forall(r => r.getInt(0) == 11 && r.getInt(1) == 6))
      val hashed = Multimodal.phash(imgs, new MediaCodecs.ImageIoPixelDecoder)
        .collect().map(_.getLong(1)).toSet
      assert(hashed == Set(Multimodal.dHash(grid)))
      val audio = media.filter(col("kind") === "audio").collect()
      val (n, rate, _, _) = new MediaCodecs.WavDecoder()
        .decode("audio", audio(0).getAs[Array[Byte]]("payload"))
      assert(n == 3 && rate == 8000)
    } finally
      graft.streaming.EventStream.deleteDir(dir.toString)
  }

  test("dirty lake: phashSafe/extractFeaturesSafe drop corrupt payloads " +
      "row-locally while the strict forms fail the job; survivors match " +
      "the strict hashes exactly") {
    val grid = Array.tabulate(66)(i => (i * 53 + 7) % 256)
    val png = MediaCodecs.encodeGrayPng(11, 6, grid)
    val media = spark.createDataFrame(Seq(
      (1L, "image", png),
      (2L, "image", "truncated garbage".getBytes),
      (3L, "image", png.take(20)), // valid signature, truncated body
      (4L, "image", png)))
      .toDF("media_id", "kind", "payload")
    val safe = Multimodal
      .phashSafe(media, new MediaCodecs.ImageIoPixelDecoder)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(safe.keySet == Set(1L, 4L))
    assert(safe.values.toSet == Set(Multimodal.dHash(grid)))
    val feats = Multimodal
      .extractFeaturesSafe(media, new MediaCodecs.ImageIoDecoder)
      .select("media_id", "width").collect()
    assert(feats.map(_.getLong(0)).toSet == Set(1L, 4L))
    assert(feats.forall(_.getInt(1) == 11))
    // the strict form surfaces the corruption instead of hiding it
    intercept[org.apache.spark.SparkException] {
      Multimodal.phash(media, new MediaCodecs.ImageIoPixelDecoder)
        .collect()
    }
  }

  test("mm_png_roundtrip / mm_wav_features run green on the fixture dir " +
      "and agree with engine-side recomputation") {
    val png = SparkEntry.queries("mm_png_roundtrip")(spark, TestSpark.sfDir)
      .collect()
    assert(png.nonEmpty)
    png.take(20).foreach { r =>
      val id = r.getLong(0)
      val k = (id % 3 + 1).toInt
      assert(r.getInt(1) == Multimodal.PhashGridCols * k &&
        r.getInt(2) == Multimodal.PhashGridRows * k,
        s"media $id header dims wrong")
    }
    // hash equals a direct (no-codec) dHash of the md5 grid — proving the
    // PNG leg changed nothing
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
      .filter(pmod(col("doc_id"), lit(5)) === 0)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    png.take(20).foreach { r =>
      val want = Multimodal.dHash(MediaCodecs.mdGrid256(docs(r.getLong(0))))
      assert(r.getLong(3) == want, s"media ${r.getLong(0)} hash mismatch")
    }
    val wav = SparkEntry.queries("mm_wav_features")(spark, TestSpark.sfDir)
      .collect()
    assert(wav.nonEmpty)
    wav.take(20).foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == ((id % 97 + 3) * 40).toInt && r.getInt(2) == 8000)
      val samples = Array.tabulate(r.getInt(1))(i =>
        ((id * 131L + i * 7919L) % 4001L - 2000L).toInt)
      assert(r.getLong(3) == samples.map(v => v.toLong * v).sum)
      assert(r.getInt(4) == samples.map(math.abs).max)
      assert(r.getInt(5) == samples.sliding(2)
        .count(p => p(0) * p(1) < 0))
    }
  }
}
