package graft.mm

/** Dependency-free image decoding for the multimodal decode stage: PNG
  * (8-bit gray/RGB/RGBA, all five scanline filters, zlib IDAT via the
  * JDK's `Inflater`), baseline JPEG (ITU-T T.81 sequential DCT — Huffman
  * entropy decode, integer IDCT, 4:4:4/4:2:2/4:2:0 chroma, restart
  * markers), BMP (24-bit uncompressed, the BITMAPINFOHEADER layout) and
  * PPM (P6 binary / P3 ASCII, maxval ≤ 255). Real formats, real pixels —
  * this replaces the "decode is a stub by contract" gap:
  * [[Multimodal.decodeFeatures]] sniffs these formats first and only
  * falls back to the deterministic byte-fold stub for payloads that are
  * not images (e.g. the text-backed synthetic assets the oracle replays).
  *
  * Validation is STRICT by design — every length/field/CRC check must
  * pass or the decoder returns None. That is what makes the sniff safe to
  * run on arbitrary payloads: a text document that happens to start with
  * "BM" fails the header arithmetic long before pixels are read, and the
  * 8-byte PNG signature plus per-chunk CRC32 make a false PNG positive
  * practically impossible.
  *
  * Video lives in [[VideoCodecs]] (AVI RIFF container: uncompressed
  * BGR24 or Motion-JPEG frames through [[decodeJpeg]]); only compressed
  * inter-frame codecs (H.264 etc.) stay out of dependency-free scope —
  * the decode seam (`bytes → Option[DecodedImage]`) is exactly where a
  * JNI/FFI codec bridge would slot in.
  */
object ImageCodecs {

  /** One decoded raster: dimensions + exact integer channel sums (the
    * stats a curation pipeline filters on, computed from actual pixels).
    * `meanLuma` is the Rec.709-weighted mean in [0, 1]. */
  final case class DecodedImage(format: String, width: Int, height: Int,
                                sumR: Long, sumG: Long, sumB: Long,
                                maxVal: Int) {
    def nPixels: Long = width.toLong * height
    def meanLuma: Double =
      (0.2126 * sumR + 0.7152 * sumG + 0.0722 * sumB) / (nPixels.toDouble * maxVal)
  }

  private val MaxDim = 1 << 14 // 16384 — reject absurd headers early

  /** Sniff + decode: PNG (8-byte signature), JPEG (SOI + marker), BMP
    * ("BM"), P6, or P3; None when the payload is not a (supported,
    * well-formed) image. */
  def decode(bytes: Array[Byte]): Option[DecodedImage] =
    if (bytes.length >= 8 && isPngSignature(bytes)) decodePng(bytes)
    else if (bytes.length >= 3 && u8(bytes(0)) == 0xff &&
      u8(bytes(1)) == 0xd8 && u8(bytes(2)) == 0xff) decodeJpeg(bytes)
    else if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') decodeBmp(bytes)
    else if (bytes.length >= 2 && bytes(0) == 'P' &&
      (bytes(1) == '6' || bytes(1) == '3')) decodePpm(bytes)
    else None

  private def u8(b: Byte): Int = b & 0xff

  private def leInt(b: Array[Byte], off: Int): Int =
    u8(b(off)) | (u8(b(off + 1)) << 8) | (u8(b(off + 2)) << 16) | (u8(b(off + 3)) << 24)

  /** 24-bit uncompressed BITMAPINFOHEADER BMP. Bottom-up rows (positive
    * height) or top-down (negative); rows padded to 4-byte multiples —
    * padding bytes are skipped, never counted in stats. */
  private[mm] def decodeBmp(b: Array[Byte]): Option[DecodedImage] = {
    if (b.length < 54) return None
    val pixelOffset = leInt(b, 10)
    val headerSize = leInt(b, 14)
    val width = leInt(b, 18)
    val rawHeight = leInt(b, 22)
    val planes = u8(b(26)) | (u8(b(27)) << 8)
    val bpp = u8(b(28)) | (u8(b(29)) << 8)
    val compression = leInt(b, 30)
    val height = math.abs(rawHeight)
    if (headerSize < 40 || planes != 1 || bpp != 24 || compression != 0)
      return None
    if (width < 1 || width > MaxDim || height < 1 || height > MaxDim ||
      rawHeight == 0) return None
    val rowSize = ((width * 3 + 3) / 4) * 4
    if (pixelOffset < 54 || pixelOffset.toLong + rowSize.toLong * height > b.length)
      return None
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < height) {
      var base = pixelOffset + y * rowSize
      var x = 0
      while (x < width) {
        sb += u8(b(base)); sg += u8(b(base + 1)); sr += u8(b(base + 2)) // BGR
        base += 3; x += 1
      }
      y += 1
    }
    // channel sums are row-order invariant, so bottom-up vs top-down
    // needs no special casing beyond accepting the negative height
    Some(DecodedImage("bmp", width, height, sr, sg, sb, 255))
  }

  /** PPM: P6 (binary) or P3 (ASCII), maxval ≤ 255. Header tokens may be
    * separated by any whitespace and `#` comments per the netpbm spec. */
  private[mm] def decodePpm(b: Array[Byte]): Option[DecodedImage] = {
    val binary = b(1) == '6'
    var pos = 2
    def skipSpaceAndComments(): Unit = {
      var going = true
      while (going && pos < b.length) {
        val c = b(pos).toChar
        if (c == '#') while (pos < b.length && b(pos) != '\n') pos += 1
        else if (c.isWhitespace) pos += 1
        else going = false
      }
    }
    def token(): Option[Int] = {
      skipSpaceAndComments()
      val start = pos
      while (pos < b.length && b(pos).toChar.isDigit) pos += 1
      if (pos == start || pos - start > 9) None
      else Some(new String(b, start, pos - start).toInt)
    }
    val hdr = for {
      w <- token(); h <- token(); mv <- token()
      if w >= 1 && w <= MaxDim && h >= 1 && h <= MaxDim && mv >= 1 && mv <= 255
    } yield (w, h, mv)
    hdr.flatMap { case (w, h, mv) =>
      val n = w.toLong * h
      var (sr, sg, sb) = (0L, 0L, 0L)
      if (binary) {
        pos += 1 // exactly ONE whitespace byte after maxval, per spec
        if (pos + n * 3 > b.length) return None
        var i = 0L
        while (i < n) {
          val base = (pos + i * 3).toInt
          sr += u8(b(base)); sg += u8(b(base + 1)); sb += u8(b(base + 2))
          i += 1
        }
      } else {
        var i = 0L
        while (i < n) {
          (token(), token(), token()) match {
            case (Some(r), Some(g), Some(bl))
                if r <= mv && g <= mv && bl <= mv =>
              sr += r; sg += g; sb += bl
            case _ => return None
          }
          i += 1
        }
      }
      Some(DecodedImage(if (binary) "ppm" else "ppm-ascii", w, h, sr, sg, sb, mv))
    }
  }

  // ───────────────────────── PNG ─────────────────────────

  private val PngSig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    .map(_.toByte)

  private def isPngSignature(b: Array[Byte]): Boolean =
    (0 until 8).forall(i => b(i) == PngSig(i))

  private def beInt(b: Array[Byte], off: Int): Int =
    (u8(b(off)) << 24) | (u8(b(off + 1)) << 16) | (u8(b(off + 2)) << 8) | u8(b(off + 3))

  /** PNG, the real container (RFC 2083): chunk walk with CRC32 validation
    * on every chunk, IDAT concatenation → one `java.util.zip.Inflater`
    * pass, then the five scanline filters (None/Sub/Up/Average/Paeth)
    * undone row by row. Supported pixel layouts: bit depth 8, color type
    * 0 (gray — counted into all three channel sums), 2 (RGB) and 6 (RGBA
    * — alpha validated but not summed; stats are color stats).
    * Interlace (Adam7), palette images, and 16-bit depths return None —
    * strictness over coverage, same contract as the BMP/PPM parsers. */
  private[mm] def decodePng(b: Array[Byte]): Option[DecodedImage] = {
    if (b.length < 8 + 25 + 12 + 12) return None // sig + IHDR + 1 IDAT + IEND
    var pos = 8
    var width, height, colorType = -1
    var idat = Array.emptyByteArray
    var idatLen = 0
    var sawIhdr, sawIend = false
    val crc = new java.util.zip.CRC32
    while (!sawIend) {
      if (pos + 12 > b.length) return None
      val len = beInt(b, pos)
      if (len < 0 || pos + 12L + len > b.length) return None
      val ctype = new String(b, pos + 4, 4, "US-ASCII")
      crc.reset()
      crc.update(b, pos + 4, 4 + len)
      if (crc.getValue != (beInt(b, pos + 8 + len).toLong & 0xffffffffL))
        return None
      ctype match {
        case "IHDR" =>
          if (sawIhdr || len != 13) return None
          sawIhdr = true
          width = beInt(b, pos + 8)
          height = beInt(b, pos + 12)
          val bitDepth = u8(b(pos + 16))
          colorType = u8(b(pos + 17))
          val (compression, filterMethod, interlace) =
            (u8(b(pos + 18)), u8(b(pos + 19)), u8(b(pos + 20)))
          if (width < 1 || width > MaxDim || height < 1 || height > MaxDim ||
            bitDepth != 8 || !Set(0, 2, 6).contains(colorType) ||
            compression != 0 || filterMethod != 0 || interlace != 0) return None
        case "IDAT" =>
          if (!sawIhdr) return None
          if (idat.length < idatLen + len) {
            val grown = new Array[Byte](math.max(idat.length * 2, idatLen + len))
            System.arraycopy(idat, 0, grown, 0, idatLen)
            idat = grown
          }
          System.arraycopy(b, pos + 8, idat, idatLen, len)
          idatLen += len
        case "IEND" =>
          if (!sawIhdr || len != 0) return None
          sawIend = true
        case _ => // ancillary chunks (already CRC-validated) are skipped
      }
      pos += 12 + len
    }
    if (idatLen == 0) return None
    val bpp = colorType match { case 0 => 1; case 2 => 3; case _ => 4 }
    val stride = width * bpp
    val rawSize = height.toLong * (1 + stride)
    if (rawSize > Int.MaxValue) return None
    val raw = new Array[Byte](rawSize.toInt)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat, 0, idatLen)
      var off = 0
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        if (n == 0 && inf.needsInput()) return None // truncated stream
        off += n
      }
      if (off != raw.length) return None
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inf.end()

    // undo filters in place: `cur` points at this row's pixel bytes,
    // `prior` at the reconstructed row above (zeros for row 0)
    var (sr, sg, sb) = (0L, 0L, 0L)
    val prior = new Array[Byte](stride)
    val cur = new Array[Byte](stride)
    var y = 0
    while (y < height) {
      val rowOff = y * (1 + stride)
      val filter = u8(raw(rowOff))
      if (filter > 4) return None
      var i = 0
      while (i < stride) {
        val x = u8(raw(rowOff + 1 + i))
        val a = if (i >= bpp) u8(cur(i - bpp)) else 0 // left
        val up = u8(prior(i)) // above
        val c = if (i >= bpp) u8(prior(i - bpp)) else 0 // upper-left
        val recon = filter match {
          case 0 => x
          case 1 => (x + a) & 0xff
          case 2 => (x + up) & 0xff
          case 3 => (x + (a + up) / 2) & 0xff
          case 4 => // Paeth predictor
            val p = a + up - c
            val (pa, pb, pc) = (math.abs(p - a), math.abs(p - up), math.abs(p - c))
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c
            (x + pred) & 0xff
        }
        cur(i) = recon.toByte
        colorType match {
          case 0 => sr += recon; sg += recon; sb += recon
          case _ => (i % bpp) match {
            case 0 => sr += recon
            case 1 => sg += recon
            case 2 => sb += recon
            case _ => // alpha byte of RGBA: validated, not a color stat
          }
        }
        i += 1
      }
      System.arraycopy(cur, 0, prior, 0, stride)
      y += 1
    }
    Some(DecodedImage("png", width, height, sr, sg, sb, 255))
  }

  /** Assemble a well-formed PNG from pre-filtered raw scanline data
    * (`height` rows of `1 + width*bpp` bytes, each starting with its
    * filter type byte). Zlib stream uses stored (uncompressed) deflate
    * blocks — deterministic bytes, so payload-level stats are replayable.
    * This is the fixture/wrapper builder: [[decodePng]] must invert it. */
  private[mm] def encodePng(width: Int, height: Int, colorType: Int,
                            filteredRows: Array[Byte]): Array[Byte] = {
    val bpp = colorType match { case 0 => 1; case 2 => 3; case 6 => 4
      case _ => throw new IllegalArgumentException(s"colorType $colorType") }
    require(filteredRows.length == height * (1 + width * bpp),
      s"raw data ${filteredRows.length} != $height rows of 1+${width * bpp}")
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSig, 0, 8)
    def chunk(ctype: String, data: Array[Byte]): Unit = {
      val len = data.length
      out.write(Array((len >>> 24).toByte, (len >>> 16).toByte,
        (len >>> 8).toByte, len.toByte), 0, 4)
      val tb = ctype.getBytes("US-ASCII")
      out.write(tb, 0, 4)
      out.write(data, 0, len)
      val crc = new java.util.zip.CRC32
      crc.update(tb, 0, 4)
      crc.update(data, 0, len)
      val v = crc.getValue
      out.write(Array((v >>> 24).toByte, (v >>> 16).toByte,
        (v >>> 8).toByte, v.toByte), 0, 4)
    }
    val ihdr = new Array[Byte](13)
    ihdr(0) = (width >>> 24).toByte; ihdr(1) = (width >>> 16).toByte
    ihdr(2) = (width >>> 8).toByte; ihdr(3) = width.toByte
    ihdr(4) = (height >>> 24).toByte; ihdr(5) = (height >>> 16).toByte
    ihdr(6) = (height >>> 8).toByte; ihdr(7) = height.toByte
    ihdr(8) = 8; ihdr(9) = colorType.toByte // bit depth 8
    chunk("IHDR", ihdr)
    // zlib with stored blocks: NO_COMPRESSION keeps bytes deterministic
    val deflater = new java.util.zip.Deflater(
      java.util.zip.Deflater.NO_COMPRESSION)
    deflater.setInput(filteredRows)
    deflater.finish()
    val zbuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) {
      val n = deflater.deflate(tmp)
      zbuf.write(tmp, 0, n)
    }
    deflater.end()
    chunk("IDAT", zbuf.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Wrap arbitrary bytes as a REAL RGB8 PNG: bytes become pixel channel
    * values row-major (R,G,B,R,G,B,…), rows `width` pixels wide (filter
    * type 0), zero-padded to fill the last row; empty input yields one
    * all-zero row. Deterministic in the input, so an external oracle can
    * replay every decoded statistic from the same source bytes while the
    * engine exercises the genuine chunk walk + inflate + unfilter path
    * (the image twin of [[AudioCodecs.wrapPcm16]]). */
  def wrapRgbPng(bytes: Array[Byte], width: Int = 16): Array[Byte] = {
    require(width >= 1 && width <= MaxDim)
    val stride = width * 3
    val height = math.max(1, (bytes.length + stride - 1) / stride)
    val raw = new Array[Byte](height * (1 + stride))
    var y = 0
    while (y < height) {
      // raw(y * (1 + stride)) stays 0: filter type None
      val n = math.min(stride, math.max(0, bytes.length - y * stride))
      if (n > 0)
        System.arraycopy(bytes, y * stride, raw, y * (1 + stride) + 1, n)
      y += 1
    }
    encodePng(width, height, colorType = 2, raw)
  }

  // ───────────────────────── JPEG ─────────────────────────

  /** Recoverable parse failure — stackless by design: decode strictness
    * is the normal path when sniffing arbitrary payloads. */
  private object JpegFail extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  /** Zigzag position → natural (row-major frequency) index, T.81 Fig. A.6. */
  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** 15-bit fixed-point DCT-III basis with the ¼ normalization folded in:
    * `CosT(u)(x) = round(c(u)·cos((2x+1)uπ/16)·0.5·2^15)`, c(0)=1/√2.
    * A LITERAL grid (not computed at runtime) so the decode arithmetic is
    * bit-identical across languages — tools/make_jpeg_fixtures.py embeds
    * the same 64 integers to replay expected pixel sums independently. */
  private val CosT: Array[Array[Long]] = Array(
    Array(11585L, 11585L, 11585L, 11585L, 11585L, 11585L, 11585L, 11585L),
    Array(16069L, 13623L, 9102L, 3196L, -3196L, -9102L, -13623L, -16069L),
    Array(15137L, 6270L, -6270L, -15137L, -15137L, -6270L, 6270L, 15137L),
    Array(13623L, -3196L, -16069L, -9102L, 9102L, 16069L, 3196L, -13623L),
    Array(11585L, -11585L, -11585L, 11585L, 11585L, -11585L, -11585L, 11585L),
    Array(9102L, -16069L, 3196L, 13623L, -13623L, -3196L, 16069L, -9102L),
    Array(6270L, -15137L, 15137L, -6270L, -6270L, 15137L, -15137L, 6270L),
    Array(3196L, -9102L, 13623L, -16069L, 16069L, -13623L, 9102L, -3196L))

  /** Canonical Huffman table (T.81 F.2.2.3 DECODE tables): mincode /
    * maxcode / valptr per code length, built from the DHT BITS counts. */
  private final class JpegHuff(bits: Array[Int], vals: Array[Int]) {
    val mincode = new Array[Int](17)
    val maxcode = Array.fill(17)(-1)
    val valptr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        valptr(l) = k
        mincode(l) = code
        if (bits(l - 1) > 0) {
          code += bits(l - 1); k += bits(l - 1)
          maxcode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
      if (k != vals.length) throw JpegFail
    }
    def decode(r: JpegBits): Int = {
      var l = 1
      var code = r.nextBit()
      while (maxcode(l) < 0 || code > maxcode(l)) {
        l += 1
        if (l > 16) throw JpegFail
        code = (code << 1) | r.nextBit()
      }
      vals(valptr(l) + code - mincode(l))
    }
  }

  /** MSB-first bit reader over the entropy-coded scan with 0xFF00
    * byte-stuffing removal; any bare marker inside coefficient data is a
    * hard fail (restart markers are consumed between MCUs via
    * [[expectRestart]], byte-aligned per T.81 E.2.4). */
  private final class JpegBits(b: Array[Byte], var pos: Int) {
    private var cur = 0
    private var nbits = 0
    def nextBit(): Int = {
      if (nbits == 0) {
        if (pos >= b.length) throw JpegFail
        var v = u8(b(pos)); pos += 1
        if (v == 0xff) {
          if (pos >= b.length) throw JpegFail
          if (u8(b(pos)) == 0x00) pos += 1 // stuffed 0xFF data byte
          else throw JpegFail              // marker inside a block
        }
        cur = v; nbits = 8
      }
      nbits -= 1
      (cur >> nbits) & 1
    }
    def receive(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | nextBit(); i += 1 }
      v
    }
    /** Byte-align and consume the expected RSTn marker. */
    def expectRestart(n: Int): Unit = {
      nbits = 0
      if (pos + 2 > b.length || u8(b(pos)) != 0xff ||
        u8(b(pos + 1)) != (0xd0 + (n & 7))) throw JpegFail
      pos += 2
    }
  }

  /** DC difference / AC magnitude sign extension (T.81 F.2.2.1 EXTEND). */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private final class JpegComp(val id: Int, val hS: Int, val vS: Int,
                               val tq: Int) {
    var dcTab = 0
    var acTab = 0
    var pred = 0
    var plane: Array[Int] = null
    var planeW = 0
  }

  /** Baseline sequential DCT JPEG (ITU-T T.81 Annex F): marker walk,
    * canonical Huffman decode with byte-stuffing + RSTn restart handling,
    * dequantization, fixed-point integer IDCT ([[CosT]], descale
    * `(s + 2^29) >> 30` then level-shift +128), nearest-neighbor chroma
    * upsampling and 16-bit fixed-point JFIF YCbCr→RGB
    * (R += 91881·Cr, G −= 22554·Cb + 46802·Cr, B += 116130·Cb, all
    * `(… + 32768) >> 16`). Supported: 8-bit precision, 1 component
    * (grayscale) or 3 components (YCbCr) interleaved in one scan,
    * sampling factors 1–2 (4:4:4 / 4:2:2 / 4:2:0). Progressive (SOF2),
    * arithmetic coding, 12-bit, hierarchical and multi-scan files return
    * None — strictness over coverage, the PNG/BMP contract.
    *
    * Every arithmetic step is integer, so the decode is bit-exact across
    * languages: the checked-in fixtures' expected channel sums are
    * produced by an independent replay of this contract over the same
    * quantized coefficients (tools/make_jpeg_fixtures.py). */
  private[mm] def decodeJpeg(b: Array[Byte]): Option[DecodedImage] = {
    if (b.length < 4 || u8(b(0)) != 0xff || u8(b(1)) != 0xd8 ||
      u8(b(2)) != 0xff) return None
    try {
      val quant = new Array[Array[Int]](4)         // zigzag order, as read
      val dcTabs = new Array[JpegHuff](4)
      val acTabs = new Array[JpegHuff](4)
      var restartInterval = 0
      var w = 0; var h = 0
      var comps: Array[JpegComp] = null
      var pos = 2
      var scanStart = -1

      def be16(off: Int): Int = {
        if (off + 2 > b.length) throw JpegFail
        (u8(b(off)) << 8) | u8(b(off + 1))
      }

      while (scanStart < 0) {
        if (pos + 2 > b.length || u8(b(pos)) != 0xff) throw JpegFail
        var m = u8(b(pos + 1)); pos += 2
        while (m == 0xff) { if (pos >= b.length) throw JpegFail; m = u8(b(pos)); pos += 1 }
        m match {
          case 0xd8 => ()                          // stray SOI: ignore
          case 0xc0 =>                             // SOF0 baseline
            val len = be16(pos)
            if (u8(b(pos + 2)) != 8) throw JpegFail // precision
            h = be16(pos + 3); w = be16(pos + 5)
            if (w <= 0 || h <= 0 || w > MaxDim || h > MaxDim) throw JpegFail
            val nc = u8(b(pos + 7))
            if (nc != 1 && nc != 3) throw JpegFail
            if (len != 8 + 3 * nc) throw JpegFail
            comps = Array.tabulate(nc) { i =>
              val o = pos + 8 + 3 * i
              val hs = u8(b(o + 1)) >> 4
              val vs = u8(b(o + 1)) & 0xf
              if (hs < 1 || hs > 2 || vs < 1 || vs > 2) throw JpegFail
              val tq = u8(b(o + 2))
              if (tq > 3) throw JpegFail
              new JpegComp(u8(b(o)), hs, vs, tq)
            }
            pos += len
          case 0xc4 =>                             // DHT (1+ tables)
            val len = be16(pos)
            var o = pos + 2
            while (o < pos + len) {
              val tc = u8(b(o)) >> 4
              val th = u8(b(o)) & 0xf
              if (tc > 1 || th > 3) throw JpegFail
              val bits = Array.tabulate(16)(i => u8(b(o + 1 + i)))
              val n = bits.sum
              if (o + 17 + n > pos + len) throw JpegFail
              val vals = Array.tabulate(n)(i => u8(b(o + 17 + i)))
              val t = new JpegHuff(bits, vals)
              if (tc == 0) dcTabs(th) = t else acTabs(th) = t
              o += 17 + n
            }
            if (o != pos + len) throw JpegFail
            pos += len
          case 0xdb =>                             // DQT (1+ tables)
            val len = be16(pos)
            var o = pos + 2
            while (o < pos + len) {
              val pq = u8(b(o)) >> 4
              val tq = u8(b(o)) & 0xf
              if (pq != 0 || tq > 3) throw JpegFail // 8-bit tables only
              if (o + 65 > pos + len) throw JpegFail
              quant(tq) = Array.tabulate(64)(i => u8(b(o + 1 + i)))
              o += 65
            }
            if (o != pos + len) throw JpegFail
            pos += len
          case 0xdd =>                             // DRI
            if (be16(pos) != 4) throw JpegFail
            restartInterval = be16(pos + 2)
            pos += 4
          case 0xda =>                             // SOS
            val len = be16(pos)
            if (comps == null) throw JpegFail
            val ns = u8(b(pos + 2))
            if (ns != comps.length || len != 6 + 2 * ns) throw JpegFail
            var i = 0
            while (i < ns) {
              val cid = u8(b(pos + 3 + 2 * i))
              val c = comps.find(_.id == cid).getOrElse(throw JpegFail)
              c.dcTab = u8(b(pos + 4 + 2 * i)) >> 4
              c.acTab = u8(b(pos + 4 + 2 * i)) & 0xf
              if (c.dcTab > 3 || c.acTab > 3) throw JpegFail
              i += 1
            }
            // spectral selection 0..63, approximation 0 (baseline)
            if (u8(b(pos + 3 + 2 * ns)) != 0 ||
              u8(b(pos + 4 + 2 * ns)) != 63 ||
              u8(b(pos + 5 + 2 * ns)) != 0) throw JpegFail
            scanStart = pos + len
          case 0xd9 => throw JpegFail              // EOI before any scan
          case x if x >= 0xc1 && x <= 0xcf => throw JpegFail // non-baseline SOF
          case _ =>                                // APPn / COM / other
            pos += be16(pos)
        }
      }

      val hmax = comps.map(_.hS).max
      val vmax = comps.map(_.vS).max
      val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
      val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
      comps.foreach { c =>
        c.planeW = mcusX * 8 * c.hS
        c.plane = new Array[Int](c.planeW * mcusY * 8 * c.vS)
        if (quant(c.tq) == null) throw JpegFail
      }

      val r = new JpegBits(b, scanStart)
      val coef = new Array[Int](64)                // natural order, dequantized
      val idctT = new Array[Long](64)              // separable-IDCT row pass

      def decodeBlock(c: JpegComp, blockRow: Int, blockCol: Int): Unit = {
        val dc = dcTabs(c.dcTab); val ac = acTabs(c.acTab)
        if (dc == null || ac == null) throw JpegFail
        val qt = quant(c.tq)
        java.util.Arrays.fill(coef, 0)
        val s0 = dc.decode(r)
        if (s0 > 11) throw JpegFail
        c.pred += extend(r.receive(s0), s0)
        coef(0) = c.pred * qt(0)
        var k = 1
        while (k < 64) {
          val rs = ac.decode(r)
          val run = rs >> 4; val size = rs & 0xf
          if (size == 0) {
            if (run == 15) k += 16                 // ZRL
            else k = 64                            // EOB
          } else {
            k += run
            if (k > 63) throw JpegFail
            coef(ZigZag(k)) = extend(r.receive(size), size) * qt(k)
            k += 1
          }
        }
        // fixed-point IDCT + level shift, straight from the basis grid.
        // SEPARABLE two-pass form of the r1–r15 quadruple loop: the old
        // per-pixel sum Σ_v Σ_u f(v,u)·CosT(u)(x)·CosT(v)(y) factors as
        // Σ_v (Σ_u f(v,u)·CosT(u)(x))·CosT(v)(y) — pure 64-bit integer
        // multiply/add throughout (no intermediate descale), and integer
        // × and + are associative/distributive even under wraparound, so
        // every pixel is BIT-IDENTICAL to the unfactored form (the
        // fixture sums in MultimodalSpec pin it). Work per block drops
        // from 64 px × 64 coefs to 2 × 512 multiply-adds (~3-4×) — the
        // decode CPU is the censused floor of every JPEG consumer
        // (x12/x13/x32/x84).
        val base = blockRow * 8 * c.planeW + blockCol * 8
        var v = 0
        while (v < 8) {
          var x = 0
          while (x < 8) {
            var t = 0L
            var u = 0
            while (u < 8) {
              val f = coef(v * 8 + u)
              if (f != 0) t += f * CosT(u)(x)
              u += 1
            }
            idctT(v * 8 + x) = t
            x += 1
          }
          v += 1
        }
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            var s = 0L
            var v1 = 0
            while (v1 < 8) {
              s += idctT(v1 * 8 + x) * CosT(v1)(y)
              v1 += 1
            }
            var p = (((s + (1L << 29)) >> 30) + 128).toInt
            if (p < 0) p = 0 else if (p > 255) p = 255
            c.plane(base + y * c.planeW + x) = p
            x += 1
          }
          y += 1
        }
      }

      var mcu = 0
      var rstN = 0
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
            r.expectRestart(rstN)
            rstN = (rstN + 1) & 7
            comps.foreach(_.pred = 0)
          }
          comps.foreach { c =>
            var v0 = 0
            while (v0 < c.vS) {
              var h0 = 0
              while (h0 < c.hS) {
                decodeBlock(c, my * c.vS + v0, mx * c.hS + h0)
                h0 += 1
              }
              v0 += 1
            }
          }
          mcu += 1
          mx += 1
        }
        my += 1
      }

      // upsample + color conversion + channel sums
      var sumR = 0L; var sumG = 0L; var sumB = 0L
      if (comps.length == 1) {
        val c = comps(0)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val g = c.plane(y * c.planeW + x)
            sumR += g; sumG += g; sumB += g
            x += 1
          }
          y += 1
        }
      } else {
        val cy = comps(0); val cb = comps(1); val cr = comps(2)
        def sample(c: JpegComp, x: Int, y: Int): Int =
          c.plane((y * c.vS / vmax) * c.planeW + (x * c.hS / hmax))
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val yy = sample(cy, x, y) << 16
            val pb = sample(cb, x, y) - 128
            val pr = sample(cr, x, y) - 128
            def cl(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
            sumR += cl((yy + 91881 * pr + 32768) >> 16)
            sumG += cl((yy - 22554 * pb - 46802 * pr + 32768) >> 16)
            sumB += cl((yy + 116130 * pb + 32768) >> 16)
            x += 1
          }
          y += 1
        }
      }
      Some(DecodedImage("jpeg", w, h, sumR, sumG, sumB, 255))
    } catch {
      case JpegFail => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }
}
