package graft.mm

/** Dependency-free image decoding for the multimodal decode stage: PNG
  * (8-bit gray/RGB/RGBA, all five scanline filters, zlib IDAT via the
  * JDK's `Inflater`), BMP (24-bit uncompressed, the BITMAPINFOHEADER
  * layout) and PPM (P6 binary / P3 ASCII, maxval ≤ 255). Real formats,
  * real pixels — this replaces the "decode is a stub by contract" gap:
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
  * JPEG/video stay out of scope (their codecs are not in this
  * environment); the decode seam (`bytes → Option[DecodedImage]`) is
  * exactly where a JNI/FFI codec bridge would slot in.
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

  /** Sniff + decode: PNG (8-byte signature), BMP ("BM"), P6, or P3; None
    * when the payload is not a (supported, well-formed) image. */
  def decode(bytes: Array[Byte]): Option[DecodedImage] =
    if (bytes.length >= 8 && isPngSignature(bytes)) decodePng(bytes)
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
}
