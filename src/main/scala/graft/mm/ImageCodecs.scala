package graft.mm

/** Dependency-free image decoding for the multimodal decode stage: BMP
  * (24-bit uncompressed, the BITMAPINFOHEADER layout) and PPM (P6 binary
  * / P3 ASCII, maxval ≤ 255). Real formats, real pixels — this replaces
  * the "decode is a stub by contract" gap: [[Multimodal.decodeFeatures]]
  * sniffs these formats first and only falls back to the deterministic
  * byte-fold stub for payloads that are not images (e.g. the text-backed
  * synthetic assets the oracle replays).
  *
  * Validation is STRICT by design — every length/field check must pass or
  * the decoder returns None. That is what makes the sniff safe to run on
  * arbitrary payloads: a text document that happens to start with "BM"
  * fails the header arithmetic long before pixels are read.
  *
  * JPEG/PNG/audio/video stay out of scope (their codecs are not in this
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

  /** Sniff + decode: BMP ("BM"), P6, or P3; None when the payload is not
    * a (supported, well-formed) image. */
  def decode(bytes: Array[Byte]): Option[DecodedImage] =
    if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') decodeBmp(bytes)
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
}
