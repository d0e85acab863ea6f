package graft.mm

/** Dependency-free video decoding for the multimodal decode stage: the
  * AVI RIFF container (Microsoft "AVI RIFF File Reference" layout —
  * `RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf)) LIST('movi'
  * 00db/00dc…))`) carrying either uncompressed BGR24 frames (`DIB `
  * handler, the BITMAPINFOHEADER raster [[ImageCodecs.decodeBmp]]
  * already walks) or Motion-JPEG (`MJPG` — each movi chunk is a complete
  * baseline JPEG, decoded by the existing [[ImageCodecs.decodeJpeg]]).
  * This closes the "video is the last stub" gap with the same posture as
  * the image codecs: a real container walk over real frame payloads,
  * emitting the exact integer channel statistics the curation pipeline
  * filters on.
  *
  * Validation is STRICT, like ImageCodecs: every RIFF size must nest
  * correctly, the stream must declare `vids` with a supported handler,
  * every frame chunk must carry exactly one frame of the declared
  * geometry, and the frame count must match the stream header — any
  * violation returns None, which is what makes the sniff safe on
  * arbitrary payloads (a text document starting with "RIFF" fails the
  * fourCC/size arithmetic long before pixels are read).
  *
  * Scale note: decode cost is linear in payload bytes and runs inside the
  * decodeFeatures mapPartitions — payloads never shuffle, statistics are
  * a few longs per asset.
  */
object VideoCodecs {

  /** One decoded video: geometry + frame count + exact integer channel
    * sums accumulated over ALL frames (row padding excluded). */
  final case class DecodedVideo(format: String, width: Int, height: Int,
                                nFrames: Int, fpsMicro: Long,
                                sumR: Long, sumG: Long, sumB: Long,
                                maxVal: Int) {
    def nPixels: Long = width.toLong * height * nFrames
    def meanLuma: Double =
      (0.2126 * sumR + 0.7152 * sumG + 0.0722 * sumB) / (nPixels.toDouble * maxVal)
  }

  private val MaxDim = 1 << 14
  private val MaxFrames = 1 << 20

  private def u8(b: Byte): Int = b & 0xff

  private def leInt(b: Array[Byte], off: Int): Int =
    u8(b(off)) | (u8(b(off + 1)) << 8) | (u8(b(off + 2)) << 16) | (u8(b(off + 3)) << 24)

  private def fourCC(b: Array[Byte], off: Int): String =
    new String(Array(b(off), b(off + 1), b(off + 2), b(off + 3)), "US-ASCII")

  /** True iff the payload leads with the 12-byte AVI RIFF signature —
    * the cheap sniff [[Multimodal.decode]] gates on. */
  def isAviSignature(b: Array[Byte]): Boolean =
    b.length >= 12 && fourCC(b, 0) == "RIFF" && fourCC(b, 8) == "AVI "

  /** Sniff + decode an AVI payload; None unless every container and
    * frame check passes. */
  def decode(b: Array[Byte]): Option[DecodedVideo] = {
    if (!isAviSignature(b)) return None
    val riffSize = leInt(b, 4).toLong & 0xffffffffL
    if (riffSize + 8 > b.length || riffSize < 4) return None

    // stream description gathered from hdrl; frames gathered from movi
    var width, height = 0
    var handler: String = null
    var declaredFrames = -1
    var avihFrames = -1
    var fpsMicro = 0L
    var frames = 0
    var (sr, sg, sb) = (0L, 0L, 0L)
    var sawHdrl, sawMovi, bad = false

    def walkStrl(off: Int, end: Int): Unit = {
      var p = off
      var isVids = false
      while (p + 8 <= end && !bad) {
        val id = fourCC(b, p); val sz = leInt(b, p + 4)
        if (sz < 0 || p.toLong + 8 + sz > end) { bad = true; return }
        if (id == "strh" && sz >= 56) {
          val fccType = fourCC(b, p + 8)
          if (fccType == "vids") {
            isVids = true
            handler = fourCC(b, p + 12)
            val scale = leInt(b, p + 8 + 20)
            val rate = leInt(b, p + 8 + 24)
            declaredFrames = leInt(b, p + 8 + 32)
            if (scale <= 0 || rate <= 0) bad = true
            else fpsMicro = 1000000L * scale / rate
          }
        } else if (id == "strf" && isVids && sz >= 40) {
          // BITMAPINFOHEADER; negative height = top-down (accepted, sums
          // are row-order invariant)
          width = leInt(b, p + 8 + 4)
          height = math.abs(leInt(b, p + 8 + 8))
          val bpp = u8(b(p + 8 + 14)) | (u8(b(p + 8 + 15)) << 8)
          val compression = leInt(b, p + 8 + 16)
          if (handler == "DIB " && (bpp != 24 || compression != 0)) bad = true
        }
        p = math.min(p.toLong + 8 + sz + (sz & 1), Int.MaxValue.toLong).toInt
      }
    }

    def walkHdrl(off: Int, end: Int): Unit = {
      var p = off
      while (p + 8 <= end && !bad) {
        val id = fourCC(b, p); val sz = leInt(b, p + 4)
        if (sz < 0 || p.toLong + 8 + sz > end) { bad = true; return }
        if (id == "avih" && sz >= 56) avihFrames = leInt(b, p + 8 + 16)
        if (id == "LIST" && sz >= 4 && fourCC(b, p + 8) == "strl")
          walkStrl(p + 12, p + 8 + sz)
        p = math.min(p.toLong + 8 + sz + (sz & 1), Int.MaxValue.toLong).toInt
      }
    }

    def addDibFrame(off: Int, sz: Int): Unit = {
      val stride = ((width * 3 + 3) / 4) * 4
      if (sz != stride * height) { bad = true; return }
      var y = 0
      while (y < height) {
        var base = off + y * stride
        var x = 0
        while (x < width) { // BGR byte order, padding never counted
          sb += u8(b(base)); sg += u8(b(base + 1)); sr += u8(b(base + 2))
          base += 3; x += 1
        }
        y += 1
      }
    }

    def addMjpgFrame(off: Int, sz: Int): Unit =
      ImageCodecs.decode(java.util.Arrays.copyOfRange(b, off, off + sz)) match {
        case Some(img) if img.format == "jpeg" &&
          img.width == width && img.height == height =>
          sr += img.sumR; sg += img.sumG; sb += img.sumB
        case _ => bad = true
      }

    def walkMovi(off: Int, end: Int): Unit = {
      var p = off
      while (p + 8 <= end && !bad) {
        val id = fourCC(b, p); val sz = leInt(b, p + 4)
        if (sz < 0 || p.toLong + 8 + sz > end) { bad = true; return }
        val tail = id.substring(2)
        val isFrame = tail == "db" || tail == "dc"
        if (isFrame) {
          if (width <= 0 || frames >= MaxFrames) { bad = true; return }
          if (handler == "DIB ") addDibFrame(p + 8, sz)
          else if (handler == "MJPG") addMjpgFrame(p + 8, sz)
          else { bad = true; return }
          frames += 1
        }
        p = math.min(p.toLong + 8 + sz + (sz & 1), Int.MaxValue.toLong).toInt
      }
    }

    var p = 12
    val riffEnd = math.min(b.length.toLong, 8 + riffSize).toInt
    while (p + 8 <= riffEnd && !bad) {
      val id = fourCC(b, p); val sz = leInt(b, p + 4)
      if (sz < 0 || p.toLong + 8 + sz > riffEnd) { bad = true }
      else {
        if (id == "LIST" && sz >= 4) {
          val listType = fourCC(b, p + 8)
          if (listType == "hdrl") {
            walkHdrl(p + 12, p + 8 + sz); sawHdrl = true
            if (width < 1 || width > MaxDim || height < 1 ||
              height > MaxDim || handler == null) bad = true
          } else if (listType == "movi") {
            if (!sawHdrl) bad = true else { walkMovi(p + 12, p + 8 + sz); sawMovi = true }
          }
        }
        p = math.min(p.toLong + 8 + sz + (sz & 1), Int.MaxValue.toLong).toInt
      }
    }
    if (bad || !sawHdrl || !sawMovi || frames < 1 ||
      (declaredFrames >= 0 && declaredFrames != frames) ||
      (avihFrames >= 0 && avihFrames != frames)) None
    else Some(DecodedVideo(
      if (handler == "DIB ") "avi-dib" else "avi-mjpg",
      width, height, frames, fpsMicro, sr, sg, sb, 255))
  }

  // ───────────────────────── writers ─────────────────────────

  /** Assemble a Motion-JPEG AVI from pre-encoded JPEG frames (all of the
    * declared geometry): each frame becomes one `00dc` chunk, odd sizes
    * padded per RIFF. Test/fixture surface for the MJPG decode path —
    * production MJPEG comes off cameras, not this writer. */
  def wrapMjpgAvi(frames: Seq[Array[Byte]], width: Int, height: Int,
                  scale: Int = 1, rate: Int = 12): Array[Byte] = {
    require(frames.nonEmpty && width >= 1 && height >= 1)
    val out = new java.io.ByteArrayOutputStream()
    def le(i: Int): Unit = {
      out.write(i & 0xff); out.write((i >> 8) & 0xff)
      out.write((i >> 16) & 0xff); out.write((i >> 24) & 0xff)
    }
    def cc(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    val strf = 40; val strh = 56; val avih = 56
    val strlSz = 4 + (8 + strh) + (8 + strf)
    val hdrlSz = 4 + (8 + avih) + (8 + strlSz)
    val moviSz = 4 + frames.map(f => 8 + f.length + (f.length & 1)).sum
    val riffSz = 4 + (8 + hdrlSz) + (8 + moviSz)
    val maxF = frames.map(_.length).max
    cc("RIFF"); le(riffSz); cc("AVI ")
    cc("LIST"); le(hdrlSz); cc("hdrl")
    cc("avih"); le(avih)
    le(1000000 * scale / rate); le(0); le(0); le(0)
    le(frames.length); le(0); le(1); le(maxF)
    le(width); le(height); le(0); le(0); le(0); le(0)
    cc("LIST"); le(strlSz); cc("strl")
    cc("strh"); le(strh)
    cc("vids"); cc("MJPG"); le(0); le(0)
    le(0); le(scale); le(rate); le(0)
    le(frames.length); le(maxF); le(-1); le(0)
    le(0); le(0)
    cc("strf"); le(strf)
    le(40); le(width); le(-height)
    out.write(1); out.write(0); out.write(24); out.write(0)
    cc("MJPG"); le(maxF); le(0); le(0); le(0); le(0) // biCompression = 'MJPG'
    cc("LIST"); le(moviSz); cc("movi")
    frames.foreach { f =>
      cc("00dc"); le(f.length); out.write(f, 0, f.length)
      if ((f.length & 1) == 1) out.write(0)
    }
    out.toByteArray
  }

  /** Wrap arbitrary bytes as a REAL uncompressed AVI: the payload is
    * packed row-major into `width`×`height` BGR24 frames (channel of
    * byte i is i mod 3 → B,G,R; zero-padded to fill the last frame;
    * empty input yields one all-zero frame), 12 fps, top-down rows so
    * the raster bytes are the source bytes verbatim. Deterministic in
    * the input, so an external oracle can replay every decoded statistic
    * from the same source bytes while the engine exercises the genuine
    * RIFF walk + frame raster path — the video twin of
    * [[ImageCodecs.wrapRgbPng]]. `width` must keep the BGR stride
    * 4-byte aligned (width·3 ≡ 0 mod 4) so no row padding perturbs the
    * byte↔channel mapping. */
  def wrapBgrAvi(bytes: Array[Byte], width: Int = 16, height: Int = 8): Array[Byte] = {
    require(width >= 1 && width <= MaxDim && height >= 1 && height <= MaxDim)
    require((width * 3) % 4 == 0,
      s"width $width would need row padding (stride ${width * 3}); use a width with 4-aligned stride")
    val frameBytes = width * 3 * height
    val nFrames = math.max(1, (bytes.length + frameBytes - 1) / frameBytes)
    require(nFrames <= MaxFrames)

    val out = new java.io.ByteArrayOutputStream()
    def le(i: Int): Unit = {
      out.write(i & 0xff); out.write((i >> 8) & 0xff)
      out.write((i >> 16) & 0xff); out.write((i >> 24) & 0xff)
    }
    def cc(s: String): Unit = out.write(s.getBytes("US-ASCII"))

    val strf = 40
    val strh = 56
    val strlSz = 4 + (8 + strh) + (8 + strf)
    val avih = 56
    val hdrlSz = 4 + (8 + avih) + (8 + strlSz)
    val moviSz = 4 + nFrames * (8 + frameBytes)
    val riffSz = 4 + (8 + hdrlSz) + (8 + moviSz)

    cc("RIFF"); le(riffSz); cc("AVI ")
    cc("LIST"); le(hdrlSz); cc("hdrl")
    cc("avih"); le(avih)
    le(83333); le(frameBytes * 12); le(0); le(0) // usec/frame, bytes/sec, pad, flags
    le(nFrames); le(0); le(1); le(frameBytes)    // totalFrames, initial, streams, sugBuf
    le(width); le(height); le(0); le(0); le(0); le(0)
    cc("LIST"); le(strlSz); cc("strl")
    cc("strh"); le(strh)
    cc("vids"); cc("DIB "); le(0); le(0)         // type, handler, flags, prio+lang
    le(0); le(1); le(12); le(0)                  // initialFrames, scale, rate, start
    le(nFrames); le(frameBytes); le(-1); le(0)   // length, sugBuf, quality, sampleSize
    le(0); le(0)                                 // rcFrame (4 shorts)
    cc("strf"); le(strf)
    le(40); le(width); le(-height); // biSize, biWidth, NEGATIVE height = top-down
    out.write(1); out.write(0); out.write(24); out.write(0) // planes, bpp
    le(0); le(frameBytes); le(0); le(0); le(0); le(0)       // BI_RGB, sizeImage, …
    cc("LIST"); le(moviSz); cc("movi")
    var f = 0
    while (f < nFrames) {
      cc("00db"); le(frameBytes)
      val start = f * frameBytes
      val n = math.min(frameBytes, math.max(0, bytes.length - start))
      if (n > 0) out.write(bytes, start, n)
      var pad = frameBytes - n
      while (pad > 0) { out.write(0); pad -= 1 }
      f += 1
    }
    out.toByteArray
  }
}
