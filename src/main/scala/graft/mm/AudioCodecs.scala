package graft.mm

/** Dependency-free audio decoding for the multimodal decode stage: WAV
  * (RIFF) containers carrying uncompressed PCM16 — the third real format
  * behind the decode seam, next to [[ImageCodecs]]' BMP/PPM. Real header
  * walk, real samples; the features a curation pipeline filters audio on
  * (duration, clipping, per-window energy for silence/voice-activity
  * trims) come from the actual PCM stream.
  *
  * Validation is STRICT, like ImageCodecs: RIFF/WAVE magic, a well-formed
  * chunk walk, `fmt ` declaring PCM (audioFormat 1) at 16 bits, and a
  * `data` chunk that fits the payload — any violation returns None, which
  * is what makes the sniff safe on arbitrary payloads.
  *
  * Compressed codecs (MP3/AAC/Opus) stay out of scope (not in this
  * environment); the seam (`bytes → Option[DecodedAudio]`) is where an
  * FFI codec bridge would slot in.
  */
object AudioCodecs {

  /** One decoded PCM16 stream. `samples` are interleaved across channels
    * exactly as stored (frame-major); all derived stats below are integer
    * folds over them, so every feature is bit-stable and replayable by an
    * external oracle. */
  final case class DecodedAudio(sampleRate: Int, channels: Int,
                                samples: Array[Short]) {
    def nSamples: Int = samples.length

    /** Sum of squared sample values per fixed-size window (last window
      * ragged) — integer-exact energy, the unit silence-trimming and
      * voice-activity heuristics threshold on. */
    def windowEnergies(windowSize: Int): Array[Long] = {
      require(windowSize > 0)
      val n = samples.length
      val out = new Array[Long]((n + windowSize - 1) / windowSize)
      var i = 0
      while (i < n) {
        val s = samples(i).toLong
        out(i / windowSize) += s * s
        i += 1
      }
      out
    }

    /** Peak absolute amplitude — 32768 means at least one sample sits at
      * the clipping rail. */
    def peak: Int = {
      var m = 0
      var i = 0
      while (i < samples.length) {
        val a = math.abs(samples(i).toInt)
        if (a > m) m = a
        i += 1
      }
      m
    }
  }

  private def u8(b: Byte): Int = b & 0xff

  private def leInt(b: Array[Byte], off: Int): Int =
    u8(b(off)) | (u8(b(off + 1)) << 8) | (u8(b(off + 2)) << 16) | (u8(b(off + 3)) << 24)

  private def leShort(b: Array[Byte], off: Int): Int =
    u8(b(off)) | (u8(b(off + 1)) << 8)

  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** Sniff + decode a RIFF/WAVE PCM16 payload; None when the payload is
    * not a (supported, well-formed) WAV. Chunk walk tolerates extra
    * chunks (LIST, fact, …) before/after `fmt `/`data`, as real encoders
    * emit them; odd-sized chunks consume their RIFF pad byte. */
  def decodeWav(b: Array[Byte]): Option[DecodedAudio] = {
    if (b.length < 44) return None
    if (tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return None
    var off = 12
    var sampleRate = 0
    var channels = 0
    var haveFmt = false
    var data: Option[(Int, Int)] = None // (offset, length)
    while (off + 8 <= b.length && (data.isEmpty || !haveFmt)) {
      val id = tag(b, off)
      val len = leInt(b, off + 4)
      if (len < 0 || off + 8 + len > b.length) return None
      id match {
        case "fmt " =>
          if (len < 16) return None
          val audioFormat = leShort(b, off + 8)
          channels = leShort(b, off + 10)
          sampleRate = leInt(b, off + 12)
          val bitsPerSample = leShort(b, off + 22)
          if (audioFormat != 1 || bitsPerSample != 16) return None
          if (channels < 1 || channels > 16) return None
          if (sampleRate < 1 || sampleRate > 384000) return None
          haveFmt = true
        case "data" => data = Some((off + 8, len))
        case _ => () // skip unknown chunks
      }
      off += 8 + len + (len & 1) // RIFF chunks are word-aligned
    }
    data match {
      case Some((dOff, dLen)) if haveFmt =>
        val nSamples = dLen / 2 // truncate a trailing odd byte
        val samples = new Array[Short](nSamples)
        var i = 0
        while (i < nSamples) {
          samples(i) = (u8(b(dOff + 2 * i)) | (u8(b(dOff + 2 * i + 1)) << 8)).toShort
          i += 1
        }
        Some(DecodedAudio(sampleRate, channels, samples))
      case _ => None
    }
  }

  /** Wrap raw bytes as a minimal mono PCM16 WAV: consecutive byte PAIRS
    * become little-endian int16 samples (a trailing odd byte is dropped).
    * The synthesis half of the codec round-trip — tests and the catalog
    * query build REAL WAV containers from deterministic bytes with it, so
    * the decode path above runs against genuine format structure instead
    * of a fallback stub. */
  def wrapPcm16(raw: Array[Byte], sampleRate: Int = 8000): Array[Byte] = {
    val dataLen = raw.length & ~1
    val out = new Array[Byte](44 + dataLen)
    def putTag(off: Int, s: String): Unit = {
      val t = s.getBytes("US-ASCII"); System.arraycopy(t, 0, out, off, 4)
    }
    def putLeInt(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
      out(off + 2) = (v >> 16).toByte; out(off + 3) = (v >> 24).toByte
    }
    def putLeShort(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
    }
    putTag(0, "RIFF"); putLeInt(4, 36 + dataLen); putTag(8, "WAVE")
    putTag(12, "fmt "); putLeInt(16, 16)
    putLeShort(20, 1) // PCM
    putLeShort(22, 1) // mono
    putLeInt(24, sampleRate)
    putLeInt(28, sampleRate * 2) // byte rate
    putLeShort(32, 2) // block align
    putLeShort(34, 16) // bits per sample
    putTag(36, "data"); putLeInt(40, dataLen)
    System.arraycopy(raw, 0, out, 44, dataLen)
    out
  }
}
