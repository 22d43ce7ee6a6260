package graft.multimodal

/** REAL sample-level FLAC decode — the last pure-integer public-spec
  * audio codec a bare JVM can decode honestly (RFC 9639: constant /
  * verbatim / fixed-predictor AND quantized-coefficient LPC subframes
  * with Rice-coded residuals are all integer arithmetic, as is stereo
  * decorrelation; no psychoacoustics, no float transforms — unlike
  * MP3/AAC, whose sample decode stays a documented non-goal).
  *
  * Decoder scope (strict, like every parser in [[Multimodal]]):
  * mono and stereo 16-bit streams; CONSTANT, VERBATIM, FIXED (order
  * 0..4), and LPC (order 1..32, quantized integer coefficients,
  * non-negative shift) subframes; independent / left-side /
  * right-side / mid-side channel assignments (side subframes at
  * bps+1, per spec); Rice methods 0 (4-bit params) and 1 (5-bit
  * params) with any partition order, including ESCAPED partitions
  * (n-bit signed verbatim residuals); wasted-bits shifts (applied per
  * subframe BEFORE stereo reconstruction, per spec); UTF-8-coded
  * frame numbers; CRC-8 header and CRC-16 frame checksums VERIFIED.
  * Anything outside that envelope — >2 channels, a negative LPC
  * shift, the escaped coefficient precision, a checksum mismatch,
  * trailing bytes, a hostile length — declines the clip (quarantine
  * routing, not silent truncation).
  *
  * The fixture synthesizer emits spec-layout streams whose frame
  * headers, Rice partitions, and checksums are real: a nibble-level
  * bug in either the muxer or the decoder breaks the round trip, and
  * the verify-time oracle replays the generating FORMULAS instead of
  * the bytes (the `audio_adpcm_stats` pattern), so container packing
  * and decode are checked against spec arithmetic, not each other.
  *
  * Reference: the library this engine re-expresses has no audio
  * anything (closest: blob-store pass-through,
  * python/src/mapreduce/input_readers.py:660-724) — this module exists
  * for the multimodal north star. Linear per clip, shuffle-free.
  */
object Flac {

  // ---- checksums (public spec polynomials) -----------------------------

  /** CRC-8, poly 0x07, init 0 — FLAC frame-header checksum. */
  def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xff)
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff
              else (crc << 1) & 0xff
        k += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, poly 0x8005, init 0 — FLAC whole-frame checksum. */
  def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xff) << 8
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
              else (crc << 1) & 0xffff
        k += 1
      }
      i += 1
    }
    crc
  }

  // ---- bit-level IO (MSB-first, as the spec reads) ---------------------

  private final class BitWriter {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var cur = 0
    private var nBits = 0
    def writeBits(v: Long, n: Int): Unit = {
      var k = n - 1
      while (k >= 0) {
        cur = (cur << 1) | ((v >>> k) & 1L).toInt
        nBits += 1
        if (nBits == 8) { buf += cur.toByte; cur = 0; nBits = 0 }
        k -= 1
      }
    }
    /** Spec unary: q zero bits then a one bit. */
    def writeUnary(q: Int): Unit = { writeBits(0L, q); writeBits(1L, 1) }
    def alignByte(): Unit = if (nBits != 0) writeBits(0L, 8 - nBits)
    def isAligned: Boolean = nBits == 0
    def size: Int = buf.size
    def toBytes: Array[Byte] = { alignByte(); buf.toArray }
    def byteAt(i: Int): Byte = buf(i)
  }

  private final class BitReader(b: Array[Byte]) {
    private var pos = 0 // absolute bit position
    def bytePos: Int = pos >>> 3
    def bitAligned: Boolean = (pos & 7) == 0
    def seekByte(byteOff: Int): Unit = pos = byteOff << 3
    def remainingBits: Int = (b.length << 3) - pos
    def readBits(n: Int): Long = {
      if (n > remainingBits) throw new IllegalStateException("EOF")
      var v = 0L
      var k = 0
      while (k < n) {
        val byte = b(pos >>> 3) & 0xff
        val bit = (byte >>> (7 - (pos & 7))) & 1
        v = (v << 1) | bit
        pos += 1
        k += 1
      }
      v
    }
    def readSigned(n: Int): Int = {
      val v = readBits(n)
      (v << (64 - n) >> (64 - n)).toInt // sign-extend
    }
    def readUnary(): Int = {
      var q = 0
      while (readBits(1) == 0L) {
        q += 1
        if (q > (1 << 20)) throw new IllegalStateException("unary runaway")
      }
      q
    }
    def alignByte(): Unit = if ((pos & 7) != 0) pos = (pos | 7) + 1
  }

  // ---- decoder ---------------------------------------------------------

  private def zigzagDecode(u: Long): Int =
    if ((u & 1L) == 0L) (u >>> 1).toInt else (-(u >>> 1) - 1).toInt

  /** Fixed-predictor recurrences, order 0..4 (public spec). */
  @inline private def fixedPredict(order: Int, s: Array[Int], i: Int): Int =
    order match {
      case 0 => 0
      case 1 => s(i - 1)
      case 2 => 2 * s(i - 1) - s(i - 2)
      case 3 => 3 * s(i - 1) - 3 * s(i - 2) + s(i - 3)
      case 4 => 4 * s(i - 1) - 6 * s(i - 2) + 4 * s(i - 3) - s(i - 4)
    }

  /** UTF-8-style coded number (frame header; spec extends UTF-8 to 36
    * bits). Returns -1 on malformed coding. */
  private def readCodedNumber(r: BitReader): Long = {
    val b0 = r.readBits(8).toInt
    if ((b0 & 0x80) == 0) return b0.toLong
    var nCont = 0
    var mask = 0x40
    while ((b0 & mask) != 0 && nCont < 7) { nCont += 1; mask >>= 1 }
    if (nCont == 0 || nCont == 7) return -1L
    var v = (b0 & (mask - 1)).toLong
    var i = 0
    while (i < nCont) {
      val c = r.readBits(8).toInt
      if ((c & 0xc0) != 0x80) return -1L
      v = (v << 6) | (c & 0x3f)
      i += 1
    }
    v
  }

  /** Decode a whole FLAC stream to the same integer fold as
    * [[Multimodal.decodePcm]]: (channels, rate, n, peak, sumAbs,
    * sumSq, zeroCrossings) — n counts interleaved samples and the
    * fold runs over the interleaved stream, exactly the order the
    * spec's own sample MD5 covers. None = decline (quarantine). */
  def decodeFlac(b: Array[Byte]): Option[Multimodal.PcmStats] =
    try {
      if (b.length < 42 || b(0) != 'f' || b(1) != 'L' || b(2) != 'a' ||
        b(3) != 'C') return None
      // metadata blocks: need STREAMINFO (must be first per spec)
      var off = 4
      var last = false
      var rate = -1
      var bps = -1
      var channels = -1
      var first = true
      var headerMd5: Array[Byte] = null
      while (!last) {
        if (off + 4 > b.length) return None
        val h = b(off) & 0xff
        last = (h & 0x80) != 0
        val typ = h & 0x7f
        val len = ((b(off + 1) & 0xff) << 16) | ((b(off + 2) & 0xff) << 8) |
          (b(off + 3) & 0xff)
        if (off + 4 + len > b.length) return None
        if (first) {
          if (typ != 0 || len != 34) return None // STREAMINFO must lead
          val r = new BitReader(b)
          r.seekByte(off + 4)
          r.readBits(16); r.readBits(16) // min/max block size
          r.readBits(24); r.readBits(24) // min/max frame size
          rate = r.readBits(20).toInt
          channels = r.readBits(3).toInt + 1
          bps = r.readBits(5).toInt + 1
          // 36-bit total samples then the 16-byte MD5 of the decoded
          // sample stream (the spec's own end-to-end integrity field —
          // frame CRCs cover frame BYTES, this covers the SAMPLES);
          // all-zero = unknown per spec, then not verified
          headerMd5 = java.util.Arrays.copyOfRange(b,
            off + 4 + 18, off + 4 + 34)
          first = false
        }
        off += 4 + len
      }
      // scope: mono or stereo, 16-bit
      if (rate <= 0 || channels < 1 || channels > 2 || bps != 16) return None
      var peak = 0L; var sumAbs = 0L; var sumSq = 0L; var zc = 0L
      var n = 0L
      var prevNeg = false
      val sampleMd = java.security.MessageDigest.getInstance("MD5")
      @inline def emit(s: Int): Unit = {
        val a = math.abs(s.toLong)
        if (a > peak) peak = a
        sumAbs += a
        sumSq += s.toLong * s.toLong
        val neg = s < 0
        if (n > 0 && neg != prevNeg) zc += 1
        prevNeg = neg
        n += 1
        // spec MD5 input: the unencoded samples, 16-bit little-endian
        sampleMd.update((s & 0xff).toByte)
        sampleMd.update(((s >> 8) & 0xff).toByte)
      }
      val r = new BitReader(b)
      r.seekByte(off)
      // declines from nested subframe parsing surface as this throw —
      // caught by the outer NonFatal handler, same None as a `return`
      def decline(): Nothing = throw new IllegalStateException("decline")
      // Rice residual partitions shared by FIXED and LPC: fills
      // s(order..) where each sample is predict(s, i) + residual
      def readResidual(s: Array[Int], order: Int)(
          predict: (Array[Int], Int) => Long): Unit = {
        val blockSize = s.length
        val method = r.readBits(2).toInt
        if (method > 1) decline()
        val pBits = if (method == 0) 4 else 5
        val escape = if (method == 0) 0xf else 0x1f
        val partOrder = r.readBits(4).toInt
        val nParts = 1 << partOrder
        if (blockSize % nParts != 0) decline()
        var i = order
        var part = 0
        while (part < nParts) {
          val k = r.readBits(pBits).toInt
          val cnt = (blockSize >> partOrder) -
            (if (part == 0) order else 0)
          if (cnt < 0) decline()
          if (k == escape) {
            // ESCAPED partition (pure integer per spec): 5-bit width n,
            // then cnt residuals as n-bit signed verbatim (n = 0 means
            // every residual in the partition is zero)
            val n = r.readBits(5).toInt
            var j = 0
            while (j < cnt) {
              val res = if (n == 0) 0 else r.readSigned(n)
              s(i) = (predict(s, i) + res).toInt
              i += 1
              j += 1
            }
          } else {
            var j = 0
            while (j < cnt) {
              val q = r.readUnary()
              val rem = if (k > 0) r.readBits(k) else 0L
              val res = zigzagDecode((q.toLong << k) | rem)
              s(i) = (predict(s, i) + res).toInt
              i += 1
              j += 1
            }
          }
          part += 1
        }
      }
      // one subframe at the given bit depth (bps, or bps+1 for a side
      // channel); wasted-bits shift applied here, BEFORE any stereo
      // reconstruction, per spec
      def readSubframe(sfBps: Int, blockSize: Int): Array[Int] = {
        if (r.readBits(1) != 0L) decline() // subframe padding bit
        val sfType = r.readBits(6).toInt
        var wasted = 0
        if (r.readBits(1) == 1L) wasted = r.readUnary() + 1
        val eff = sfBps - wasted
        if (eff <= 0) decline()
        val s = new Array[Int](blockSize)
        if (sfType == 0) { // CONSTANT
          java.util.Arrays.fill(s, r.readSigned(eff))
        } else if (sfType == 1) { // VERBATIM
          var i = 0
          while (i < blockSize) { s(i) = r.readSigned(eff); i += 1 }
        } else if (sfType >= 8 && sfType <= 12) { // FIXED order 0..4
          val order = sfType - 8
          if (order > blockSize) decline()
          var i = 0
          while (i < order) { s(i) = r.readSigned(eff); i += 1 }
          readResidual(s, order)((arr, j) => fixedPredict(order, arr, j).toLong)
        } else if (sfType >= 32) { // LPC order 1..32
          val order = sfType - 31
          if (order > blockSize) decline()
          var i = 0
          while (i < order) { s(i) = r.readSigned(eff); i += 1 }
          val precM1 = r.readBits(4).toInt
          if (precM1 == 0xf) decline() // escaped precision: invalid per spec
          val prec = precM1 + 1
          val shift = {
            val v = r.readBits(5) // 5-bit signed two's complement
            (v << 59 >> 59).toInt
          }
          // a negative shift is spec-legal but produced by no known
          // encoder; out of the verified envelope -> decline
          if (shift < 0) decline()
          val coefs = new Array[Int](order)
          i = 0
          while (i < order) { coefs(i) = r.readSigned(prec); i += 1 }
          readResidual(s, order) { (arr, j) =>
            var acc = 0L
            var c = 0
            while (c < order) { acc += coefs(c).toLong * arr(j - 1 - c); c += 1 }
            acc >> shift
          }
        } else decline() // reserved types
        if (wasted > 0) {
          var i = 0
          while (i < blockSize) { s(i) = s(i) << wasted; i += 1 }
        }
        s
      }
      while (r.remainingBits >= 16) {
        val frameStart = r.bytePos
        // frame header: 14-bit sync + reserved + blocking strategy
        if (r.readBits(14) != 0x3ffe) return None
        r.readBits(1) // reserved
        r.readBits(1) // blocking strategy (both handled: coded number below)
        val bsBits = r.readBits(4).toInt
        val srBits = r.readBits(4).toInt
        val chanAsg = r.readBits(4).toInt
        val ssBits = r.readBits(3).toInt
        if (r.readBits(1) != 0L) return None // reserved bit must be 0
        // channel assignment must agree with STREAMINFO: mono streams
        // code 0; stereo streams code independent (1) or a
        // decorrelated pair (8 left/side, 9 right/side, 10 mid/side)
        if (channels == 1 && chanAsg != 0) return None
        if (channels == 2 && chanAsg != 1 && (chanAsg < 8 || chanAsg > 10))
          return None
        if (ssBits != 0x4) return None       // scope: 16-bit (code 100)
        if (readCodedNumber(r) < 0L) return None
        val blockSize = bsBits match {
          case 0x1 => 192
          case v if v >= 0x2 && v <= 0x5 => 576 << (v - 2)
          case 0x6 => r.readBits(8).toInt + 1
          case 0x7 => r.readBits(16).toInt + 1
          case v if v >= 0x8 => 256 << (v - 8)
          case _ => return None
        }
        srBits match {
          case 0x0 => // from STREAMINFO
          case 0xc => r.readBits(8)  // kHz value follows — ignore, use streaminfo
          case 0xd | 0xe => r.readBits(16)
          case 0xf => return None
          case _ => // table-coded rate: header-only, streaminfo governs
        }
        if (r.bytePos >= b.length) return None
        val hcrc = r.readBits(8).toInt
        if (crc8(b, frameStart, r.bytePos - 1) != hcrc) return None
        if (channels == 1) {
          val s = readSubframe(16, blockSize)
          r.alignByte()
          val fcrc = r.readBits(16).toInt
          if (crc16(b, frameStart, r.bytePos - 2) != fcrc) return None
          var i = 0
          while (i < blockSize) { emit(s(i)); i += 1 }
        } else {
          // side subframes carry one extra bit per spec (the
          // difference of two n-bit signals needs n+1 bits)
          val (bps0, bps1) = chanAsg match {
            case 1  => (16, 16) // independent L, R
            case 8  => (16, 17) // left, side
            case 9  => (17, 16) // side, right
            case _  => (16, 17) // mid, side
          }
          val c0 = readSubframe(bps0, blockSize)
          val c1 = readSubframe(bps1, blockSize)
          r.alignByte()
          val fcrc = r.readBits(16).toInt
          if (crc16(b, frameStart, r.bytePos - 2) != fcrc) return None
          var i = 0
          while (i < blockSize) {
            val (l, rr) = chanAsg match {
              case 1 => (c0(i), c1(i))
              case 8 => (c0(i), c0(i) - c1(i))         // R = L - side
              case 9 => (c1(i) + c0(i), c1(i))         // L = R + side
              case _ =>                                 // mid/side
                // mid lost side's low bit: restore it, then halve
                val m = (c0(i) << 1) | (c1(i) & 1)
                ((m + c1(i)) >> 1, (m - c1(i)) >> 1)
            }
            emit(l); emit(rr) // interleaved, as the spec's MD5 is
            i += 1
          }
        }
      }
      // frames are byte-aligned and the loop needs >= 16 bits for a
      // sync code, so a clean stream ends with exactly 0 bits left;
      // ANY remainder is trailing garbage -> decline (a single stray
      // byte would otherwise decode as 'ok', looser than the strict
      // decline-on-anything-out-of-envelope contract)
      if (r.remainingBits > 0) return None
      if (n == 0) return None
      // verify the stream-level sample MD5 when STREAMINFO carries one
      // (all-zero = unknown per spec): this is the integrity tier the
      // frame CRCs cannot give — it spans frames and covers the
      // DECODED samples, so a decoder bug that produces plausible but
      // wrong samples also fails here
      if (headerMd5 != null && headerMd5.exists(_ != 0) &&
        !java.util.Arrays.equals(sampleMd.digest(), headerMd5)) return None
      Some(Multimodal.PcmStats(channels, rate, n, peak, sumAbs, sumSq, zc))
    } catch { case scala.util.control.NonFatal(_) => None }

  // ---- fixture synthesis ----------------------------------------------

  /** Deterministic per-frame sample generator — the replayable formula
    * contract both the muxer and the verify-time oracle walk. Frame
    * type cycles CONSTANT / VERBATIM / FIXED-1 / FIXED-2:
    *   f%4 == 0: s_i = C(f)            (constant)
    *   f%4 == 1: s_i = V(f, i)          (verbatim, full int16 range)
    *   f%4 == 2: s_i = s_{i-1} + d(f,i) (order-1 recurrence, |d|<=32)
    *   f%4 == 3: bounded direct signal  (order-2 residuals stay small)
    */
  def synthSamples(frame: Int, blockSize: Int, seed: Long): Array[Int] = {
    val s = new Array[Int](blockSize)
    (frame % 4) match {
      case 0 =>
        val c = (((seed * 131 + frame * 257) % 65536 + 65536) % 65536)
          .toInt - 32768
        java.util.Arrays.fill(s, c)
      case 1 =>
        var i = 0
        while (i < blockSize) {
          s(i) = (((seed * 31 + frame * 17 + i * 7) % 65536 + 65536)
            % 65536).toInt - 32768
          i += 1
        }
      case 2 =>
        s(0) = (((seed * 241 + frame * 37) % 16384 + 16384) % 16384)
          .toInt - 8192
        var i = 1
        while (i < blockSize) {
          val d = (((seed * 13 + frame * 7 + i * 11) % 64 + 64) % 64)
            .toInt - 32
          s(i) = s(i - 1) + d
          i += 1
        }
      case _ =>
        var i = 0
        while (i < blockSize) {
          s(i) = (((seed * 29 + frame * 23 + i * 5) % 256 + 256) % 256)
            .toInt - 128
          i += 1
        }
    }
    s
  }

  /** Encoder-side Rice parameter rule: bit length of the mean zigzag
    * residual, clamped to [1, 14] — deterministic, decoder reads it
    * from the stream so the rule is muxer-internal. */
  private def riceParam(res: Seq[Int]): Int = {
    if (res.isEmpty) return 1
    val meanZ = res.iterator.map { v =>
      if (v >= 0) 2L * v else -2L * v - 1L
    }.sum / res.length
    val k = 64 - java.lang.Long.numberOfLeadingZeros(meanZ + 1)
    math.max(1, math.min(14, k.toInt))
  }

  /** Rice residual coding shared by both fixture muxers: method 0
    * (4-bit params), partition order 1 (2 partitions), param per
    * partition from [[riceParam]] — or, with `escaped = true`, both
    * partitions written as spec ESCAPED partitions (escape code, 5-bit
    * width, n-bit signed verbatim residuals). blockSize must be
    * even. */
  private def writeRicePartitions(w: BitWriter, res: Seq[Int],
      blockSize: Int, order: Int, escaped: Boolean = false): Unit = {
    w.writeBits(0L, 2) // rice method 0 (4-bit params)
    w.writeBits(1L, 4) // partition order 1 -> 2 partitions
    val half = blockSize / 2
    val p1 = res.take(half - order)
    val p2 = res.drop(half - order)
    for (part <- Seq(p1, p2)) {
      if (escaped) {
        // smallest signed width holding every residual (0 iff all zero)
        val n = part.foldLeft(0) { (acc, v) =>
          var b = 1
          while (v < -(1L << (b - 1)) || v > (1L << (b - 1)) - 1) b += 1
          math.max(acc, if (v == 0) 0 else b)
        }
        require(n <= 31, s"escaped-partition width $n exceeds the 5-bit field")
        w.writeBits(0xfL, 4) // escape code
        w.writeBits(n.toLong, 5)
        if (n > 0) part.foreach(v => w.writeBits(v.toLong & ((1L << n) - 1), n))
      } else {
        val k = riceParam(part)
        w.writeBits(k.toLong, 4)
        part.foreach { v =>
          val z = if (v >= 0) 2L * v else -2L * v - 1L
          w.writeUnary((z >>> k).toInt)
          if (k > 0) w.writeBits(z & ((1L << k) - 1), k)
        }
      }
    }
  }

  /** Spec-layout mono 16-bit FLAC stream: STREAMINFO + `nFrames`
    * frames of `blockSize` samples from [[synthSamples]], subframe
    * type by frame index (constant / verbatim / fixed-1 / fixed-2 with
    * 2 Rice partitions), real CRC-8/CRC-16. blockSize must be even and
    * <= 256 (8-bit block size coding, partition order 1). */
  def synthFlac(nFrames: Int, blockSize: Int, sampleRate: Int,
      seed: Long): Array[Byte] = {
    require(nFrames >= 1 && blockSize >= 8 && blockSize <= 256 &&
      blockSize % 2 == 0 && sampleRate > 0 && sampleRate < (1 << 20))
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    out ++= "fLaC".getBytes("US-ASCII")
    // spec MD5 of the unencoded sample stream (16-bit LE), written
    // into STREAMINFO so the decoder's stream-level verify is real
    val md = java.security.MessageDigest.getInstance("MD5")
    for (f <- 0 until nFrames; s <- synthSamples(f, blockSize, seed)) {
      md.update((s & 0xff).toByte); md.update(((s >> 8) & 0xff).toByte)
    }
    val sampleMd5 = md.digest()
    // STREAMINFO (last metadata block): 34 bytes
    val si = new BitWriter
    si.writeBits(blockSize.toLong, 16)      // min block size
    si.writeBits(blockSize.toLong, 16)      // max block size
    si.writeBits(0L, 24); si.writeBits(0L, 24) // min/max frame size unknown
    si.writeBits(sampleRate.toLong, 20)
    si.writeBits(0L, 3)                     // channels - 1
    si.writeBits(15L, 5)                    // bps - 1
    si.writeBits(nFrames.toLong * blockSize, 36)
    var i = 0
    while (i < 16) { si.writeBits(sampleMd5(i).toLong & 0xff, 8); i += 1 }
    val siBytes = si.toBytes
    out += 0x80.toByte // last-block flag, type 0
    out += 0; out += 0; out += 34
    out ++= siBytes
    var f = 0
    while (f < nFrames) {
      val s = synthSamples(f, blockSize, seed)
      val w = new BitWriter
      w.writeBits(0x3ffe, 14) // sync
      w.writeBits(0L, 1)      // reserved
      w.writeBits(0L, 1)      // fixed block size strategy
      w.writeBits(0x6, 4)     // block size: 8-bit value at header end
      w.writeBits(0x0, 4)     // sample rate: from STREAMINFO
      w.writeBits(0x0, 4)     // channel assignment: mono
      w.writeBits(0x4, 3)     // sample size: 16-bit
      w.writeBits(0L, 1)      // reserved
      require(f < 128, "coded frame number kept single-byte")
      w.writeBits(f.toLong, 8)            // UTF-8 frame number (< 0x80)
      w.writeBits(blockSize - 1L, 8)      // 8-bit block size - 1
      val headerBytes = w.toBytesNoAlign()
      w.writeBits(crc8(headerBytes, 0, headerBytes.length).toLong, 8)
      // subframe
      (f % 4) match {
        case 0 =>
          w.writeBits(0L, 1); w.writeBits(0L, 6); w.writeBits(0L, 1)
          w.writeBits(s(0).toLong & 0xffff, 16)
        case 1 =>
          w.writeBits(0L, 1); w.writeBits(1L, 6); w.writeBits(0L, 1)
          var j = 0
          while (j < blockSize) {
            w.writeBits(s(j).toLong & 0xffff, 16); j += 1
          }
        case tf =>
          val order = if (tf == 2) 1 else 2
          w.writeBits(0L, 1); w.writeBits(8L + order, 6); w.writeBits(0L, 1)
          var j = 0
          while (j < order) {
            w.writeBits(s(j).toLong & 0xffff, 16); j += 1
          }
          val res = (order until blockSize).map { k =>
            s(k) - (order match {
              case 1 => s(k - 1)
              case _ => 2 * s(k - 1) - s(k - 2)
            })
          }
          writeRicePartitions(w, res, blockSize, order)
      }
      w.alignByte()
      val frameBytes = w.toBytesNoAlign()
      w.writeBits(crc16(frameBytes, 0, frameBytes.length).toLong, 16)
      out ++= w.toBytesNoAlign()
      f += 1
    }
    out.toArray
  }

  /** Deterministic stereo sample formulas for the LPC fixture — the
    * replayable contract the muxer, the spec replay, and the
    * verify-time oracle all walk. Bounded random walks (|step| <= 31
    * from ±8191 starts), so |L|,|R| < 16384 for blockSize <= 256 and
    * the side channel fits 17 bits with margin:
    *   L(0) = ((seed*241 + f*37) mod 16384) - 8192
    *   L(i) = L(i-1) + ((seed*13 + f*7 + i*11) mod 64) - 32
    *   R(0) = ((seed*199 + f*53) mod 16384) - 8192
    *   R(i) = R(i-1) + ((seed*17 + f*29 + i*5) mod 64) - 32
    */
  def synthStereoSamples(frame: Int, blockSize: Int,
      seed: Long): (Array[Int], Array[Int]) = {
    @inline def m(v: Long, mod: Long) = (((v % mod) + mod) % mod).toInt
    val l = new Array[Int](blockSize)
    val r = new Array[Int](blockSize)
    l(0) = m(seed * 241 + frame * 37, 16384) - 8192
    r(0) = m(seed * 199 + frame * 53, 16384) - 8192
    var i = 1
    while (i < blockSize) {
      l(i) = l(i - 1) + m(seed * 13 + frame * 7 + i * 11, 64) - 32
      r(i) = r(i - 1) + m(seed * 17 + frame * 29 + i * 5, 64) - 32
      i += 1
    }
    (l, r)
  }

  /** One quantized-coefficient LPC subframe: warmup at the subframe
    * bit depth, 4-bit precision-1, 5-bit shift, `prec`-bit signed
    * coefficients, then the shared Rice partitions. Residual rule is
    * the decoder's own in reverse:
    * res(i) = s(i) - ((Σ coef(c)·s(i-1-c)) >> shift). */
  private def writeLpcSubframe(w: BitWriter, s: Array[Int], sfBps: Int,
      coefs: Array[Int], shift: Int, prec: Int,
      escaped: Boolean = false): Unit = {
    val order = coefs.length
    w.writeBits(0L, 1)                  // padding bit
    w.writeBits(32L + (order - 1), 6)   // LPC subframe, order coded
    w.writeBits(0L, 1)                  // no wasted bits
    var j = 0
    while (j < order) {
      w.writeBits(s(j).toLong & ((1L << sfBps) - 1), sfBps); j += 1
    }
    w.writeBits((prec - 1).toLong, 4)
    w.writeBits(shift.toLong & 0x1f, 5)
    coefs.foreach(c => w.writeBits(c.toLong & ((1L << prec) - 1), prec))
    val res = (order until s.length).map { i =>
      var acc = 0L
      var c = 0
      while (c < order) { acc += coefs(c).toLong * s(i - 1 - c); c += 1 }
      s(i) - (acc >> shift).toInt
    }
    writeRicePartitions(w, res, s.length, order, escaped)
  }

  /** LPC coefficient sets the stereo fixture cycles (order 2 on even
    * frames, order 3 on odd): genuinely quantized predictors — neither
    * reduces to a FIXED recurrence — exercising the coefficient read,
    * the Long accumulator, and the shift. */
  private[multimodal] val LpcConfigs: Array[(Array[Int], Int)] = Array(
    (Array(3, -1), 1),    // pred = (3·s1 - s2) >> 1
    (Array(4, -5, 2), 2)) // pred = (4·s1 - 5·s2 + 2·s3) >> 2

  /** Spec-layout STEREO 16-bit FLAC stream exercising the full
    * decoder envelope the mono fixture cannot: every subframe is LPC
    * ([[LpcConfigs]] by frame parity), and the channel assignment
    * cycles INDEPENDENT / LEFT-SIDE / RIGHT-SIDE / MID-SIDE by frame
    * index, with real CRC-8/CRC-16 and the spec MD5 of the
    * interleaved sample stream in STREAMINFO. Samples come from
    * [[synthStereoSamples]]; side subframes encode at 17 bits per
    * spec. blockSize must be even and <= 256. */
  def synthFlacStereoLpc(nFrames: Int, blockSize: Int, sampleRate: Int,
      seed: Long): Array[Byte] = {
    require(nFrames >= 1 && nFrames < 128 && blockSize >= 8 &&
      blockSize <= 256 && blockSize % 2 == 0 && sampleRate > 0 &&
      sampleRate < (1 << 20))
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    out ++= "fLaC".getBytes("US-ASCII")
    val md = java.security.MessageDigest.getInstance("MD5")
    for (f <- 0 until nFrames) {
      val (l, r) = synthStereoSamples(f, blockSize, seed)
      for (i <- 0 until blockSize; s <- Seq(l(i), r(i))) {
        md.update((s & 0xff).toByte); md.update(((s >> 8) & 0xff).toByte)
      }
    }
    val sampleMd5 = md.digest()
    val si = new BitWriter
    si.writeBits(blockSize.toLong, 16)
    si.writeBits(blockSize.toLong, 16)
    si.writeBits(0L, 24); si.writeBits(0L, 24)
    si.writeBits(sampleRate.toLong, 20)
    si.writeBits(1L, 3)  // channels - 1 = 1 (stereo)
    si.writeBits(15L, 5) // bps - 1
    si.writeBits(nFrames.toLong * blockSize, 36)
    var i = 0
    while (i < 16) { si.writeBits(sampleMd5(i).toLong & 0xff, 8); i += 1 }
    out += 0x80.toByte // last-block flag, type 0 (STREAMINFO)
    out += 0; out += 0; out += 34
    out ++= si.toBytes
    var f = 0
    while (f < nFrames) {
      val (l, r) = synthStereoSamples(f, blockSize, seed)
      // channel assignment by frame index; side always fits 17 bits
      val asg = Array(1, 8, 9, 10)(f % 4)
      val side = Array.tabulate(blockSize)(i => l(i) - r(i))
      val mid = Array.tabulate(blockSize)(i => (l(i) + r(i)) >> 1)
      val (c0, bps0, c1, bps1) = asg match {
        case 1 => (l, 16, r, 16)
        case 8 => (l, 16, side, 17)
        case 9 => (side, 17, r, 16)
        case _ => (mid, 16, side, 17)
      }
      val w = new BitWriter
      w.writeBits(0x3ffe, 14)
      w.writeBits(0L, 1)
      w.writeBits(0L, 1)
      w.writeBits(0x6, 4)       // block size: 8-bit value at header end
      w.writeBits(0x0, 4)       // sample rate: from STREAMINFO
      w.writeBits(asg.toLong, 4)
      w.writeBits(0x4, 3)       // sample size: 16-bit
      w.writeBits(0L, 1)
      w.writeBits(f.toLong, 8)  // UTF-8 frame number (< 0x80 by require)
      w.writeBits(blockSize - 1L, 8)
      val headerBytes = w.toBytesNoAlign()
      w.writeBits(crc8(headerBytes, 0, headerBytes.length).toLong, 8)
      val (coefs, shift) = LpcConfigs(f % 2)
      // every third frame codes its residuals as ESCAPED partitions
      // (n-bit signed verbatim), so the fixture walks both branches of
      // the spec's residual coder
      val esc = f % 3 == 2
      writeLpcSubframe(w, c0, bps0, coefs, shift, prec = 5, escaped = esc)
      writeLpcSubframe(w, c1, bps1, coefs, shift, prec = 5, escaped = esc)
      w.alignByte()
      val frameBytes = w.toBytesNoAlign()
      w.writeBits(crc16(frameBytes, 0, frameBytes.length).toLong, 16)
      out ++= w.toBytesNoAlign()
      f += 1
    }
    out.toArray
  }

  /** BitWriter view that snapshots bytes WITHOUT forcing alignment —
    * valid only at byte-aligned positions (enforced: a snapshot with
    * pending sub-byte bits would silently drop them and compute CRCs
    * over the wrong range). */
  implicit private class WriterOps(w: BitWriter) {
    def toBytesNoAlign(): Array[Byte] = {
      require(w.isAligned,
        "toBytesNoAlign at an unaligned bit position — pending bits " +
          "would be dropped from the snapshot")
      val arr = new Array[Byte](w.size)
      var i = 0
      while (i < arr.length) { arr(i) = w.byteAt(i); i += 1 }
      arr
    }
  }
}
