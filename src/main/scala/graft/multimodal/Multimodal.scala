package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import java.security.MessageDigest

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed by partition-batched feature
  * extraction.
  *
  * The Spark-side plumbing is real — schema, encoders, partitioning, and
  * the mapPartitions batch shape (one expensive "codec init" per
  * partition, the same contract as a Pandas-UDF `mapInPandas` batch).
  * The decode path is two-tier: formats the JVM ships a codec for
  * (PNG/BMP/GIF/JPEG via `javax.imageio` — pure JVM, no native deps)
  * decode for REAL (`decodeImage`), and audio/video CONTAINER HEADERS
  * that are pure-JVM-parseable (WAV/RIFF chunk lists, MP4/ISO-BMFF box
  * trees — `decodeWav`/`decodeMp4`) parse for REAL metadata (codec,
  * channels, sample rate, duration, track dimensions) without any
  * native codec. Only bytes in no recognizable format fall back to the
  * clearly-marked deterministic STUB (`decodeStub`), which derives
  * fake-but-stable dimensions from the bytes so the distributed
  * plumbing stays fully testable for every `kind`. Sample-level
  * audio/video decode (PCM frames, video rasters) would still need a
  * codec library this container doesn't ship; swapping one in touches
  * only the decode functions.
  */
object Multimodal {

  /** A media row: opaque bytes + typed metadata. */
  case class MediaRecord(
      id: Long,
      kind: String,          // "image" | "audio" | "video"
      content: Array[Byte],
      declaredWidth: Int,
      declaredHeight: Int)

  case class MediaFeatures(
      id: Long,
      kind: String,
      nBytes: Int,
      sha256: String,
      width: Int,
      height: Int,
      frames: Int)

  /** STUB decode — deterministic stand-in for formats with no
    * in-container codec (audio/video). Derives stable
    * pseudo-dimensions from content length + first bytes so the
    * distributed plumbing around it is fully testable. */
  def decodeStub(content: Array[Byte]): (Int, Int, Int) = {
    val n = content.length
    val head = if (n > 0) content(0) & 0xff else 0
    (n % 640, (n / 7) % 480, 1 + (head % 30))
  }

  /** REAL decode via `javax.imageio` (pure JVM: PNG/BMP/GIF/JPEG/WBMP
    * readers ship with the JDK). Reads dimensions from the header —
    * `reader.getWidth/getHeight` do NOT rasterize pixels, so probing a
    * 100 MB image costs header bytes, not a decode — and the frame
    * count from the container (animated GIF > 1). Returns None when no
    * registered reader accepts the bytes; callers fall back to
    * [[decodeStub]].
    *
    * Failures are caught as NonFatal, not just IOException: ImageIO
    * readers routinely throw RuntimeExceptions (IllegalArgument,
    * IndexOutOfBounds, NegativeArraySize) on corrupt/truncated bytes
    * whose magic number matched — exactly the adversarial inputs the
    * two-tier fallback exists for, which must degrade to the stub, not
    * kill the task. */
  def decodeImage(content: Array[Byte]): Option[(Int, Int, Int)] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(content))
    if (iis == null) return None
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iis, false, true)
          val w = r.getWidth(0)
          val h = r.getHeight(0)
          val frames =
            try math.max(1, r.getNumImages(true))
            catch { case scala.util.control.NonFatal(_) => 1 }
          Some((w, h, frames))
        } catch { case scala.util.control.NonFatal(_) => None }
        finally r.dispose()
      }
    } finally iis.close()
  }

  /** Parsed audio/video container metadata — the REAL (pure-JVM,
    * header-only) decode tier for media the container ships no codec
    * for. `container` is "wav" | "mp4"; unknown bytes get None from
    * the parsers and "unknown" from the extraction fallback. */
  case class AvMeta(
      id: Long,
      kind: String,
      container: String,
      codec: String,        // WAV: fmt tag; MP4: ftyp major brand
      channels: Int,        // audio only; 0 when n/a
      sampleRate: Int,      // Hz; 0 when n/a
      durationMs: Long,     // -1 when not derivable
      width: Int,           // MP4 tkhd 16.16; 0 for audio
      height: Int,
      tracks: Int,          // MP4 trak count; 1 for WAV
      samples: Int)         // WAV: data/blockAlign (PCM frames);
                            // MP4: Σ stsz sample counts; 0 if absent

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def be32(b: Array[Byte], o: Int): Long =
    (b(o + 3) & 0xffL) | ((b(o + 2) & 0xffL) << 8) |
      ((b(o + 1) & 0xffL) << 16) | ((b(o) & 0xffL) << 24)
  private def be64(b: Array[Byte], o: Int): Long = (be32(b, o) << 32) | be32(b, o + 4)
  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  /** Overflow-safe RIFF chunk advance. Chunk sizes are unsigned
    * 32-bit, so the arithmetic stays in Long: a crafted size >=
    * 0x80000000 would wrap to a negative Int and leave the walker
    * standing still (or moving backwards) — an infinite loop that
    * hangs the executor task and defeats the corrupt-media
    * "degrade, never kill the task" contract. Returns the next
    * offset, or -1 when the advance does not strictly move forward
    * or cannot fit an Int — callers treat -1 as a corrupt record. */
  private def riffNext(off: Int, size: Long): Int = {
    val next = off.toLong + 8L + size + (size & 1L)
    if (next <= off || next > Int.MaxValue) -1 else next.toInt
  }

  /** REAL WAV/RIFF header parse — pure JVM, no codec needed: walks the
    * RIFF chunk list for `fmt ` (format tag, channels, sample rate,
    * byte rate) and `data` (payload size → duration). Header-only:
    * cost is the chunk walk, never the samples. None unless the bytes
    * are a well-formed RIFF/WAVE with a complete fmt chunk. */
  def decodeWav(b: Array[Byte]): Option[AvMeta] =
    try {
      if (b.length < 12 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE")
        return None
      var off = 12
      var fmt: Option[(Int, Int, Long, Long, Int)] = None
      var dataLen = -1L
      while (off + 8 <= b.length) {
        val id = tag(b, off)
        val size = le32(b, off + 4)
        if (id == "fmt " && size >= 16 && off + 24 <= b.length)
          fmt = Some((le16(b, off + 8), le16(b, off + 10),
            le32(b, off + 12), le32(b, off + 16), le16(b, off + 20)))
        else if (id == "data") dataLen = size
        // chunks are word-aligned: odd sizes carry one pad byte
        off = riffNext(off, size)
        if (off < 0) return None // hostile size: refuse, don't loop
      }
      fmt.map { case (fmtTag, ch, sr, byteRate, blockAlign) =>
        val codec = fmtTag match {
          case 1 => "pcm"
          case 3 => "ieee_float"
          case 6 => "alaw"
          case 7 => "mulaw"
          case t => s"fmt_$t"
        }
        val durMs =
          if (byteRate > 0 && dataLen >= 0) dataLen * 1000L / byteRate else -1L
        val samples =
          if (blockAlign > 0 && dataLen >= 0) (dataLen / blockAlign).toInt else 0
        AvMeta(0L, "audio", "wav", codec, ch, sr.toInt, durMs, 0, 0, 1, samples)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** REAL MP4/ISO-BMFF box parse — pure JVM: top-level box walk
    * requires an `ftyp` (major brand → codec field), then `moov` is
    * walked for `mvhd` (timescale + duration → durationMs), the `trak`
    * count, and each track's `tkhd` 16.16 fixed-point width/height
    * (the video track carries the nonzero ones). Handles 64-bit
    * largesize boxes. Header-only — `mdat` is skipped by size. */
  def decodeMp4(b: Array[Byte]): Option[AvMeta] =
    try {
      // walk one box level: returns (type, payloadStart, payloadEnd)
      def boxes(from: Int, until: Int): Iterator[(String, Int, Int)] =
        new Iterator[(String, Int, Int)] {
          private var off = from
          def hasNext: Boolean = off + 8 <= until
          def next(): (String, Int, Int) = {
            val size32 = be32(b, off)
            val t = tag(b, off + 4)
            val (payload, end) =
              if (size32 == 1 && off + 16 <= until)
                (off + 16, off + be64(b, off + 8))
              else if (size32 == 0) (off + 8, until.toLong) // to end of file
              else (off + 8, off + size32)
            val e = math.min(math.max(end, payload), until.toLong).toInt
            off = math.max(e, payload) // always advance
            (t, payload, e)
          }
        }
      val top = boxes(0, b.length).toSeq
      if (!top.exists(_._1 == "ftyp")) return None
      val brand = top.find(_._1 == "ftyp")
        .filter { case (_, p, e) => e - p >= 4 }
        .map { case (_, p, _) => tag(b, p).trim }
        .getOrElse("")
      val moov = top.find(_._1 == "moov").getOrElse(return None)
      var durMs = -1L
      var w = 0; var h = 0; var tracks = 0; var samples = 0L
      // descend one named level: the child boxes of the first `t` box
      def child(p: Int, e: Int, t: String): Option[(Int, Int)] =
        boxes(p, e).collectFirst { case (`t`, cp, ce) => (cp, ce) }
      boxes(moov._2, moov._3).foreach {
        case ("mvhd", p, e) if e - p >= 20 =>
          val v = b(p) & 0xff
          val (ts, dur) =
            if (v == 1 && e - p >= 32) (be32(b, p + 20), be64(b, p + 24))
            else (be32(b, p + 12), be32(b, p + 16))
          if (ts > 0) durMs = dur * 1000L / ts
        case ("trak", p, e) =>
          tracks += 1
          boxes(p, e).foreach {
            case ("tkhd", tp, te) =>
              val v = b(tp) & 0xff
              val dimOff = if (v == 1) 88 else 76 // matrix end, per spec
              if (te - tp >= dimOff + 8) {
                val tw = (be32(b, tp + dimOff) >> 16).toInt
                val th = (be32(b, tp + dimOff + 4) >> 16).toInt
                if (tw > 0 && th > 0) { w = math.max(w, tw); h = math.max(h, th) }
              }
            case ("mdia", mp, me) =>
              // sample table: mdia/minf/stbl/stsz carries the track's
              // sample COUNT at payload offset 8 (after version/flags
              // and the fixed-size field) — the real frame count
              for {
                (ip, ie) <- child(mp, me, "minf")
                (sp, se) <- child(ip, ie, "stbl")
                (zp, ze) <- child(sp, se, "stsz")
                if ze - zp >= 12
              } samples += be32(b, zp + 8)
            case _ =>
          }
        case _ =>
      }
      Some(AvMeta(0L, if (w > 0) "video" else "audio", "mp4", brand,
        0, 0, durMs, w, h, tracks,
        math.min(samples, Int.MaxValue.toLong).toInt))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Audio/video container parse: WAV then MP4, None for neither. */
  def decodeAv(content: Array[Byte]): Option[AvMeta] =
    decodeWav(content).orElse(decodeMp4(content))

  /** MP3 stream metadata from a frame-header walk. */
  case class Mp3Meta(
      bitrateKbps: Int,     // first frame's bitrate; see cbr
      sampleRate: Int,      // Hz, constant across the stream (enforced)
      nFrames: Int,
      cbr: Boolean,         // every frame carries the same bitrate
      durationMs: Long)     // nFrames * 1152 samples / sampleRate

  private val Mp3Bitrates = // MPEG-1 Layer III, kbit/s; 0=free, 15=bad
    Array(-1, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
      320, -1)
  private val Mp3Rates = Array(44100, 48000, 32000, -1)

  /** REAL MP3 frame-HEADER walk — the metadata tier a curation
    * pipeline needs (codec check, duration, CBR/VBR, frame count)
    * without a sample decoder: MPEG-1 Layer III framing is public-spec
    * arithmetic (11-bit sync, 4-bit bitrate index + 2-bit samplerate
    * index through the standard tables, frame length = 144000·bitrate/
    * rate + padding), so frames are walked exactly, never scanned. A
    * leading ID3v2 tag is skipped by its syncsafe size. STRICT, like
    * every parser here: a desync, reserved/free bitrate index, rate
    * change mid-stream, or trailing garbage declines the whole clip
    * (quarantine routing, not silent truncation). Sample-level MP3
    * decode (Huffman + IMDCT + synthesis filterbank) stays out of
    * scope in a bare JVM — COVERAGE.md records the decision; this
    * walk is the part of the format a 100 TB ingest actually gates
    * on. */
  def decodeMp3Meta(b: Array[Byte]): Option[Mp3Meta] =
    try {
      var off = 0
      if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
        val size = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
          ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
        // ID3v2.4 footer flag (flags byte bit 4): the syncsafe size
        // covers the tag body only — a footer adds 10 trailing bytes
        // the walk must also skip or it desyncs on a spec-valid tag
        val footer = if ((b(5) & 0x10) != 0) 10 else 0
        off = 10 + size + footer
      }
      var n = 0
      var sr = -1
      var firstBr = -1
      var cbr = true
      while (off + 4 <= b.length) {
        val h = ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
          ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
        if ((h >>> 21) != 0x7ff) return None // desync: corrupt stream
        val version = (h >>> 19) & 3
        val layer = (h >>> 17) & 3
        if (version != 3 || layer != 1) return None // MPEG-1 Layer III only
        val br = Mp3Bitrates((h >>> 12) & 0xf)
        val rate = Mp3Rates((h >>> 10) & 3)
        val pad = (h >>> 9) & 1
        if (br <= 0 || rate <= 0) return None // free/reserved: decline
        if (sr < 0) sr = rate else if (sr != rate) return None
        if (firstBr < 0) firstBr = br else if (firstBr != br) cbr = false
        val flen = 144000 * br / rate + pad
        if (flen <= 4) return None
        off += flen
        n += 1
      }
      if (n == 0 || off != b.length) None // trailing garbage: decline
      else Some(Mp3Meta(firstBr, sr, n, cbr, n * 1152L * 1000L / sr))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Deterministic REAL-framing MP3 fixture: `nFrames` MPEG-1 Layer
    * III frames with correct sync/index headers and spec-exact frame
    * lengths (zero main-data payload — [[decodeMp3Meta]] never reads
    * it), optionally behind an ID3v2 tag. bitrateKbps and sampleRate
    * must be table values. */
  def synthMp3Frames(nFrames: Int, bitrateKbps: Int, sampleRate: Int,
      id3Bytes: Int = 0, id3Footer: Boolean = false): Array[Byte] = {
    val bi = Mp3Bitrates.indexOf(bitrateKbps)
    val si = Mp3Rates.indexOf(sampleRate)
    require(bi > 0 && bi < 15, s"not an MPEG-1 L3 bitrate: $bitrateKbps")
    require(si >= 0 && si < 3, s"not an MPEG-1 rate: $sampleRate")
    require(nFrames >= 1)
    require(!id3Footer || id3Bytes > 0, "a footer needs a tag")
    val flen = 144000 * bitrateKbps / sampleRate
    val tag =
      if (id3Bytes <= 0) Array.emptyByteArray
      else {
        // ID3v2.4: 10-byte header, syncsafe body size, optional 10-byte
        // footer ("3DI" + version + flags + size copy) NOT counted in
        // the size field — exactly the spec corner decodeMp3Meta skips
        val t = new Array[Byte](10 + id3Bytes + (if (id3Footer) 10 else 0))
        t(0) = 'I'; t(1) = 'D'; t(2) = '3'; t(3) = 4
        if (id3Footer) t(5) = 0x10
        t(6) = ((id3Bytes >> 21) & 0x7f).toByte
        t(7) = ((id3Bytes >> 14) & 0x7f).toByte
        t(8) = ((id3Bytes >> 7) & 0x7f).toByte
        t(9) = (id3Bytes & 0x7f).toByte
        if (id3Footer) {
          val o = 10 + id3Bytes
          t(o) = '3'; t(o + 1) = 'D'; t(o + 2) = 'I'; t(o + 3) = 4
          t(o + 5) = 0x10
          System.arraycopy(t, 6, t, o + 6, 4)
        }
        t
      }
    val out = new Array[Byte](tag.length + nFrames * flen)
    System.arraycopy(tag, 0, out, 0, tag.length)
    var f = 0
    while (f < nFrames) {
      val o = tag.length + f * flen
      out(o) = 0xff.toByte
      out(o + 1) = 0xfb.toByte // sync + MPEG-1 + Layer III + no CRC
      out(o + 2) = ((bi << 4) | (si << 2)).toByte // no padding
      out(o + 3) = 0xc0.toByte // mono
      f += 1
    }
    out
  }

  /** Deterministic REAL-format fixture: a canonical 44-byte PCM
    * WAV/RIFF header plus `dataLen` zero payload bytes. Parsing it
    * with [[decodeWav]] recovers exactly the parameters — which is
    * what makes the parser oracle-checkable end-to-end (the oracle
    * recomputes the expected metadata arithmetically). */
  /** Integer stats over a decoded PCM sample stream — the audio
    * features a quality/filtering pipeline computes per clip
    * (loudness via sum|s| and Σs², clipping via peak, spectral
    * content proxy via zero-crossing rate). All-integer so results
    * are bit-identical on any engine. */
  case class PcmStats(
      channels: Int,
      sampleRate: Int,
      nSamples: Long,        // interleaved int16 samples in the data chunk
      peak: Long,            // max |s|
      sumAbs: Long,          // Σ |s|
      sumSq: Long,           // Σ s²  (energy; RMS² · n)
      zeroCrossings: Long)   // #(i>0) where sign(s[i-1]) != sign(s[i])

  /** Locate the raw int16 sample stream of a PCM-16 WAV: walks the
    * RIFF chunks, requires fmt PCM 16-bit with an in-bounds data
    * chunk. Returns (channels, sampleRate, dataOffset, nSamples)
    * where nSamples counts interleaved int16 words. The shared
    * header walk under [[decodePcm]] and [[pcmWindowStats]]. */
  private def pcm16(b: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    if (b.length < 12 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE")
      return None
    var off = 12
    var fmt: Option[(Int, Int, Int)] = None // (fmtTag, channels, rate)
    var bits = 0
    var dataOff = -1
    var dataLen = -1
    while (off + 8 <= b.length) {
      val id = tag(b, off)
      val size = le32(b, off + 4)
      if (id == "fmt " && size >= 16 && off + 24 <= b.length) {
        fmt = Some((le16(b, off + 8), le16(b, off + 10),
          le32(b, off + 12).toInt))
        bits = le16(b, off + 22)
      } else if (id == "data" && size <= Int.MaxValue) {
        dataOff = off + 8; dataLen = size.toInt
      }
      off = riffNext(off, size)
      if (off < 0) return None // hostile size: refuse, don't loop
    }
    fmt match {
      case Some((1, ch, rate)) if bits == 16 && dataOff >= 0 &&
          dataLen >= 0 && dataOff + dataLen <= b.length =>
        Some((ch, rate, dataOff, dataLen / 2))
      case _ => None
    }
  }

  /** The i-th interleaved int16 sample (little-endian). */
  @inline private def sample16(b: Array[Byte], dataOff: Int, i: Int): Long = {
    val o = dataOff + i * 2
    ((b(o) & 0xff) | (b(o + 1) << 8)).toShort.toLong
  }

  /** REAL sample-level PCM decode — WAV carries its samples as raw
    * little-endian int16 words, so "decoding" audio in the most
    * common interchange format needs no codec library at all: walk
    * the RIFF chunks, require fmt PCM 16-bit, then read every int16
    * in the data chunk and fold the integer stats in one pass.
    * Returns None for non-WAV / non-PCM-16 / truncated bytes (the
    * caller's two-tier contract: real decode where the format allows,
    * stub elsewhere). Sign convention for crossings: negative vs
    * non-negative (s=0 counts as positive side). */
  def decodePcm(b: Array[Byte]): Option[PcmStats] =
    try pcm16(b).map { case (ch, rate, dataOff, n) =>
      var peak = 0L; var sumAbs = 0L; var sumSq = 0L; var zc = 0L
      var prevNeg = false
      var i = 0
      while (i < n) {
        val s = sample16(b, dataOff, i)
        val a = math.abs(s)
        if (a > peak) peak = a
        sumAbs += a
        sumSq += s * s
        val neg = s < 0
        if (i > 0 && neg != prevNeg) zc += 1
        prevNeg = neg
        i += 1
      }
      PcmStats(ch, rate, n.toLong, peak, sumAbs, sumSq, zc)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Per-window integer stats over a PCM-16 stream — the
    * silence-detection / voice-activity shape of audio filtering:
    * fixed windows of `win` interleaved samples (last window may be
    * short), a window is silent when its peak |s| is below
    * `silenceThreshold`. All-integer, single pass. */
  case class PcmWindowStats(
      channels: Int,
      sampleRate: Int,
      nWindows: Int,
      silentWindows: Int,
      maxWinSumAbs: Long,    // loudest window's Σ|s|
      peak: Long)            // global max |s|

  /** Windowed REAL PCM decode for silence detection: same RIFF/PCM-16
    * walk as [[decodePcm]], folding per-window peak and Σ|s| instead
    * of whole-clip stats. */
  def pcmWindowStats(b: Array[Byte], win: Int,
      silenceThreshold: Int): Option[PcmWindowStats] =
    try {
      require(win >= 1, "win must be >= 1")
      pcm16(b).map { case (ch, rate, dataOff, n) =>
        var nW = 0; var silent = 0; var maxSum = 0L; var gPeak = 0L
        var i = 0
        while (i < n) {
          val end = math.min(i + win, n)
          var wPeak = 0L; var wSum = 0L
          var j = i
          while (j < end) {
            val a = math.abs(sample16(b, dataOff, j))
            if (a > wPeak) wPeak = a
            wSum += a
            j += 1
          }
          nW += 1
          if (wPeak < silenceThreshold) silent += 1
          if (wSum > maxSum) maxSum = wSum
          if (wPeak > gPeak) gPeak = wPeak
          i = end
        }
        PcmWindowStats(ch, rate, nW, silent, maxSum, gPeak)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** IMA-ADPCM step-size table — 89 entries from the public IMA/DVI
    * specification (reproduced in RFC 3551 §4.5.1 and the multimedia
    * wiki); the table IS the codec, so it must be byte-exact. */
  private val ImaStepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544,
    598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707,
    1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871,
    5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  /** Step-index adjustment per 4-bit code (public spec). */
  private val ImaIndexTable: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  /** One IMA-ADPCM predictor step: pure-integer update of
    * (predictor, index) by a 4-bit code — the whole decoder is this
    * arithmetic plus the two tables, exactly replayable anywhere.
    * diff = step/8 + step/4·b0 + step/2·b1 + step·b2, sign bit b3;
    * predictor clamps to int16, index to [0, 88]. */
  @inline private def imaStep(predictor: Int, index: Int,
      code: Int): (Int, Int) = {
    val step = ImaStepTable(index)
    var diff = step >> 3
    if ((code & 1) != 0) diff += step >> 2
    if ((code & 2) != 0) diff += step >> 1
    if ((code & 4) != 0) diff += step
    val p0 = if ((code & 8) != 0) predictor - diff else predictor + diff
    val p = math.max(-32768, math.min(32767, p0))
    val i0 = index + ImaIndexTable(code)
    (p, math.max(0, math.min(88, i0)))
  }

  /** REAL sample-level decode of a COMPRESSED audio format — IMA-ADPCM
    * WAV (fmt tag 0x11), the 4-bits-per-sample predictive codec whose
    * decoder is pure public-spec integer arithmetic (no codec library,
    * unlike MP3/AAC whose sample decode stays out of scope): walk the
    * RIFF chunks, require fmt 0x11 / 4-bit / MONO with block-aligned
    * data, then decode every block — 4-byte header carrying the block's
    * initial (predictor int16-LE, step index uint8, reserved 0) with
    * the predictor emitted as the block's first sample, followed by
    * nibble codes (LOW nibble first) each stepping [[imaStep]] — and
    * fold the same integer stats as [[decodePcm]]. STRICT, like every
    * parser here: stereo, a step index > 88, a nonzero reserved byte,
    * or a data chunk that is not a whole number of blocks declines the
    * clip (quarantine routing, not silent truncation). Linear per clip,
    * shuffle-free. */
  def decodeAdpcm(b: Array[Byte]): Option[PcmStats] =
    try {
      if (b.length < 12 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE")
        return None
      var off = 12
      var fmt: Option[(Int, Int, Int, Int)] = None // tag, ch, rate, align
      var bits = 0
      var dataOff = -1
      var dataLen = -1
      while (off + 8 <= b.length) {
        val id = tag(b, off)
        val size = le32(b, off + 4)
        if (id == "fmt " && size >= 16 && off + 24 <= b.length) {
          fmt = Some((le16(b, off + 8), le16(b, off + 10),
            le32(b, off + 12).toInt, le16(b, off + 20)))
          bits = le16(b, off + 22)
        } else if (id == "data" && size <= Int.MaxValue) {
          dataOff = off + 8; dataLen = size.toInt
        }
        off = riffNext(off, size)
        if (off < 0) return None // hostile size: refuse, don't loop
      }
      fmt match {
        case Some((0x11, 1, rate, align)) if bits == 4 && align >= 5 &&
            dataOff >= 0 && dataLen > 0 && dataOff + dataLen <= b.length &&
            dataLen % align == 0 =>
          var peak = 0L; var sumAbs = 0L; var sumSq = 0L; var zc = 0L
          var prevNeg = false
          var n = 0L
          var blk = dataOff
          @inline def emit(s: Int): Unit = {
            val a = math.abs(s.toLong)
            if (a > peak) peak = a
            sumAbs += a
            sumSq += s.toLong * s.toLong
            val neg = s < 0
            if (n > 0 && neg != prevNeg) zc += 1
            prevNeg = neg
            n += 1
          }
          while (blk < dataOff + dataLen) {
            var predictor = ((b(blk) & 0xff) | (b(blk + 1) << 8)).toShort.toInt
            var index = b(blk + 2) & 0xff
            if (index > 88 || b(blk + 3) != 0) return None // reserved: decline
            emit(predictor)
            var p = blk + 4
            while (p < blk + align) {
              val byte = b(p) & 0xff
              val (p1, i1) = imaStep(predictor, index, byte & 0xf)
              predictor = p1; index = i1; emit(predictor)
              val (p2, i2) = imaStep(predictor, index, byte >> 4)
              predictor = p2; index = i2; emit(predictor)
              p += 1
            }
            blk += align
          }
          Some(PcmStats(1, rate, n, peak, sumAbs, sumSq, zc))
        case _ => None
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Deterministic REAL-format IMA-ADPCM WAV fixture: `nBlocks` blocks
    * of `blockAlign` bytes, mono, each block header carrying a
    * seed-derived initial predictor/index and nibble codes from the
    * replayable formula code(k, i) = (seed·31 + k·17 + i·7) mod 16 —
    * the whole decode is therefore arithmetic both engines can replay.
    * fmt chunk is the spec 0x11 layout (cbSize=2, samplesPerBlock). */
  def synthAdpcmWav(nBlocks: Int, blockAlign: Int, sampleRate: Int,
      seed: Long): Array[Byte] = {
    require(nBlocks >= 1 && blockAlign >= 5 && blockAlign % 4 == 0)
    val samplesPerBlock = 1 + (blockAlign - 4) * 2
    val dataLen = nBlocks * blockAlign
    val out = new Array[Byte](12 + 8 + 20 + 8 + dataLen)
    def put4(o: Int, s: String): Unit = {
      out(o) = s(0).toByte; out(o + 1) = s(1).toByte
      out(o + 2) = s(2).toByte; out(o + 3) = s(3).toByte
    }
    def putLe32(o: Int, v: Long): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
      out(o + 2) = ((v >> 16) & 0xff).toByte
      out(o + 3) = ((v >> 24) & 0xff).toByte
    }
    def putLe16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
    }
    put4(0, "RIFF"); putLe32(4, out.length - 8L); put4(8, "WAVE")
    put4(12, "fmt "); putLe32(16, 20L)
    putLe16(20, 0x11) // wFormatTag: IMA ADPCM
    putLe16(22, 1)    // mono
    putLe32(24, sampleRate.toLong)
    putLe32(28, sampleRate.toLong * blockAlign / samplesPerBlock) // byteRate
    putLe16(32, blockAlign)
    putLe16(34, 4)    // bits per sample
    putLe16(36, 2)    // cbSize
    putLe16(38, samplesPerBlock)
    put4(40, "data"); putLe32(44, dataLen.toLong)
    var k = 0
    while (k < nBlocks) {
      val blk = 48 + k * blockAlign
      val pred0 = (((seed * 131 + k * 257) % 65536 + 65536) % 65536).toInt - 32768
      val idx0 = (((seed * 13 + k * 29) % 89 + 89) % 89).toInt
      putLe16(blk, pred0 & 0xffff)
      out(blk + 2) = idx0.toByte
      out(blk + 3) = 0
      var p = blk + 4
      var i = 0
      while (p < blk + blockAlign) {
        val lo = (((seed * 31 + k * 17 + i * 7) % 16 + 16) % 16).toInt
        val hi = (((seed * 31 + k * 17 + (i + 1) * 7) % 16 + 16) % 16).toInt
        out(p) = ((hi << 4) | lo).toByte
        p += 1
        i += 2
      }
      k += 1
    }
    out
  }

  /** Acoustic fingerprint of a PCM-16 clip — the Shazam/Chromaprint
    * bit shape reduced to its integer core: window the sample stream
    * (`win` interleaved samples), fold each window's energy Σ|s|, and
    * set bit w when energy rises from window w to w+1 (strict; ties
    * and falls are 0). At most 64 bits (the first 65 complete
    * windows), packed as two 32-bit halves like [[AHash]]. Energy
    * deltas survive gain changes and small edits, which is what makes
    * the bits a near-dup key; all-integer, so the fingerprint is
    * replayable on any engine. */
  case class PcmFingerprint(nWindows: Int, nBits: Int,
      hashHi: Long, hashLo: Long)

  /** REAL-decode acoustic fingerprint: same RIFF/PCM-16 walk as
    * [[decodePcm]], then per-window energies and rise bits. Uses only
    * COMPLETE windows; needs at least two (else None). */
  def pcmEnergyFingerprint(b: Array[Byte], win: Int): Option[PcmFingerprint] =
    try {
      require(win >= 1, "win must be >= 1")
      pcm16(b).flatMap { case (_, _, dataOff, n) =>
        val nW = n / win
        if (nW < 2) None
        else {
          val e = new Array[Long](nW)
          var w = 0
          while (w < nW) {
            var acc = 0L
            var j = w * win
            val end = j + win
            while (j < end) { acc += math.abs(sample16(b, dataOff, j)); j += 1 }
            e(w) = acc
            w += 1
          }
          val nBits = math.min(nW - 1, 64)
          var hi = 0L; var lo = 0L
          var i = 0
          while (i < nBits) {
            if (e(i + 1) > e(i)) { // rise
              if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
            }
            i += 1
          }
          Some(PcmFingerprint(nW, nBits, hi, lo))
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** REAL-PCM encode of an explicit interleaved int16 sample array —
    * the caller owns the sample formula (mirrors [[synthPngGray]]),
    * which is what lets a query plant replayable near-duplicate
    * clips. */
  def synthPcmWavSamples(channels: Int, sampleRate: Int,
      samples: Array[Short]): Array[Byte] = {
    val bytes = synthWav(channels, sampleRate, samples.length * 2)
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.position(44)
    var i = 0
    while (i < samples.length) { bb.putShort(samples(i)); i += 1 }
    bytes
  }

  /** Deterministic REAL-PCM fixture: a valid 16-bit WAV whose data
    * chunk holds `n` interleaved samples s(i) = ((seed·131 + i·17)
    * mod 65536) − 32768 — arithmetic an oracle can replay exactly,
    * so a byte-order or offset bug in [[decodePcm]] breaks the
    * recomputed stats, not just a smoke test. */
  def synthPcmWav(channels: Int, sampleRate: Int, frames: Int,
      seed: Long): Array[Byte] = {
    val n = frames * channels
    val bytes = synthWav(channels, sampleRate, n * 2)
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.position(44)
    var i = 0
    while (i < n) {
      bb.putShort((((seed * 131L + i * 17L) % 65536L) - 32768L).toShort)
      i += 1
    }
    bytes
  }

  /** Deterministic gated-PCM fixture: like [[synthPcmWav]] but every
    * alternate `win`-sample block is silent (all-zero) — the
    * speech-pause shape that makes windowed silence detection
    * meaningful. s(i) = 0 when (i/win) % 2 == 1, else the
    * [[synthPcmWav]] formula; an oracle replays the same CASE. */
  def synthGatedPcmWav(channels: Int, sampleRate: Int, frames: Int,
      seed: Long, win: Int): Array[Byte] = {
    val n = frames * channels
    val bytes = synthWav(channels, sampleRate, n * 2)
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.position(44)
    var i = 0
    while (i < n) {
      val v =
        if ((i / win) % 2 == 1) 0L
        else ((seed * 131L + i * 17L) % 65536L) - 32768L
      bb.putShort(v.toShort)
      i += 1
    }
    bytes
  }

  /** Deterministic REAL-PNG fixture: a w×h grayscale-in-RGB image with
    * pixel value g(x,y) = (seed·31 + x·7 + y·13) mod 256, encoded
    * through the JDK's real PNG writer. PNG is lossless, so a real
    * decode recovers every pixel exactly — which makes pixel-level
    * image operators (e.g. [[averageHash]]) oracle-checkable from the
    * generating arithmetic. */
  def synthPng(w: Int, h: Int, seed: Long): Array[Byte] =
    synthPngGray(Array.tabulate(w * h)(i =>
      ((seed * 31L + (i % w) * 7L + (i / w) * 13L) % 256L).toInt), w, h)

  /** REAL-PNG encode of an explicit row-major gray array (gray(y·w+x),
    * values 0..255, rendered as r=g=b). The caller owns the pixel
    * formula — which is what lets a query synthesize REPLAYABLE
    * near-duplicate images (e.g. controlled pixel inversions) and an
    * oracle recompute every pixel. PNG losslessness keeps the real
    * decode exact. */
  def synthPngGray(gray: Array[Int], w: Int, h: Int): Array[Byte] = {
    require(gray.length == w * h,
      s"gray has ${gray.length} pixels, expected ${w * h}")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = gray(y * w + x) & 0xff
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** 8×8 average-hash (aHash) perceptual fingerprint over a REAL image
    * decode: gray = integer ITU-R 601 luma (299r+587g+114b)/1000, mean
    * = floor(Σgray/64), bit (y·8+x) set when gray > mean (strict).
    * Non-8×8 images go through the real bilinear [[resizeImage]] path
    * first. The two 32-bit halves are returned separately so the full
    * 64-bit hash never needs bit 63 of a signed value. */
  case class AHash(mean: Int, nAbove: Int, hashHi: Long, hashLo: Long)

  def averageHash(content: Array[Byte]): Option[AHash] =
    try {
      val img0 =
        try Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(content)))
        catch { case scala.util.control.NonFatal(_) => None }
      img0.flatMap { src0 =>
        val src =
          if (src0.getWidth == 8 && src0.getHeight == 8) Some(src0)
          else resizeImage(content, 8, 8).flatMap(b =>
            Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(b))))
        src.map { im =>
          val gray = new Array[Int](64)
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              val rgb = im.getRGB(x, y)
              gray(y * 8 + x) = (((rgb >> 16) & 0xff) * 299 +
                ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
              x += 1
            }
            y += 1
          }
          grayHash(gray)
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** One decoded frame of an MJPEG-in-AVI clip: the frame's index in
    * stream order and its REAL-decoded pixel dimensions. */
  case class AviFrame(frameIdx: Int, width: Int, height: Int,
      byteLen: Int)

  /** REAL video decode — the one video format a bare JVM can decode
    * end-to-end: MJPEG-in-AVI, where the container is a RIFF tree
    * (pure byte walk, same discipline as the WAV parser) and every
    * frame is an ordinary JPEG that `javax.imageio` really decodes.
    * Walks the top-level RIFF chunks to the `movi` LIST, iterates the
    * `..dc`/`..db` frame chunks in stream order, and decodes each
    * frame's pixels for its true dimensions. Returns None for
    * non-AVI bytes, a missing `movi` list, or any frame the JPEG
    * decoder rejects (strict: a clip with one corrupt frame is a
    * corrupt clip — callers route it to quarantine, not silently
    * shortened output). */
  def decodeAviFrames(b: Array[Byte]): Option[Seq[AviFrame]] =
    try {
      if (b.length < 12 || tag(b, 0) != "RIFF" || tag(b, 8) != "AVI ")
        return None
      javax.imageio.ImageIO.setUseCache(false)
      var off = 12
      var moviOff = -1
      var moviEnd = -1L
      while (off + 8 <= b.length) {
        val id = tag(b, off)
        val size = le32(b, off + 4)
        if (id == "LIST" && off + 12 <= b.length &&
            tag(b, off + 8) == "movi") {
          moviOff = off + 12; moviEnd = off.toLong + 8L + size
        }
        off = riffNext(off, size)
        if (off < 0) return None // hostile size: refuse, don't loop
      }
      if (moviOff < 0 || moviEnd > b.length) return None
      val out = scala.collection.mutable.ArrayBuffer.empty[AviFrame]
      var p = moviOff
      var idx = 0
      var ok = true
      while (ok && p + 8 <= moviEnd) {
        val cid = tag(b, p)
        val clen = le32(b, p + 4)
        if (p.toLong + 8L + clen > moviEnd) ok = false
        else {
          if (cid.endsWith("dc") || cid.endsWith("db")) {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(b, p + 8, clen.toInt))
            if (img == null) ok = false
            else {
              out += AviFrame(idx, img.getWidth, img.getHeight, clen.toInt)
              idx += 1
            }
          }
          p = riffNext(p, clen)
          if (p < 0) ok = false // hostile size: refuse, don't loop
        }
      }
      if (ok) Some(out.toSeq) else None
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Deterministic REAL-JPEG fixture: a w×h gradient image through the
    * JDK's real JPEG encoder. JPEG is lossy, so (unlike the PNG
    * fixture) pixel VALUES are not oracle-replayable — but decoded
    * DIMENSIONS are exact, which is what the AVI round trip checks. */
  def synthJpeg(w: Int, h: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = ((seed * 31L + x * 7L + y * 13L) % 256L).toInt
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Mux real JPEG frames into a minimal REAL AVI: RIFF(AVI ) with a
    * LIST(hdrl) carrying avih + one vids/MJPG stream header, and a
    * LIST(movi) of `00dc` frame chunks (even-padded, per the RIFF
    * rule). [[decodeAviFrames]] demuxes it — and any other
    * MJPEG-in-AVI — back to per-frame real decodes. */
  def synthAvi(frames: Seq[Array[Byte]], w: Int, h: Int,
      fps: Int = 25): Array[Byte] =
    aviMux(frames, w, h, fps, handler = "MJPG", biCompression = mjpgFourcc,
      chunkId = "00dc")

  /** 'MJPG' as the little-endian biCompression int. */
  private val mjpgFourcc =
    'M'.toInt | ('J'.toInt << 8) | ('P'.toInt << 16) | ('G'.toInt << 24)

  /** Mux frames of uncompressed 24-bit DIB video (biCompression=0,
    * BI_RGB) — each frame's bytes must already be in DIB layout:
    * bottom-up rows, BGR pixels, rows padded to a 4-byte stride.
    * [[synthDibFrame]] builds one from a logical top-down gray array. */
  def synthAviDib(frames: Seq[Array[Byte]], w: Int, h: Int,
      fps: Int = 25): Array[Byte] =
    aviMux(frames, w, h, fps, handler = "DIB ", biCompression = 0,
      chunkId = "00db")

  private def aviMux(frames: Seq[Array[Byte]], w: Int, h: Int, fps: Int,
      handler: String, biCompression: Int, chunkId: String): Array[Byte] = {
    val moviBody = 4 + frames.map(f => 8 + f.length + (f.length & 1)).sum
    val hdrlBody = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
    val riffBody = 4 + (8 + hdrlBody) + (8 + moviBody)
    val bb = java.nio.ByteBuffer.allocate(8 + riffBody)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(t: String): Unit = bb.put(t.getBytes("US-ASCII"))
    fourcc("RIFF"); bb.putInt(riffBody); fourcc("AVI ")
    fourcc("LIST"); bb.putInt(hdrlBody); fourcc("hdrl")
    fourcc("avih"); bb.putInt(56)
    bb.putInt(1000000 / fps).putInt(0).putInt(0).putInt(0x10) // HASINDEX off, INTERLEAVED-ish flags kept minimal
      .putInt(frames.length).putInt(0).putInt(1).putInt(0)
      .putInt(w).putInt(h).putInt(0).putInt(0).putInt(0).putInt(0)
    fourcc("LIST"); bb.putInt(4 + (8 + 56) + (8 + 40)); fourcc("strl")
    fourcc("strh"); bb.putInt(56)
    fourcc("vids"); fourcc(handler)
    bb.putInt(0).putShort(0).putShort(0).putInt(0)
      .putInt(1).putInt(fps) // scale, rate
      .putInt(0).putInt(frames.length).putInt(0).putInt(-1).putInt(0)
      .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)
    fourcc("strf"); bb.putInt(40)
    bb.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
    bb.putInt(biCompression)
    bb.putInt(w * h * 3).putInt(0).putInt(0).putInt(0).putInt(0)
    fourcc("LIST"); bb.putInt(moviBody); fourcc("movi")
    frames.foreach { f =>
      fourcc(chunkId); bb.putInt(f.length); bb.put(f)
      if ((f.length & 1) == 1) bb.put(0.toByte)
    }
    bb.array()
  }

  /** Build one uncompressed 24-bit DIB frame from a LOGICAL top-down
    * row-major gray array: rows are stored bottom-up, pixels as BGR
    * (r=g=b=gray here), each row zero-padded to a 4-byte stride — the
    * three classic DIB decode hazards, all exercised on purpose. */
  def synthDibFrame(gray: Array[Int], w: Int, h: Int): Array[Byte] = {
    require(gray.length == w * h,
      s"gray has ${gray.length} pixels, expected ${w * h}")
    val stride = (w * 3 + 3) & ~3
    val out = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      val storedRow = h - 1 - y // bottom-up
      var x = 0
      while (x < w) {
        val g = (gray(y * w + x) & 0xff).toByte
        val o = storedRow * stride + x * 3
        out(o) = g; out(o + 1) = g; out(o + 2) = g // B, G, R
        x += 1
      }
      y += 1
    }
    out
  }

  /** One decoded frame of an uncompressed-DIB AVI clip: logical
    * top-down row-major gray values (ITU-R 601 integer luma). */
  case class DibFrame(frameIdx: Int, width: Int, height: Int,
      gray: Array[Int])

  /** REAL uncompressed-video decode: AVI carrying BI_RGB 24-bit DIB
    * frames. Walks the RIFF tree for the strf BITMAPINFOHEADER
    * (width, height, bit count, compression — must be 0/BI_RGB,
    * 24-bit), then decodes every `..db`/`..dc` movi chunk: bottom-up
    * row order un-flipped, BGR unpacked through the same integer
    * 601 luma as the image path, 4-byte row stride honored. Returns
    * None for non-AVI bytes, a non-DIB stream, or any frame whose
    * chunk is not exactly stride×height bytes (strict, like the
    * MJPEG path). */
  def decodeDibFrames(b: Array[Byte]): Option[Seq[DibFrame]] =
    try {
      if (b.length < 12 || tag(b, 0) != "RIFF" || tag(b, 8) != "AVI ")
        return None
      // find strf (recursive LIST walk) and the movi LIST
      var strfOff = -1
      var moviOff = -1
      var moviEnd = -1L
      var corrupt = false
      def walk(from: Int, to: Int): Unit = {
        var off = from
        while (!corrupt && off + 8 <= to) {
          val id = tag(b, off)
          val size = le32(b, off + 4)
          if (id == "LIST" && off + 12 <= to) {
            if (tag(b, off + 8) == "movi") {
              moviOff = off + 12; moviEnd = off.toLong + 8L + size
            } else walk(off + 12,
              math.min(off.toLong + 8L + size, to.toLong).toInt)
          } else if (id == "strf" && strfOff < 0) strfOff = off + 8
          off = riffNext(off, size)
          if (off < 0) corrupt = true // hostile size: refuse, don't loop
        }
      }
      walk(12, b.length)
      if (corrupt) return None
      if (strfOff < 0 || strfOff + 20 > b.length) return None
      if (moviOff < 0 || moviEnd > b.length) return None
      val w = le32(b, strfOff + 4).toInt
      val h = le32(b, strfOff + 8).toInt
      val bits = le16(b, strfOff + 14)
      val compression = le32(b, strfOff + 16).toInt
      if (compression != 0 || bits != 24 || w <= 0 || h <= 0) return None
      val stride = (w * 3 + 3) & ~3
      val out = scala.collection.mutable.ArrayBuffer.empty[DibFrame]
      var p = moviOff
      var idx = 0
      var ok = true
      while (ok && p + 8 <= moviEnd) {
        val cid = tag(b, p)
        val clen = le32(b, p + 4)
        if (p.toLong + 8L + clen > moviEnd) ok = false
        else {
          if (cid.endsWith("db") || cid.endsWith("dc")) {
            if (clen != stride.toLong * h) ok = false
            else {
              val gray = new Array[Int](w * h)
              var y = 0
              while (y < h) {
                val storedRow = h - 1 - y
                var x = 0
                while (x < w) {
                  val o = p + 8 + storedRow * stride + x * 3
                  val bl = b(o) & 0xff
                  val gr = b(o + 1) & 0xff
                  val rd = b(o + 2) & 0xff
                  gray(y * w + x) = (rd * 299 + gr * 587 + bl * 114) / 1000
                  x += 1
                }
                y += 1
              }
              out += DibFrame(idx, w, h, gray)
              idx += 1
            }
          }
          p = riffNext(p, clen)
          if (p < 0) ok = false // hostile size: refuse, don't loop
        }
      }
      if (ok) Some(out.toSeq) else None
    } catch { case scala.util.control.NonFatal(_) => None }

  /** REAL image decode to an integer luma array (ITU-R 601, the same
    * formula as [[averageHash]] and the DIB path): (width, height,
    * row-major gray). None when no installed reader accepts the
    * bytes. */
  def decodeGray(content: Array[Byte]): Option[(Int, Int, Array[Int])] =
    try {
      Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(content))).map { im =>
        val w = im.getWidth; val h = im.getHeight
        val gray = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = im.getRGB(x, y)
            gray(y * w + x) = (((rgb >> 16) & 0xff) * 299 +
              ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
            x += 1
          }
          y += 1
        }
        (w, h, gray)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Exact 2× box downscale of a gray array: each output pixel is the
    * truncating mean of its 2×2 source block — all-integer, so the
    * resize a vision pipeline runs before feature extraction is
    * oracle-replayable pixel by pixel (the bilinear path in
    * [[resizeImage]] covers arbitrary ratios with float kernels; this
    * is the exact power-of-two fast path). Requires even w and h. */
  def boxDownscale2x(gray: Array[Int], w: Int, h: Int): Array[Int] = {
    require(w % 2 == 0 && h % 2 == 0, s"need even dims, got ${w}x$h")
    require(gray.length == w * h,
      s"gray has ${gray.length} pixels, expected ${w * h}")
    val ow = w / 2; val oh = h / 2
    val out = new Array[Int](ow * oh)
    var y = 0
    while (y < oh) {
      var x = 0
      while (x < ow) {
        out(y * ow + x) = (gray(2 * y * w + 2 * x) +
          gray(2 * y * w + 2 * x + 1) +
          gray((2 * y + 1) * w + 2 * x) +
          gray((2 * y + 1) * w + 2 * x + 1)) / 4
        x += 1
      }
      y += 1
    }
    out
  }

  /** REAL audio resample, 2:1 decimation with pair averaging: decode
    * the PCM-16 stream, replace each adjacent sample pair with its
    * truncating mean, and re-encode a valid WAV at half the rate (odd
    * trailing sample dropped). All-integer (Scala and SQL integer
    * division both truncate toward zero), so the resampled SAMPLES are
    * oracle-replayable — the downsample a speech pipeline runs before
    * feature extraction, checkable end to end. Mono streams only (pair
    * averaging across interleaved channels would mix them). */
  def resamplePcmHalf(b: Array[Byte]): Option[Array[Byte]] =
    try pcm16(b).flatMap { case (ch, rate, dataOff, n) =>
      if (ch != 1) None
      else {
        val outN = n / 2
        val samples = new Array[Short](outN)
        var j = 0
        while (j < outN) {
          val s0 = sample16(b, dataOff, 2 * j)
          val s1 = sample16(b, dataOff, 2 * j + 1)
          samples(j) = ((s0 + s1) / 2).toShort
          j += 1
        }
        Some(synthPcmWavSamples(1, rate / 2, samples))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Append a PNG `tEXt` metadata chunk (keyword + Latin-1 text) right
    * before IEND — real PNG chunk surgery: length/type/data/CRC32
    * framing per the spec, so any standards-compliant reader (and
    * [[readPngText]]) sees the metadata and the image still decodes.
    * IEND is located by walking the chunk list (NOT assumed to be the
    * trailing 12 bytes — a spec-valid PNG may carry trailing garbage
    * after IEND, and splicing inside IEND would corrupt the file
    * silently); throws loudly when the bytes have no IEND chunk. */
  def addPngText(png: Array[Byte], key: String, value: String): Array[Byte] = {
    val data = key.getBytes("ISO-8859-1") ++ Array(0.toByte) ++
      value.getBytes("ISO-8859-1")
    val crc = new java.util.zip.CRC32()
    val typ = "tEXt".getBytes("US-ASCII")
    crc.update(typ); crc.update(data)
    val chunk = java.nio.ByteBuffer.allocate(12 + data.length)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
      .putInt(data.length).put(typ).put(data).putInt(crc.getValue.toInt)
      .array()
    val cut = pngIendOffset(png).getOrElse(
      throw new IllegalArgumentException(
        "addPngText: no IEND chunk found — not a well-formed PNG"))
    png.take(cut) ++ chunk ++ png.drop(cut)
  }

  /** Offset of the IEND chunk header via the chunk-list walk (the same
    * frame discipline as [[readPngText]]); None for non-PNG bytes or a
    * chunk list that never reaches IEND. */
  private def pngIendOffset(png: Array[Byte]): Option[Int] = {
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    if (png.length < 8 || !png.take(8).sameElements(sig)) return None
    var off = 8
    while (off + 12 <= png.length) {
      val len = java.nio.ByteBuffer.wrap(png, off, 4).getInt
      if (len < 0 || off + 12 + len > png.length) return None
      if (new String(png, off + 4, 4, "US-ASCII") == "IEND")
        return Some(off)
      off += 12 + len
    }
    None
  }

  /** Parse all `tEXt` chunks of a PNG — a real chunk-tree walk (8-byte
    * signature, then length/type/data/CRC frames) with CRC32
    * verification; a corrupted chunk fails the whole parse (None), and
    * non-PNG bytes decline. */
  def readPngText(png: Array[Byte]): Option[Seq[(String, String)]] =
    try {
      val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
        .map(_.toByte)
      if (png.length < 8 || !png.take(8).sameElements(sig)) return None
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      var off = 8
      while (off + 12 <= png.length) {
        val len = java.nio.ByteBuffer.wrap(png, off, 4).getInt
        if (len < 0 || off + 12 + len > png.length) return None
        val typ = new String(png, off + 4, 4, "US-ASCII")
        val crc = new java.util.zip.CRC32()
        crc.update(png, off + 4, 4 + len)
        val stored = java.nio.ByteBuffer.wrap(png, off + 8 + len, 4).getInt
        if (crc.getValue.toInt != stored) return None
        if (typ == "tEXt") {
          val data = png.slice(off + 8, off + 8 + len)
          val z = data.indexOf(0.toByte)
          if (z < 0) return None
          out += ((new String(data, 0, z, "ISO-8859-1"),
            new String(data, z + 1, data.length - z - 1, "ISO-8859-1")))
        }
        // IEND terminates the PNG datastream per spec: bytes after it
        // are not chunks (spec-valid files may carry trailing garbage)
        if (typ == "IEND") return Some(out.toSeq)
        off += 12 + len
      }
      Some(out.toSeq)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** The three EXIF IFD0 fields an image-ingest metadata gate reads:
    * orientation (tag 0x0112 — the rotate-before-train field), the
    * capture timestamp (0x0132, "YYYY:MM:DD HH:MM:SS"), and the
    * camera make (0x010F). */
  case class ExifMeta(orientation: Int, dateTime: String, make: String)

  /** Splice a minimal spec-correct EXIF APP1 segment into a JPEG,
    * right after SOI: marker FFE1, big-endian segment length,
    * "Exif\0\0", then a little-endian TIFF ("II", magic 42) whose IFD0
    * carries Make (ASCII, out-of-line), Orientation (SHORT, inline),
    * and DateTime (ASCII 20 bytes, out-of-line) — entries in
    * ascending-tag order with offsets relative to the TIFF header, as
    * TIFF 6.0 requires. Decoders skip unknown APP segments, so the
    * image still decodes bit-identically. Throws on non-JPEG input. */
  def addJpegExif(jpeg: Array[Byte], orientation: Int, dateTime: String,
      make: String): Array[Byte] = {
    require(jpeg.length >= 2 && (jpeg(0) & 0xff) == 0xff &&
      (jpeg(1) & 0xff) == 0xd8, "addJpegExif: input is not a JPEG (no SOI)")
    val makeB = make.getBytes("US-ASCII") :+ 0.toByte
    val dtB = dateTime.getBytes("US-ASCII") :+ 0.toByte
    require(dtB.length == 20,
      "EXIF DateTime must be 'YYYY:MM:DD HH:MM:SS' (19 chars)")
    // TIFF: header(8) + count(2) + 3 entries(36) + nextIFD(4) = 50,
    // then the out-of-line value area
    val makeOff = 50
    val dtOff = makeOff + makeB.length
    val tiff = java.nio.ByteBuffer.allocate(dtOff + dtB.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    tiff.put('I'.toByte).put('I'.toByte).putShort(42).putInt(8)
    tiff.putShort(3)
    tiff.putShort(0x010f.toShort).putShort(2).putInt(makeB.length)
      .putInt(makeOff)
    tiff.putShort(0x0112.toShort).putShort(3).putInt(1)
      .putShort(orientation.toShort).putShort(0)
    tiff.putShort(0x0132.toShort).putShort(2).putInt(dtB.length)
      .putInt(dtOff)
    tiff.putInt(0) // no IFD1
    tiff.put(makeB).put(dtB)
    val body = "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++
      tiff.array()
    val seg = java.nio.ByteBuffer.allocate(4 + body.length)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
      .put(0xff.toByte).put(0xe1.toByte)
      .putShort((2 + body.length).toShort).put(body).array()
    jpeg.take(2) ++ seg ++ jpeg.drop(2)
  }

  /** Parse a JPEG's EXIF IFD0 — a real marker-segment walk (SOI, then
    * FF-marker frames with big-endian lengths, stopping at SOS) to the
    * first APP1 "Exif" segment, then a strict TIFF walk: either byte
    * order ("II"/"MM"), magic 42, bounds-checked IFD0 entries,
    * inline-vs-offset ASCII values per the 4-byte rule. Declines
    * (None) on non-JPEG bytes, no EXIF, bad TIFF magic, out-of-bounds
    * offsets, or any of the three fields missing — the strict
    * quarantine contract every decoder here follows. */
  def readJpegExif(bytes: Array[Byte]): Option[ExifMeta] =
    try {
      if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff ||
        (bytes(1) & 0xff) != 0xd8) return None
      var off = 2
      var tiffOff = -1
      var tiffEnd = -1
      while (tiffOff < 0 && off + 4 <= bytes.length) {
        if ((bytes(off) & 0xff) != 0xff) return None
        val m = bytes(off + 1) & 0xff
        if (m == 0xda) return None // SOS: image data — no EXIF found
        val len = ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
        if (len < 2 || off + 2 + len > bytes.length) return None
        if (m == 0xe1 && len >= 8 &&
          new String(bytes, off + 4, 4, "US-ASCII") == "Exif" &&
          bytes(off + 8) == 0 && bytes(off + 9) == 0) {
          tiffOff = off + 10
          tiffEnd = off + 2 + len
        }
        off += 2 + len
      }
      if (tiffOff < 0) return None
      val le = bytes(tiffOff) == 'I'.toByte && bytes(tiffOff + 1) == 'I'.toByte
      val be = bytes(tiffOff) == 'M'.toByte && bytes(tiffOff + 1) == 'M'.toByte
      if (!le && !be) return None
      def u16(p: Int): Int =
        if (le) (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
        else ((bytes(p) & 0xff) << 8) | (bytes(p + 1) & 0xff)
      def u32(p: Int): Long =
        if (le) (u16(p).toLong) | (u16(p + 2).toLong << 16)
        else (u16(p).toLong << 16) | u16(p + 2).toLong
      if (u16(tiffOff + 2) != 42) return None
      val ifd = tiffOff + u32(tiffOff + 4).toInt
      if (ifd + 2 > tiffEnd) return None
      val n = u16(ifd)
      if (ifd + 2 + 12 * n + 4 > tiffEnd) return None
      var orientation = Option.empty[Int]
      var dateTime = Option.empty[String]
      var make = Option.empty[String]
      def ascii(entry: Int, cnt: Int): Option[String] = {
        val p = if (cnt <= 4) entry + 8 else tiffOff + u32(entry + 8).toInt
        if (p + cnt > tiffEnd || cnt < 1) None
        else Some(new String(bytes, p,
          if (bytes(p + cnt - 1) == 0) cnt - 1 else cnt, "US-ASCII"))
      }
      var i = 0
      while (i < n) {
        val e = ifd + 2 + 12 * i
        val tag = u16(e)
        val typ = u16(e + 2)
        val cnt = u32(e + 4).toInt
        tag match {
          case 0x0112 if typ == 3 && cnt == 1 =>
            orientation = Some(u16(e + 8))
          case 0x0132 if typ == 2 => dateTime = ascii(e, cnt)
          case 0x010f if typ == 2 => make = ascii(e, cnt)
          case _ => ()
        }
        i += 1
      }
      for (o <- orientation; dt <- dateTime; mk <- make)
        yield ExifMeta(o, dt, mk)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Average-hash fold over an explicit gray array (≤ 64 pixels):
    * floor mean, bit i set when gray(i) > mean, split into 32-bit
    * halves. The shared core of [[averageHash]] (which feeds it from
    * a real image decode) and the DIB video fingerprint path. */
  def grayHash(gray: Array[Int]): AHash = {
    require(gray.length >= 1 && gray.length <= 64,
      s"grayHash packs at most 64 bits, got ${gray.length}")
    var sum = 0L
    var i = 0
    while (i < gray.length) { sum += gray(i); i += 1 }
    val mean = (sum / gray.length).toInt
    var nAbove = 0; var hi = 0L; var lo = 0L
    i = 0
    while (i < gray.length) {
      if (gray(i) > mean) {
        nAbove += 1
        if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
      }
      i += 1
    }
    AHash(mean, nAbove, hi, lo)
  }

  def synthWav(channels: Int, sampleRate: Int, dataLen: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val byteRate = sampleRate * channels * 2
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort)
      .putInt(sampleRate).putInt(byteRate)
      .putShort((channels * 2).toShort).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    bb.array()
  }

  /** Deterministic REAL-format fixture: a minimal valid MP4 —
    * ftyp(isom) + moov(mvhd v0 + trak(tkhd v0 with 16.16 w×h +
    * mdia/minf/stbl/stsz with `samples` sample entries declared)). */
  def synthMp4(timescale: Int, duration: Int, w: Int, h: Int,
      samples: Int = 0): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16 + 260)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    def box(size: Int, t: String): Unit = {
      bb.putInt(size); bb.put(t.getBytes("US-ASCII"))
    }
    box(16, "ftyp")
    bb.put("isom".getBytes("US-ASCII")).putInt(0)
    box(260, "moov")
    box(108, "mvhd") // v0: 100-byte payload
    bb.putInt(0).putInt(0).putInt(0)
      .putInt(timescale).putInt(duration)
      .putInt(0x00010000).putShort(0x0100.toShort)
    bb.position(bb.position() + 10 + 36 + 24)
    bb.putInt(2)
    box(144, "trak")
    box(92, "tkhd") // v0: 84-byte payload
    bb.putInt(0).putInt(0).putInt(0).putInt(1)
      .putInt(0).putInt(duration)
    bb.position(bb.position() + 8 + 2 + 2 + 2 + 2 + 36)
    bb.putInt(w << 16).putInt(h << 16)
    box(44, "mdia")
    box(36, "minf")
    box(28, "stbl")
    box(20, "stsz") // version/flags, sample_size(0 = per-sample), count
    bb.putInt(0).putInt(0).putInt(samples)
    bb.array()
  }

  /** Two-tier decode: real codec when the JVM has one for these bytes
    * (images) or the container header is pure-JVM-parseable (WAV/MP4 —
    * width/height from the tkhd, frames from the sample table / data
    * chunk), deterministic stub otherwise. */
  def decode(content: Array[Byte]): (Int, Int, Int) =
    decodeImage(content)
      .orElse(decodeAv(content).map(m =>
        (m.width, m.height, math.max(1, m.samples))))
      .getOrElse(decodeStub(content))

  private def sha256Hex(bytes: Array[Byte]): String = {
    val d = MessageDigest.getInstance("SHA-256").digest(bytes)
    d.map("%02x".format(_)).mkString
  }

  /** Partition-batched feature extraction. One codec/digest instance per
    * partition (the mapInPandas batch contract); records stream through
    * without materializing the partition. */
  def extractFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition codec init: no temp-file cache for the image
      // input streams created inside this task
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val (w, h, f) = decode(r.content)
        MediaFeatures(r.id, r.kind, r.content.length,
          sha256Hex(r.content), w, h, f)
      }
    }
  }

  /** Partition-batched audio/video metadata extraction — the same
    * distributed shape as [[extractFeatures]], but through the REAL
    * container parsers: WAV and MP4 headers parse for codec, channels,
    * sample rate, duration, and track dimensions; bytes in neither
    * container degrade to a deterministic "unknown" row (stub
    * dimensions), never a task failure. */
  def extractAvMeta(ds: Dataset[MediaRecord]): Dataset[AvMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        decodeAv(r.content) match {
          case Some(m) => m.copy(id = r.id, kind = r.kind)
          case None =>
            val (w, h, _) = decodeStub(r.content)
            AvMeta(r.id, r.kind, "unknown", "", 0, 0, -1L, w, h, 0, 0)
        }
      }
    }
  }

  /** One sampled frame of a video record — the row-explosion (UDTF)
    * shape of media processing. */
  case class FrameRecord(id: Long, frameIdx: Int, content: Array[Byte])

  /** STUB resize — deterministic byte-stride downsample standing in for
    * a real scaler: keeps every k-th byte where k is the integer scale
    * factor to the target box. Real plumbing, fake pixels. */
  def resizeStub(content: Array[Byte], w: Int, h: Int,
      targetW: Int, targetH: Int): Array[Byte] = {
    val stride = math.max(1, math.max(
      w / math.max(targetW, 1), h / math.max(targetH, 1)))
    if (stride == 1) content
    else content.indices.collect {
      case i if i % stride == 0 => content(i)
    }.toArray
  }

  /** REAL resize via `javax.imageio` + `java.awt` raster scaling
    * (bilinear), re-encoded as PNG. None when the bytes aren't a
    * JVM-decodable image. Runs headless — no display dependency. */
  def resizeImage(content: Array[Byte], targetW: Int,
      targetH: Int): Option[Array[Byte]] = {
    val img =
      try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(content)))
      // NonFatal, not IOException: corrupt bytes whose magic matched a
      // reader throw RuntimeExceptions — fall back, don't kill the task
      catch { case scala.util.control.NonFatal(_) => None }
    img.map { src =>
      val out = new java.awt.image.BufferedImage(
        targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(src, 0, 0, targetW, targetH, null)
      } finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      bos.toByteArray
    }
  }

  /** Resize every record to fit a target box: streams through
    * mapPartitions (per-partition codec init), content replaced by the
    * resized bytes, metadata updated to the target dimensions. Real
    * scaler for JVM-decodable images, byte-stride stub otherwise. */
  def resize(ds: Dataset[MediaRecord], targetW: Int,
      targetH: Int): Dataset[MediaRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val resized = resizeImage(r.content, targetW, targetH).getOrElse {
          val (w, h, _) = decodeStub(r.content)
          resizeStub(r.content, w, h, targetW, targetH)
        }
        r.copy(content = resized,
          declaredWidth = targetW, declaredHeight = targetH)
      }
    }
  }

  /** Sample every `everyN`-th frame of each record — one output row per
    * sampled frame (flatMap: rows multiply, the generator/UDTF shape).
    * Frame bytes are a deterministic slice stub; frame count comes from
    * the (stub) decode. */
  def sampleFrames(ds: Dataset[MediaRecord],
      everyN: Int): Dataset[FrameRecord] = {
    import ds.sparkSession.implicits._
    require(everyN >= 1, "everyN must be >= 1")
    ds.flatMap { r =>
      val (_, _, frames) = decode(r.content)
      val n = r.content.length
      (0 until frames by everyN).map { i =>
        val from = if (frames == 0) 0 else (n.toLong * i / frames).toInt
        val until = if (frames == 0) n else (n.toLong * (i + 1) / frames).toInt
        FrameRecord(r.id, i, java.util.Arrays.copyOfRange(r.content, from, until))
      }
    }
  }

  /** Build a media dataset from the documents table (text bytes standing
    * in for media bytes), partitioned for parallel decode. */
  def fromDocuments(spark: SparkSession, sfDir: String,
      partitions: Int = 32): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("id"), lit("image").as("kind"),
        col("text").cast("binary").as("content"),
        lit(0).as("declaredWidth"), lit(0).as("declaredHeight"))
      .repartition(partitions)
      .as[MediaRecord]
  }

  /** End-to-end: documents → media records → features, as a DataFrame. */
  def documentFeatures(spark: SparkSession, sfDir: String): DataFrame =
    extractFeatures(fromDocuments(spark, sfDir)).toDF()
}
