package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("feature extraction is deterministic and schema-stable") {
    val a = Multimodal.documentFeatures(spark, TestSpark.sfDir)
    assert(a.schema.fieldNames ===
      Array("id", "kind", "nBytes", "sha256", "width", "height", "frames"))
    val r1 = a.collect().sortBy(_.getLong(0))
    val r2 = Multimodal.documentFeatures(spark, TestSpark.sfDir)
      .collect().sortBy(_.getLong(0))
    assert(r1 === r2)
    assert(r1.length === 500)
  }

  test("decode stub derives stable pseudo-dimensions") {
    val bytes = "hello world, a fake image".getBytes("UTF-8")
    val (w1, h1, f1) = Multimodal.decodeStub(bytes)
    val (w2, h2, f2) = Multimodal.decodeStub(bytes)
    assert((w1, h1, f1) === (w2, h2, f2))
    assert(w1 === bytes.length % 640)
    val (w0, h0, f0) = Multimodal.decodeStub(Array.emptyByteArray)
    assert((w0, h0, f0) === (0, 0, 1))
  }

  test("resize fits the target box metadata and never grows content") {
    val media = Multimodal.fromDocuments(spark, TestSpark.sfDir)
    val before = media.collect().map(r => r.id -> r.content.length).toMap
    val resized = Multimodal.resize(media, 64, 64).collect()
    assert(resized.length === before.size)
    resized.foreach { r =>
      assert(r.declaredWidth === 64 && r.declaredHeight === 64)
      assert(r.content.length <= before(r.id))
      assert(r.content.nonEmpty)
    }
    // deterministic across runs
    val again = Multimodal.resize(
      Multimodal.fromDocuments(spark, TestSpark.sfDir), 64, 64)
      .collect().map(r => r.id -> r.content.toSeq).toMap
    assert(resized.map(r => r.id -> r.content.toSeq).toMap === again)
  }

  test("frame sampling explodes to every Nth frame and partitions bytes") {
    val media = Multimodal.fromDocuments(spark, TestSpark.sfDir)
    val everyN = 7
    val expected = media.collect().map { r =>
      val (_, _, frames) = Multimodal.decodeStub(r.content)
      r.id -> (0 until frames by everyN).size
    }.toMap
    val frames = Multimodal.sampleFrames(media, everyN).collect()
    val got = frames.groupBy(_.id).map { case (k, v) => k -> v.length }
    assert(got === expected)
    frames.foreach(f => assert(f.frameIdx % everyN === 0))
  }

  /** A real in-memory image, encoded with the JDK's own writer. */
  private def makeImage(w: Int, h: Int, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, format, bos),
      s"JDK must ship a $format writer")
    bos.toByteArray
  }

  test("REAL codec: PNG and BMP decode to true dimensions, distributed") {
    import spark.implicits._
    val recs = Seq(
      Multimodal.MediaRecord(1L, "image", makeImage(37, 21, "png"), 0, 0),
      Multimodal.MediaRecord(2L, "image", makeImage(64, 48, "bmp"), 0, 0),
      Multimodal.MediaRecord(3L, "image", makeImage(5, 300, "gif"), 0, 0),
      // not an image: must fall back to the deterministic stub
      Multimodal.MediaRecord(9L, "audio",
        "just some text bytes".getBytes("UTF-8"), 0, 0))
    val feats = Multimodal.extractFeatures(
        spark.createDataset(recs).repartition(3))
      .collect().map(f => f.id -> f).toMap
    assert((feats(1L).width, feats(1L).height) === (37, 21))
    assert((feats(2L).width, feats(2L).height) === (64, 48))
    assert((feats(3L).width, feats(3L).height) === (5, 300))
    assert(feats(1L).frames === 1)
    val stubBytes = "just some text bytes".getBytes("UTF-8")
    val (sw, sh, sf) = Multimodal.decodeStub(stubBytes)
    assert((feats(9L).width, feats(9L).height, feats(9L).frames) ===
      (sw, sh, sf))
    // decodeImage itself: Some for real images, None for other bytes
    assert(Multimodal.decodeImage(stubBytes).isEmpty)
    assert(Multimodal.decodeImage(makeImage(8, 9, "png")) === Some((8, 9, 1)))
  }

  test("REAL codec: resize rescales a PNG to the target box") {
    import spark.implicits._
    val recs = Seq(
      Multimodal.MediaRecord(1L, "image", makeImage(100, 80, "png"), 100, 80))
    val out = Multimodal.resize(spark.createDataset(recs), 16, 16).collect()
    assert(out.length === 1)
    assert(out(0).declaredWidth === 16 && out(0).declaredHeight === 16)
    // the resized bytes are themselves a decodable 16x16 image
    assert(Multimodal.decodeImage(out(0).content) === Some((16, 16, 1)))
  }

  /** A real canonical 44-byte PCM WAV header + payload. */
  private def makeWav(channels: Int, sampleRate: Int,
      dataLen: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val byteRate = sampleRate * channels * 2
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                      // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(byteRate)
      .putShort((channels * 2).toShort) // block align
      .putShort(16)                     // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    bb.array()
  }

  /** A minimal real MP4: ftyp + moov(mvhd v0 + trak(tkhd v0)). */
  private def makeMp4(timescale: Int, duration: Int,
      w: Int, h: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16 + 216)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    def box(size: Int, t: String): Unit = {
      bb.putInt(size); bb.put(t.getBytes("US-ASCII"))
    }
    box(16, "ftyp")
    bb.put("isom".getBytes("US-ASCII")).putInt(0)    // brand, minor
    box(216, "moov")
    box(108, "mvhd")                                 // v0: 100-byte payload
    bb.putInt(0)                                     // version+flags
      .putInt(0).putInt(0)                           // creation, modification
      .putInt(timescale).putInt(duration)
      .putInt(0x00010000).putShort(0x0100.toShort)   // rate, volume
    bb.position(bb.position() + 10 + 36 + 24)        // reserved, matrix, predefined
    bb.putInt(2)                                     // next track id
    box(100, "trak")
    box(92, "tkhd")                                  // v0: 84-byte payload
    bb.putInt(0)                                     // version+flags
      .putInt(0).putInt(0).putInt(1)                 // creation, mod, track id
      .putInt(0).putInt(duration)                    // reserved, duration
    bb.position(bb.position() + 8 + 2 + 2 + 2 + 2 + 36) // reserved..matrix
    bb.putInt(w << 16).putInt(h << 16)               // 16.16 fixed
    bb.array()
  }

  test("REAL container parse: WAV and MP4 headers through the " +
      "distributed path; garbage degrades to unknown") {
    import spark.implicits._
    val recs = Seq(
      Multimodal.MediaRecord(1L, "audio", makeWav(2, 44100, 176400), 0, 0),
      Multimodal.MediaRecord(2L, "video", makeMp4(600, 1200, 320, 240), 0, 0),
      Multimodal.MediaRecord(3L, "audio",
        "not a media container".getBytes("UTF-8"), 0, 0))
    val metas = Multimodal.extractAvMeta(
        spark.createDataset(recs).repartition(3))
      .collect().map(m => m.id -> m).toMap
    val wav = metas(1L)
    assert(wav.container === "wav" && wav.codec === "pcm")
    assert(wav.channels === 2 && wav.sampleRate === 44100)
    // 176400 data bytes / (44100*2*2 B/s) = 1.000 s
    assert(wav.durationMs === 1000L && wav.tracks === 1)
    // 176400 data bytes / 4-byte blocks = 44100 PCM frames
    assert(wav.samples === 44100)
    val mp4 = metas(2L)
    assert(mp4.container === "mp4" && mp4.codec === "isom")
    // 1200 ticks / 600 ticks-per-s = 2.000 s
    assert(mp4.durationMs === 2000L)
    assert((mp4.width, mp4.height, mp4.tracks) === (320, 240, 1))
    // this hand-rolled MP4 carries no sample table → 0, not a guess
    assert(mp4.samples === 0)
    assert(metas(3L).container === "unknown" && metas(3L).durationMs === -1L)
    // the two-tier triple decode picks up real MP4 dimensions too
    assert(Multimodal.decode(makeMp4(600, 1200, 320, 240)) === ((320, 240, 1)))
    // stsz sample counts parse through the full mdia/minf/stbl descent
    val withStsz = Multimodal.synthMp4(600, 1200, 64, 48, samples = 77)
    assert(Multimodal.decodeMp4(withStsz).get.samples === 77)
    assert(Multimodal.decode(withStsz) === ((64, 48, 77)))
  }

  test("REAL sample decode: decodePcm reads back the exact int16 " +
      "stream, matching a direct fold of the generating formula") {
    val (ch, sr, frames, seed) = (2, 16000, 333, 42L)
    val bytes = Multimodal.synthPcmWav(ch, sr, frames, seed)
    val st = Multimodal.decodePcm(bytes).get
    val n = frames * ch
    val samples = (0 until n).map(i =>
      ((seed * 131L + i * 17L) % 65536L) - 32768L)
    assert(st.channels === ch && st.sampleRate === sr)
    assert(st.nSamples === n.toLong)
    assert(st.peak === samples.map(math.abs).max)
    assert(st.sumAbs === samples.map(math.abs).sum)
    assert(st.sumSq === samples.map(s => s * s).sum)
    val zc = samples.sliding(2).count(p => (p(0) < 0) != (p(1) < 0))
    assert(st.zeroCrossings === zc.toLong)
    // the header-only parser and the sample decoder agree on metadata
    val meta = Multimodal.decodeWav(bytes).get
    assert(meta.channels === ch && meta.sampleRate === sr)
    assert(meta.samples === frames) // PCM frames, not interleaved samples
    // non-PCM / truncated / garbage → None, never a throw
    assert(Multimodal.decodePcm(bytes.take(50)).isEmpty)
    assert(Multimodal.decodePcm("junk".getBytes("UTF-8")).isEmpty)
    val float = bytes.clone()
    float(20) = 3 // fmt tag → ieee_float: sample decode must decline
    assert(Multimodal.decodePcm(float).isEmpty)
  }

  test("windowed PCM stats: gated fixture yields exactly the gated " +
      "silent windows, matching a direct fold of the formula") {
    val (ch, sr, frames, seed, win) = (2, 12000, 405, 7L, 80)
    val bytes = Multimodal.synthGatedPcmWav(ch, sr, frames, seed, win)
    val st = Multimodal.pcmWindowStats(bytes, win, 512).get
    val n = frames * ch
    val samples = (0 until n).map { i =>
      if ((i / win) % 2 == 1) 0L
      else ((seed * 131L + i * 17L) % 65536L) - 32768L
    }
    val windows = samples.grouped(win).toSeq
    assert(st.channels === ch && st.sampleRate === sr)
    assert(st.nWindows === windows.length)
    assert(st.silentWindows ===
      windows.count(_.map(math.abs).max < 512))
    assert(st.maxWinSumAbs === windows.map(_.map(math.abs).sum).max)
    assert(st.peak === samples.map(math.abs).max)
    // the last window is short (810 % 80 = 10 samples) — boundary math
    assert(n % win !== 0)
    // non-PCM bytes decline
    assert(Multimodal.pcmWindowStats("junk".getBytes, win, 512).isEmpty)
  }

  test("averageHash round-trips a real PNG encode/decode with exact " +
      "pixel arithmetic") {
    val seed = 99L
    val png = Multimodal.synthPng(8, 8, seed)
    // it really is a PNG (magic) decoded by the real reader
    assert((png(1) & 0xff) === 'P'.toInt)
    val h = Multimodal.averageHash(png).get
    val g = for (y <- 0 until 8; x <- 0 until 8)
      yield ((seed * 31L + x * 7L + y * 13L) % 256L).toInt
    val mean = (g.map(_.toLong).sum / 64L).toInt
    assert(h.mean === mean)
    assert(h.nAbove === g.count(_ > mean))
    val expLo = g.zipWithIndex.collect {
      case (v, i) if v > mean && i < 32 => 1L << i }.sum
    val expHi = g.zipWithIndex.collect {
      case (v, i) if v > mean && i >= 32 => 1L << (i - 32) }.sum
    assert(h.hashLo === expLo && h.hashHi === expHi)
    // non-8×8 input goes through the real resize path and still hashes
    val big = Multimodal.synthPng(32, 32, seed)
    assert(Multimodal.averageHash(big).isDefined)
    // garbage declines instead of throwing
    assert(Multimodal.averageHash("nope".getBytes).isEmpty)
  }

  test("synthMp4 emits exactly 276 bytes (video_frame_sample oracle " +
      "slice arithmetic depends on it)") {
    assert(Multimodal.synthMp4(1000, 5000, 64, 48, samples = 9).length === 276)
  }

  test("MJPEG-in-AVI round trip: real JPEG frames mux into a real AVI " +
      "and demux back with exact per-frame decoded dimensions") {
    val dims = Seq((16, 24), (32, 16), (24, 32), (17, 19)) // odd sizes too
    val jpegs = dims.zipWithIndex.map { case ((w, h), i) =>
      Multimodal.synthJpeg(w, h, seed = 7L * i + 3)
    }
    // frames really are JPEGs (SOI marker) from the real encoder
    jpegs.foreach { j =>
      assert((j(0) & 0xff) === 0xff && (j(1) & 0xff) === 0xd8)
    }
    val avi = Multimodal.synthAvi(jpegs, w = 32, h = 32)
    assert(new String(avi.slice(8, 12), "US-ASCII") === "AVI ")
    val frames = Multimodal.decodeAviFrames(avi).get
    assert(frames.length === dims.length)
    frames.zip(dims).zipWithIndex.foreach { case ((f, (w, h)), i) =>
      assert(f.frameIdx === i)
      assert(f.width === w, s"frame $i width")
      assert(f.height === h, s"frame $i height")
      assert(f.byteLen === jpegs(i).length)
    }
    // non-AVI bytes decline
    assert(Multimodal.decodeAviFrames("junk".getBytes).isEmpty)
    assert(Multimodal.decodeAviFrames(
      Multimodal.synthWav(1, 8000, 16)).isEmpty)
    // a corrupt frame makes the CLIP decline (strict contract)
    val bad = avi.clone()
    // find the first frame chunk's payload start and wreck its header
    val moviAt = {
      var o = 12; var at = -1
      while (at < 0 && o + 12 <= bad.length) {
        if (new String(bad.slice(o, o + 4), "US-ASCII") == "LIST" &&
            new String(bad.slice(o + 8, o + 12), "US-ASCII") == "movi")
          at = o
        else {
          val sz = java.nio.ByteBuffer.wrap(bad, o + 4, 4)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
          o += 8 + sz + (sz & 1)
        }
      }
      at
    }
    assert(moviAt > 0)
    bad(moviAt + 12 + 8) = 0 // first 00dc payload byte: kill the SOI
    bad(moviAt + 12 + 9) = 0
    assert(Multimodal.decodeAviFrames(bad).isEmpty)
    // truncations never throw
    (0 until avi.length by 97).foreach { n =>
      Multimodal.decodeAviFrames(java.util.Arrays.copyOf(avi, n))
    }
  }

  test("DIB-in-AVI round trip: bottom-up rows, BGR, and stride padding " +
      "all decode back to the exact logical gray pixels") {
    val (w, h) = (10, 6) // stride 32 > 30: padding is really exercised
    val grays = (0 until 3).map(f =>
      Array.tabulate(w * h)(i => (f * 59 + i * 7) % 256))
    val frames = grays.map(Multimodal.synthDibFrame(_, w, h))
    assert(frames.head.length === 32 * h)
    // byte-level pin: the FIRST stored row is the LAST logical row —
    // a missing flip in BOTH mux and demux would cancel; this can't
    val lastLogical = grays.head.slice((h - 1) * w, h * w)
    (0 until w).foreach { x =>
      assert((frames.head(x * 3) & 0xff) === lastLogical(x))
    }
    val avi = Multimodal.synthAviDib(frames, w, h)
    val dec = Multimodal.decodeDibFrames(avi).get
    assert(dec.length === 3)
    dec.zip(grays).zipWithIndex.foreach { case ((fr, g), i) =>
      assert(fr.frameIdx === i && fr.width === w && fr.height === h)
      assert(fr.gray.toSeq === g.toSeq, s"frame $i pixels") // luma(g,g,g)=g
    }
    // grayHash over 60 pixels packs bits 0..59 exactly
    val hsh = Multimodal.grayHash(dec.head.gray)
    val mean = (dec.head.gray.map(_.toLong).sum / 60L).toInt
    assert(hsh.mean === mean)
    assert(hsh.nAbove === dec.head.gray.count(_ > mean))
    // the MJPEG decoder declines a DIB stream and vice versa
    assert(Multimodal.decodeAviFrames(avi).isEmpty)
    val jpegAvi = Multimodal.synthAvi(
      Seq(Multimodal.synthJpeg(8, 8, 1L)), 8, 8)
    assert(Multimodal.decodeDibFrames(jpegAvi).isEmpty)
    // wrong-size frame chunk → whole clip declines (strict)
    val badAvi = Multimodal.synthAviDib(
      frames.head.take(32 * h - 32) +: frames.tail, w, h)
    assert(Multimodal.decodeDibFrames(badAvi).isEmpty)
    // truncations never throw
    (0 until avi.length by 89).foreach { n =>
      Multimodal.decodeDibFrames(java.util.Arrays.copyOf(avi, n))
    }
  }

  test("pcmEnergyFingerprint: rise bits match a direct fold, gain " +
      "invariance holds, and degenerate inputs decline") {
    val samples = Array.tabulate[Short](5200)(i =>
      (((7L * 131L + i * 17L) % 65536L) - 32768L).toShort)
    val wav = Multimodal.synthPcmWavSamples(1, 8000, samples)
    val fp = Multimodal.pcmEnergyFingerprint(wav, 80).get
    assert(fp.nWindows === 65 && fp.nBits === 64)
    val e = samples.map(s => math.abs(s.toLong)).grouped(80)
      .map(_.sum).toArray
    (0 until 64).foreach { w =>
      val bit =
        if (w < 32) (fp.hashLo >> w) & 1L else (fp.hashHi >> (w - 32)) & 1L
      assert(bit === (if (e(w + 1) > e(w)) 1L else 0L), s"bit $w")
    }
    // halving every sample halves energies but keeps every rise bit —
    // the gain invariance that makes the bits a dedup key
    val half = Multimodal.synthPcmWavSamples(1, 8000,
      samples.map(s => (s / 2).toShort))
    val fph = Multimodal.pcmEnergyFingerprint(half, 80).get
    assert(fph.hashHi === fp.hashHi && fph.hashLo === fp.hashLo)
    // fewer than two complete windows, or garbage → None
    assert(Multimodal.pcmEnergyFingerprint(
      Multimodal.synthPcmWavSamples(1, 8000, new Array[Short](79)), 80).isEmpty)
    assert(Multimodal.pcmEnergyFingerprint("junk".getBytes, 80).isEmpty)
  }

  test("boxDownscale2x + decodeGray: the 16->8 PNG round trip is " +
      "pixel-exact against a direct fold") {
    val g16 = Array.tabulate(256)(i => (i * 7 + 3) % 256)
    val png = Multimodal.synthPngGray(g16, 16, 16)
    val (w, h, back) = Multimodal.decodeGray(png).get
    assert(w === 16 && h === 16 && back.toSeq === g16.toSeq)
    val small = Multimodal.boxDownscale2x(back, 16, 16)
    val want = for (y <- 0 until 8; x <- 0 until 8) yield
      (g16(2 * y * 16 + 2 * x) + g16(2 * y * 16 + 2 * x + 1) +
        g16((2 * y + 1) * 16 + 2 * x) +
        g16((2 * y + 1) * 16 + 2 * x + 1)) / 4
    assert(small.toSeq === want)
    // re-encode and re-decode: still exact (PNG lossless both trips)
    val (_, _, g2) = Multimodal.decodeGray(
      Multimodal.synthPngGray(small, 8, 8)).get
    assert(g2.toSeq === want)
    assert(Multimodal.decodeGray("junk".getBytes).isEmpty)
  }

  test("resamplePcmHalf: sample-exact pair means, half rate, and " +
      "stereo/garbage decline") {
    val samples = Array.tabulate[Short](481)(i => // odd count: tail drops
      (((11L * 131L + i * 17L) % 65536L) - 32768L).toShort)
    val wav = Multimodal.synthPcmWavSamples(1, 16000, samples)
    val half = Multimodal.resamplePcmHalf(wav).get
    val st = Multimodal.decodePcm(half).get
    assert(st.sampleRate === 8000 && st.nSamples === 240L)
    val want = (0 until 240).map(j =>
      (samples(2 * j).toLong + samples(2 * j + 1).toLong) / 2)
    assert(st.sumAbs === want.map(math.abs).sum)
    assert(st.peak === want.map(math.abs).max)
    // negative odd sums truncate toward zero (matches SQL //)
    assert((-7L + 0L) / 2L === -3L)
    val stereo = Multimodal.synthPcmWav(2, 16000, 100, 5L)
    assert(Multimodal.resamplePcmHalf(stereo).isEmpty)
    assert(Multimodal.resamplePcmHalf("junk".getBytes).isEmpty)
  }

  test("PNG tEXt chunk surgery: spec-framed insert, CRC-verified " +
      "parse, image still decodes, corruption fails the parse") {
    val png = Multimodal.synthPng(8, 8, 42L)
    val tagged = Multimodal.addPngText(
      Multimodal.addPngText(png, "title", "doc-42"), "lang", "en")
    val kv = Multimodal.readPngText(tagged).get
    assert(kv === Seq("title" -> "doc-42", "lang" -> "en"))
    // the real decoder still accepts the modified file
    val (w, h, _) = Multimodal.decodeGray(tagged).get
    assert(w === 8 && h === 8)
    // plain PNG from the JDK writer carries no tEXt
    assert(Multimodal.readPngText(png).get === Seq())
    // flip one byte inside a tEXt payload: CRC check must fail the parse
    val bad = tagged.clone()
    val idx = {
      val probe = "doc-42".getBytes("ISO-8859-1")
      (0 until bad.length - probe.length).find(o =>
        probe.indices.forall(k => bad(o + k) == probe(k))).get
    }
    bad(idx) = 'X'.toByte
    assert(Multimodal.readPngText(bad).isEmpty)
    assert(Multimodal.readPngText("junk".getBytes).isEmpty)
  }

  test("corrupt/truncated bytes never kill the decode: fall back, not throw") {
    val png = makeImage(20, 20, "png")
    // truncations at every prefix length must degrade silently (the
    // magic still matches a reader for >=8 bytes — the reader then
    // throws on the missing body, which must be swallowed)
    (0 until png.length by 7).foreach { n =>
      val cut = java.util.Arrays.copyOf(png, n)
      Multimodal.decode(cut)       // must not throw
      Multimodal.resizeImage(cut, 8, 8)  // must not throw
    }
    // same for the container parsers: truncated WAV/MP4 headers
    val wav = makeWav(2, 8000, 64)
    val mp4 = makeMp4(600, 600, 64, 64)
    (0 until 44).foreach { n =>
      Multimodal.decodeWav(java.util.Arrays.copyOf(wav, n))
      Multimodal.decodeMp4(java.util.Arrays.copyOf(mp4, n))
    }
  }

  test("hostile RIFF chunk sizes (unsigned wrap) decline instead of " +
      "looping the walker forever") {
    // size 0xFFFFFFF8 wraps to a negative Int: the pre-fix advance
    // `off += 8 + size.toInt` stood still (infinite loop). The walk
    // must return None promptly for every parser that walks RIFF.
    def le(n: Long): Array[Byte] = Array[Byte](
      (n & 0xff).toByte, ((n >> 8) & 0xff).toByte,
      ((n >> 16) & 0xff).toByte, ((n >> 24) & 0xff).toByte)
    def riff(form: String, hostileSize: Long): Array[Byte] =
      "RIFF".getBytes("US-ASCII") ++ le(200) ++ form.getBytes("US-ASCII") ++
        "junk".getBytes("US-ASCII") ++ le(hostileSize) ++ new Array[Byte](64)
    for (sz <- Seq(0xFFFFFFF8L, 0x80000000L, 0xFFFFFFFFL)) {
      assert(Multimodal.decodeWav(riff("WAVE", sz)).isEmpty)
      assert(Multimodal.decodePcm(riff("WAVE", sz)).isEmpty)
      assert(Multimodal.decodeAviFrames(riff("AVI ", sz)).isEmpty)
      assert(Multimodal.decodeDibFrames(riff("AVI ", sz)).isEmpty)
    }
    // hostile frame-chunk size INSIDE a movi list: the inner loops
    // must also refuse to stand still
    val movi = "LIST".getBytes("US-ASCII") ++ le(4 + 8 + 64) ++
      "movi".getBytes("US-ASCII") ++
      "00dc".getBytes("US-ASCII") ++ le(0xFFFFFFF8L) ++ new Array[Byte](64)
    val avi = "RIFF".getBytes("US-ASCII") ++ le(4 + movi.length) ++
      "AVI ".getBytes("US-ASCII") ++ movi
    assert(Multimodal.decodeAviFrames(avi).fold(true)(_.isEmpty))
    assert(Multimodal.decodeDibFrames(avi).isEmpty)
  }

  test("addPngText splices before a WALKED IEND: trailing bytes after " +
      "IEND survive and the tagged file still parses") {
    val png = Multimodal.synthPng(8, 8, 7L)
    // spec-valid: bytes after IEND are not part of the datastream
    val trailing = png ++ "GARBAGE-AFTER-IEND".getBytes("US-ASCII")
    val tagged = Multimodal.addPngText(trailing, "title", "doc-7")
    assert(Multimodal.readPngText(tagged).get === Seq("title" -> "doc-7"))
    val (w, h, _) = Multimodal.decodeGray(tagged).get
    assert(w === 8 && h === 8)
    // the trailing garbage is preserved verbatim at the very end
    assert(new String(tagged.takeRight(18), "US-ASCII") ===
      "GARBAGE-AFTER-IEND")
    // no IEND anywhere -> loud decline, never silent corruption
    intercept[IllegalArgumentException] {
      Multimodal.addPngText("notapng".getBytes, "k", "v")
    }
  }

  test("MP3 frame-header walk: exact frame accounting, ID3v2 skip, " +
      "VBR detection, and strict declines") {
    // CBR round trip: parameters recovered exactly
    val mp3 = Multimodal.synthMp3Frames(5, 128, 44100)
    val m = Multimodal.decodeMp3Meta(mp3).get
    assert(m.bitrateKbps === 128 && m.sampleRate === 44100 &&
      m.nFrames === 5 && m.cbr)
    assert(m.durationMs === 5L * 1152 * 1000 / 44100)
    // frame length is the spec formula: 144000*128/44100 = 417 bytes
    assert(mp3.length === 5 * 417)
    // leading ID3v2 tag is skipped by its syncsafe size
    val tagged = Multimodal.synthMp3Frames(3, 192, 48000, id3Bytes = 300)
    val mt = Multimodal.decodeMp3Meta(tagged).get
    assert(mt.nFrames === 3 && mt.sampleRate === 48000)
    // ID3v2.4 footer flag: the syncsafe size covers the body only, the
    // footer adds 10 trailing bytes the walk must also skip — a
    // spec-valid tag, not a decline
    val footered = Multimodal.synthMp3Frames(3, 192, 48000,
      id3Bytes = 300, id3Footer = true)
    assert(footered.length === tagged.length + 10)
    val mf = Multimodal.decodeMp3Meta(footered).get
    assert(mf.nFrames === 3 && mf.sampleRate === 48000 && mf.cbr)
    // VBR: frames with differing bitrates walk fine, cbr=false
    val vbr = Multimodal.synthMp3Frames(2, 128, 32000) ++
      Multimodal.synthMp3Frames(3, 64, 32000)
    val mv = Multimodal.decodeMp3Meta(vbr).get
    assert(mv.nFrames === 5 && !mv.cbr)
    // strict declines: truncation, desync, reserved bitrate index,
    // rate change mid-stream, trailing garbage
    assert(Multimodal.decodeMp3Meta(mp3.dropRight(1)).isEmpty)
    assert(Multimodal.decodeMp3Meta("junk".getBytes).isEmpty)
    val badIdx = mp3.clone(); badIdx(2) = 0xf0.toByte // bitrate idx 15
    assert(Multimodal.decodeMp3Meta(badIdx).isEmpty)
    val rateFlip = Multimodal.synthMp3Frames(2, 128, 44100) ++
      Multimodal.synthMp3Frames(2, 128, 48000)
    assert(Multimodal.decodeMp3Meta(rateFlip).isEmpty)
    assert(Multimodal.decodeMp3Meta(
      mp3 ++ "tail".getBytes).isEmpty)
  }

  test("IMA-ADPCM: real compressed-sample decode — spec replay agrees, " +
      "block accounting exact, strict declines") {
    val b = Multimodal.synthAdpcmWav(nBlocks = 3, blockAlign = 64,
      sampleRate = 11000, seed = 42L)
    val st = Multimodal.decodeAdpcm(b).get
    assert(st.channels === 1 && st.sampleRate === 11000)
    // per mono block: 1 header sample + (align-4) bytes * 2 nibbles
    assert(st.nSamples === 3L * (1 + 60 * 2))
    assert(st.peak <= 32768 && st.sumSq >= st.sumAbs)
    // independent in-test replay of the public-spec arithmetic over
    // the generating formulas (never touches the bytes)
    val step = Array(7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23,
      25, 28, 31, 34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107,
      118, 130, 143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371,
      408, 449, 494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166,
      1282, 1411, 1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327,
      3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493,
      10442, 11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385,
      24623, 27086, 29794, 32767)
    val adj = Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)
    val samples = scala.collection.mutable.ArrayBuffer.empty[Int]
    for (k <- 0 until 3) {
      var pred = ((42L * 131 + k * 257) % 65536).toInt - 32768
      var idx = ((42L * 13 + k * 29) % 89).toInt
      samples += pred
      for (i <- 0 until 120) {
        val code = ((42L * 31 + k * 17 + i * 7) % 16).toInt
        val s0 = step(idx)
        var diff = s0 >> 3
        if ((code & 1) != 0) diff += s0 >> 2
        if ((code & 2) != 0) diff += s0 >> 1
        if ((code & 4) != 0) diff += s0
        pred = math.max(-32768, math.min(32767,
          if ((code & 8) != 0) pred - diff else pred + diff))
        idx = math.max(0, math.min(88, idx + adj(code)))
        samples += pred
      }
    }
    assert(st.sumAbs === samples.map(v => math.abs(v.toLong)).sum)
    assert(st.sumSq === samples.map(v => v.toLong * v.toLong).sum)
    assert(st.peak === samples.map(v => math.abs(v.toLong)).max)
    // strict declines (quarantine contract): truncation, hostile step
    // index, nonzero reserved byte, stereo
    assert(Multimodal.decodeAdpcm(b.dropRight(1)).isEmpty)
    val badIdx = b.clone(); badIdx(48 + 2) = 100.toByte
    assert(Multimodal.decodeAdpcm(badIdx).isEmpty)
    val badRes = b.clone(); badRes(48 + 3) = 1.toByte
    assert(Multimodal.decodeAdpcm(badRes).isEmpty)
    val stereo = b.clone(); stereo(22) = 2.toByte
    assert(Multimodal.decodeAdpcm(stereo).isEmpty)
    // and plain PCM-16 is not claimed by the ADPCM decoder
    assert(Multimodal.decodeAdpcm(
      Multimodal.synthGatedPcmWav(1, 8000, 100, 1L, 80)).isEmpty)
  }

  test("IMA-ADPCM property: synth -> decode equals the independent " +
      "spec replay for arbitrary seeds and block geometries") {
    // the same two-implementations check as the fixed-seed test, swept
    // across seeds and block sizes (incl. the minimal 8-byte block)
    val step = Array(7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23,
      25, 28, 31, 34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107,
      118, 130, 143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371,
      408, 449, 494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166,
      1282, 1411, 1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327,
      3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493,
      10442, 11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385,
      24623, 27086, 29794, 32767)
    val adj = Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)
    for (seed <- Seq(0L, 1L, 7L, 96L, 97L, 1234567L, 999999937L);
         (nb, align) <- Seq((1, 8), (2, 16), (4, 64), (3, 256))) {
      val st = Multimodal.decodeAdpcm(
        Multimodal.synthAdpcmWav(nb, align, 8000, seed)).get
      var sa = 0L; var ss = 0L; var n = 0L
      for (k <- 0 until nb) {
        var pred = ((seed * 131 + k * 257) % 65536).toInt - 32768
        var idx = ((seed * 13 + k * 29) % 89).toInt
        sa += math.abs(pred.toLong); ss += pred.toLong * pred; n += 1
        for (i <- 0 until (align - 4) * 2) {
          val code = ((seed * 31 + k * 17 + i * 7) % 16).toInt
          val s0 = step(idx)
          var diff = s0 >> 3
          if ((code & 1) != 0) diff += s0 >> 2
          if ((code & 2) != 0) diff += s0 >> 1
          if ((code & 4) != 0) diff += s0
          pred = math.max(-32768, math.min(32767,
            if ((code & 8) != 0) pred - diff else pred + diff))
          idx = math.max(0, math.min(88, idx + adj(code)))
          sa += math.abs(pred.toLong); ss += pred.toLong * pred; n += 1
        }
      }
      assert((st.nSamples, st.sumAbs, st.sumSq) === ((n, sa, ss)),
        s"seed=$seed blocks=$nb align=$align")
    }
  }

  /** Test-local replay of the FLAC fixture's generating formulas —
    * independent of Flac.synthSamples (the two-implementations rule
    * every codec test here follows). */
  private def flacRefSamples(nFrames: Int, blockSize: Int,
      seed: Long): Seq[Int] =
    (0 until nFrames).flatMap { f =>
      (f % 4) match {
        case 0 =>
          val c = (((seed * 131 + f * 257) % 65536 + 65536) % 65536)
            .toInt - 32768
          Seq.fill(blockSize)(c)
        case 1 =>
          (0 until blockSize).map(i =>
            (((seed * 31 + f * 17 + i * 7) % 65536 + 65536) % 65536)
              .toInt - 32768)
        case 2 =>
          val s = new Array[Int](blockSize)
          s(0) = (((seed * 241 + f * 37) % 16384 + 16384) % 16384)
            .toInt - 8192
          for (i <- 1 until blockSize)
            s(i) = s(i - 1) +
              (((seed * 13 + f * 7 + i * 11) % 64 + 64) % 64).toInt - 32
          s.toSeq
        case _ =>
          (0 until blockSize).map(i =>
            (((seed * 29 + f * 23 + i * 5) % 256 + 256) % 256).toInt - 128)
      }
    }

  test("FLAC: real compressed-sample decode — constant/verbatim/fixed " +
      "subframes, Rice residuals, CRCs verified; formula replay agrees") {
    val b = Flac.synthFlac(nFrames = 5, blockSize = 64,
      sampleRate = 22050, seed = 42L)
    val st = Flac.decodeFlac(b).get
    assert(st.channels === 1 && st.sampleRate === 22050)
    assert(st.nSamples === 5L * 64)
    val ref = flacRefSamples(5, 64, 42L)
    assert(st.sumAbs === ref.map(v => math.abs(v.toLong)).sum)
    assert(st.sumSq === ref.map(v => v.toLong * v).sum)
    assert(st.peak === ref.map(v => math.abs(v.toLong)).max)
    val zc = ref.zip(ref.tail).count { case (a, c) => (a < 0) != (c < 0) }
    assert(st.zeroCrossings === zc)
  }

  test("FLAC property: synth -> decode equals the formula replay " +
      "across seeds and geometries") {
    for (seed <- Seq(0L, 1L, 7L, 97L, 1234567L, 999999937L);
         (nf, bs) <- Seq((1, 8), (4, 16), (8, 64), (3, 256))) {
      val st = Flac.decodeFlac(Flac.synthFlac(nf, bs, 8000, seed)).get
      val ref = flacRefSamples(nf, bs, seed)
      assert(st.nSamples === ref.length.toLong, s"seed=$seed $nf x $bs")
      assert(st.sumAbs === ref.map(v => math.abs(v.toLong)).sum,
        s"seed=$seed $nf x $bs")
      assert(st.sumSq === ref.map(v => v.toLong * v).sum,
        s"seed=$seed $nf x $bs")
    }
  }

  /** Test-local replay of the STEREO fixture's generating formulas —
    * independent of Flac.synthStereoSamples (two-implementations
    * rule), folded INTERLEAVED as the decoder and the spec MD5 do. */
  private def flacStereoRefInterleaved(nFrames: Int, blockSize: Int,
      seed: Long): Seq[Int] =
    (0 until nFrames).flatMap { f =>
      def m(v: Long, mod: Long) = (((v % mod) + mod) % mod).toInt
      val l = new Array[Int](blockSize)
      val r = new Array[Int](blockSize)
      l(0) = m(seed * 241 + f * 37, 16384) - 8192
      r(0) = m(seed * 199 + f * 53, 16384) - 8192
      for (i <- 1 until blockSize) {
        l(i) = l(i - 1) + m(seed * 13 + f * 7 + i * 11, 64) - 32
        r(i) = r(i - 1) + m(seed * 17 + f * 29 + i * 5, 64) - 32
      }
      (0 until blockSize).flatMap(i => Seq(l(i), r(i)))
    }

  test("FLAC stereo + LPC: all four channel assignments and both LPC " +
      "orders decode to the formula replay (spec MD5 verified)") {
    for (seed <- Seq(0L, 5L, 42L, 987654321L);
         (nf, bs) <- Seq((4, 32), (8, 64), (5, 256))) {
      val b = Flac.synthFlacStereoLpc(nf, bs, 44100, seed)
      val st = Flac.decodeFlac(b).get
      assert(st.channels === 2 && st.sampleRate === 44100)
      val ref = flacStereoRefInterleaved(nf, bs, seed)
      assert(st.nSamples === ref.length.toLong, s"seed=$seed $nf x $bs")
      assert(st.sumAbs === ref.map(v => math.abs(v.toLong)).sum,
        s"seed=$seed $nf x $bs")
      assert(st.sumSq === ref.map(v => v.toLong * v).sum,
        s"seed=$seed $nf x $bs")
      assert(st.peak === ref.map(v => math.abs(v.toLong)).max)
      val zc = ref.zip(ref.tail).count { case (a, c) => (a < 0) != (c < 0) }
      assert(st.zeroCrossings === zc, s"seed=$seed $nf x $bs")
    }
  }

  test("FLAC stereo stream declines on corruption like the mono path") {
    val b = Flac.synthFlacStereoLpc(6, 64, 22050, 3L)
    assert(Flac.decodeFlac(b.dropRight(1)).isEmpty, "truncated stream")
    for (off <- Seq(60, b.length / 2, b.length - 4)) {
      val bad = b.clone(); bad(off) = (bad(off) ^ 0x08).toByte
      assert(Flac.decodeFlac(bad).isEmpty, s"bit flip at $off")
    }
    // sample-MD5 flip (STREAMINFO offsets 26..41) is invisible to the
    // frame CRCs and must be caught by the stream-level verify
    val badMd5 = b.clone(); badMd5(33) = (badMd5(33) ^ 0x02).toByte
    assert(Flac.decodeFlac(badMd5).isEmpty)
  }

  test("FLAC strict declines (quarantine contract): truncation, bit " +
      "flips caught by CRC, foreign formats not claimed") {
    val b = Flac.synthFlac(4, 64, 16000, 7L)
    assert(Flac.decodeFlac(b.dropRight(1)).isEmpty, "truncated stream")
    // trailing garbage after the last frame: even ONE stray byte is
    // outside the envelope (a clean stream ends with zero bits left)
    assert(Flac.decodeFlac(b :+ 0x00.toByte).isEmpty, "1 trailing byte")
    assert(Flac.decodeFlac(b ++ Array[Byte](0x7f, 0x11)).isEmpty,
      "2 trailing bytes")
    // flip one bit mid-stream: either a header (CRC-8) or frame body
    // (CRC-16) — both must decline, never return wrong samples
    for (off <- Seq(50, b.length / 2, b.length - 3)) {
      val bad = b.clone(); bad(off) = (bad(off) ^ 0x10).toByte
      assert(Flac.decodeFlac(bad).isEmpty, s"bit flip at $off")
    }
    assert(Flac.decodeFlac("junk".getBytes).isEmpty)
    assert(Flac.decodeFlac(Array.empty[Byte]).isEmpty)
    // the spec's stream-level sample MD5 (STREAMINFO bytes 18..33 of
    // the block, i.e. stream offsets 26..41): a flip there is invisible
    // to the frame CRCs and must be caught by the MD5 verify
    val badMd5 = b.clone(); badMd5(30) = (badMd5(30) ^ 0x01).toByte
    assert(Flac.decodeFlac(badMd5).isEmpty,
      "sample-MD5 mismatch must decline")
    // all-zero MD5 = unknown per spec: not verified, clip accepted
    val zeroMd5 = b.clone()
    for (i <- 26 until 42) zeroMd5(i) = 0
    assert(Flac.decodeFlac(zeroMd5).nonEmpty,
      "unknown (all-zero) MD5 is not an integrity failure")
    // other real formats are not claimed by the FLAC decoder
    assert(Flac.decodeFlac(
      Multimodal.synthAdpcmWav(2, 64, 8000, 1L)).isEmpty)
    assert(Flac.decodeFlac(Multimodal.synthPng(8, 8, 1L)).isEmpty)
    // and the WAV decoders do not claim FLAC
    assert(Multimodal.decodePcm(b).isEmpty)
    assert(Multimodal.decodeAdpcm(b).isEmpty)
  }

  test("EXIF: splice -> parse round trip, image still decodes, and " +
      "strict declines (no EXIF / bad magic / truncated value area)") {
    val jpeg = Multimodal.synthJpeg(8, 8, 7L)
    val dt = "2024:03:09 11:22:33"
    val tagged = Multimodal.addJpegExif(jpeg, 6, dt, "camX")
    assert(Multimodal.readJpegExif(tagged) ===
      Some(Multimodal.ExifMeta(6, dt, "camX")))
    // the spliced APP1 is transparent to the decoder
    assert(Multimodal.decodeGray(tagged).map(t => (t._1, t._2)) ===
      Some((8, 8)))
    // no EXIF at all: decline, not a default
    assert(Multimodal.readJpegExif(jpeg).isEmpty)
    // corrupt TIFF magic (the 42 after the byte order): decline
    val badMagic = tagged.clone()
    val tiffAt = {
      // SOI(2) + FFE1(2) + len(2) + "Exif\0\0"(6) -> TIFF header
      12
    }
    badMagic(tiffAt + 2) = 99.toByte
    assert(Multimodal.readJpegExif(badMagic).isEmpty)
    // truncation mid-segment (the length field outruns the bytes):
    // decline at the bounds check, never a partial parse
    assert(Multimodal.readJpegExif(tagged.take(tiffAt + 30)).isEmpty)
    // non-JPEG bytes: decline
    assert(Multimodal.readJpegExif("not a jpeg".getBytes).isEmpty)
  }

  test("sha256 matches Spark's own sha2 over the same bytes") {
    import org.apache.spark.sql.functions._
    val viaSql = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .select(col("doc_id"), sha2(col("text").cast("binary"), 256).as("sha"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val viaLib = Multimodal.documentFeatures(spark, TestSpark.sfDir)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(viaLib === viaSql)
  }
}
