package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Pins the winnowing selection rule (vs a naive per-window argmin
  * reference), the detection guarantee (any verbatim duplicate of
  * length >= w+k-1 is caught at any offset), and span merging. */
class SubstringDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def corpus(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  /** Naive reference: for every full window, the rightmost position
    * achieving the minimum md5 — the definition the deque implements
    * and the DuckDB oracle encodes via its composite min-key. */
  private def naiveWinnow(text: String, k: Int, w: Int): Set[Int] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val m = text.length - k + 1
    if (m < w) return Set.empty
    val h = (0 until m).map { i =>
      md.digest(text.substring(i, i + k).getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
    }
    (0 to m - w).map { t =>
      (t until t + w).minBy(i => (h(i), -i))
    }.toSet.map((p: Int) => p + 1)
  }

  /** Deterministic filler over a 3-letter lowercase alphabet disjoint
    * per seed (bases a, d, g, ...) — planted duplicates below use
    * UPPERCASE letters, so filler can never collide with them or, for
    * k-gram purposes, across seeds. */
  private def filler(seed: Int, n: Int): String = {
    val rnd = new scala.util.Random(seed)
    val base = 'a' + (3 * seed) % 24
    (0 until n).map(_ => (base + rnd.nextInt(3)).toChar).mkString
  }

  test("winnowPositions matches the naive per-window argmin on random text") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 20) {
      val n = 30 + rnd.nextInt(400)
      val text = (0 until n).map(_ => ('a' + rnd.nextInt(5)).toChar).mkString
      val k = 1 + rnd.nextInt(8)
      val w = 2 + rnd.nextInt(9)
      val got = SubstringDedup.winnowPositions(text, k, w).map(_._1).toSet
      assert(got === naiveWinnow(text, k, w), s"trial $trial k=$k w=$w")
    }
  }

  test("winnowPositions non-ASCII fallback: multibyte text matches the " +
      "naive reference and positions stay CHAR-indexed") {
    val rnd = new scala.util.Random(1234)
    val alphabet = "abcdeéüñ中日ß"
    for (trial <- 1 to 10) {
      val n = 40 + rnd.nextInt(200)
      val text = (0 until n)
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      assert(text.getBytes("UTF-8").length > text.length,
        "fixture must actually exercise the non-ASCII path")
      val k = 3 + rnd.nextInt(5)
      val w = 2 + rnd.nextInt(7)
      val got = SubstringDedup.winnowPositions(text, k, w)
      assert(got.map(_._1).toSet === naiveWinnow(text, k, w),
        s"trial $trial k=$k w=$w")
      got.foreach { case (p, g) =>
        assert(text.substring(p - 1, p - 1 + k) === g) }
    }
  }

  test("coverage: every full window of w grams contains an anchor") {
    val rnd = new scala.util.Random(7)
    val text = (0 until 500).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    val (k, w) = (5, 8)
    val pos = SubstringDedup.winnowPositions(text, k, w).map(_._1).toSet
    val m = text.length - k + 1
    for (t <- 1 to m - w + 1)
      assert((t until t + w).exists(pos.contains),
        s"window starting at $t has no anchor")
  }

  test("guarantee: a shared substring of exactly w+k-1 chars is caught " +
      "at different offsets, below-threshold overlap is not") {
    val k = 20; val w = 11
    val shared = (0 until (w + k - 1)).map(i => ('P' + i % 4).toChar).mkString
    val docA = filler(0, 57) + shared + filler(1, 83)
    val docB = filler(2, 131) + shared + filler(3, 41)
    // below threshold: first k-1 chars of shared only (cannot share a gram)
    val docC = filler(4, 60) + shared.take(k - 1) + filler(5, 60)
    val anch = SubstringDedup.anchors(
      corpus(1L -> docA, 2L -> docB, 3L -> docC), k = k, w = w)
    val dup = SubstringDedup.duplicatedAnchors(anch)
      .select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(dup === Set(1L, 2L),
      "both holders of the full-length duplicate, and only them")
  }

  test("anchors carry the true gram at the reported 1-based position") {
    val rnd = new scala.util.Random(11)
    val text = (0 until 200).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString
    val rows = SubstringDedup.anchors(corpus(9L -> text), k = 7, w = 5)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p = r.getAs[Int]("pos"); val g = r.getAs[String]("g")
      assert(text.substring(p - 1, p - 1 + 7) === g)
    }
  }

  test("short documents (no full gram window) yield no anchors") {
    val df = corpus(1L -> "x" * 29) // w+k-1 = 30 with defaults
    assert(SubstringDedup.anchors(df).count() === 0)
  }

  test("duplicatedSpans merges overlapping and adjacent anchor intervals") {
    import spark.implicits._
    // k=10: [1,10] + [8,17] overlap -> [1,17]; [18,27] starts right at
    // end+1 -> adjacent, merges into [1,27]; [30,39] leaves a gap of
    // two chars (28,29) -> separate
    val dup = Seq((1L, 1), (1L, 8), (1L, 18), (1L, 30), (2L, 5))
      .toDF("doc_id", "pos")
    val spans = SubstringDedup.duplicatedSpans(dup, k = 10)
      .collect().map(r => (r.getLong(0), r.getAs[Int]("span_start"),
        r.getAs[Int]("span_end"))).toSet
    assert(spans === Set((1L, 1, 27), (1L, 30, 39), (2L, 5, 14)))
  }

  test("scrub removes exactly the duplicated spans and passes " +
      "untouched documents through verbatim") {
    val k = 20; val w = 11
    val shared = (0 until 40).map(i => ('P' + i % 4).toChar).mkString
    val a0 = filler(0, 57); val a1 = filler(1, 83)
    val b0 = filler(2, 131); val b1 = filler(3, 41)
    val clean = filler(4, 120)
    val docs = corpus(1L -> (a0 + shared + a1), 2L -> (b0 + shared + b1),
      3L -> clean)
    val anch = SubstringDedup.anchors(docs, k = k, w = w)
    val spans = SubstringDedup.duplicatedSpans(
      SubstringDedup.duplicatedAnchors(anch), k = k)
    val out = SubstringDedup.scrub(docs, spans)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(3L) === clean, "untouched doc is verbatim")
    for (id <- Seq(1L, 2L)) {
      assert(!out(id).contains(shared.substring(0, k)),
        s"doc $id still contains a duplicated gram")
      // scrub only cuts characters, never reorders: the result is a
      // subsequence of the original made of the two filler blocks
      // (anchors can't start in pure filler, so at most k-1 chars of
      // filler adjacent to the span are lost)
      val (f0, f1) = if (id == 1L) (a0, a1) else (b0, b1)
      assert(out(id).startsWith(f0.take(f0.length - k)),
        s"doc $id prefix filler survives")
      assert(out(id).endsWith(f1.drop(k)),
        s"doc $id suffix filler survives")
      assert(out(id).length < (f0 + shared + f1).length)
    }
  }

  test("anchors spread a single-partition input across the session's " +
      "parallelism (the CPU-bound winnowing scan must never pin to one " +
      "core on a small-file input)") {
    import spark.implicits._
    val docs = (1L to 40L)
      .map(i => (i, filler((i % 8).toInt, 120))).toDF("doc_id", "text")
      .coalesce(1)
    assert(docs.rdd.getNumPartitions === 1)
    val parts = SubstringDedup.anchors(docs, k = 5, w = 4)
      .rdd.getNumPartitions
    assert(parts >= spark.sparkContext.defaultParallelism,
      s"winnowing ran in $parts partition(s)")
  }

  test("incrementalDedup labels corpus_dup, batch_dup (keep-first by " +
      "doc order), and new") {
    // NON-periodic planted strings (a periodic plant repeats its own
    // grams within one doc, which is a genuine within-batch dup and
    // muddies the keep-first assertion)
    val r1 = new scala.util.Random(101)
    val s1 = (0 until 40).map(_ => ('P' + r1.nextInt(4)).toChar).mkString
    val s2 = (0 until 40).map(_ => ('T' + r1.nextInt(4)).toChar).mkString
    val corpusDoc = filler(0, 60) + s1 + filler(1, 60)
    val docs = corpus(
      1L -> corpusDoc,                                        // index
      4L -> (filler(2, 60) + s1 + filler(3, 40) + s2 + filler(4, 40)),
      8L -> (filler(5, 60) + s2 + filler(6, 60)),
      12L -> filler(7, 120))
    val isBatch = org.apache.spark.sql.functions.col("doc_id") % 4 === 0
    val rep = SubstringDedup.incrementalDedup(
        indexGrams = SubstringDedup.anchors(docs.where(!isBatch)),
        batchAnchors = SubstringDedup.anchors(docs.where(isBatch)))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (c4, b4, n4) = rep(4L)
    assert(c4 >= 1, "doc 4 shares s1 with the index")
    assert(b4 === 0, "doc 4 is the FIRST batch holder of s2 — keep-first")
    assert(n4 >= 1, "doc 4's s2 anchors are new")
    val (c8, b8, _) = rep(8L)
    assert(c8 === 0, "doc 8 shares nothing with the index")
    assert(b8 >= 1, "doc 8's s2 anchors duplicate doc 4's (earlier doc)")
    assert(rep(12L)._1 === 0 && rep(12L)._2 === 0 && rep(12L)._3 >= 1,
      "untouched doc is all-new")
  }

  test("incrementalDedup with priorIngestGrams is batch-split-invariant: " +
      "two sequential sub-batches == the one-shot run") {
    val r1 = new scala.util.Random(303)
    val s1 = (0 until 40).map(_ => ('P' + r1.nextInt(4)).toChar).mkString
    val s2 = (0 until 40).map(_ => ('T' + r1.nextInt(4)).toChar).mkString
    val docs = corpus(
      1L -> (filler(0, 60) + s1 + filler(1, 60)),                // index
      4L -> (filler(2, 60) + s1 + filler(3, 40) + s2 + filler(4, 40)),
      8L -> (filler(5, 60) + s2 + filler(6, 60)),
      12L -> filler(7, 120))
    val isBatch = col("doc_id") % 4 === 0
    val idx = SubstringDedup.anchors(docs.where(!isBatch))
      .select(col("g")).distinct()
    def report(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val oneShot = report(SubstringDedup.incrementalDedup(
      indexGrams = idx,
      batchAnchors = SubstringDedup.anchors(docs.where(isBatch))))
    // split the ingest in (doc_id) order: {4} then {8, 12}
    val a1 = SubstringDedup.anchors(docs.where(col("doc_id") === 4))
    val a2 = SubstringDedup.anchors(docs.where(col("doc_id").isin(8, 12)))
    val first = report(SubstringDedup.incrementalDedup(idx, a1))
    val second = report(SubstringDedup.incrementalDedup(idx, a2,
      priorIngestGrams = Some(a1.select(col("g")).distinct())))
    assert(first ++ second === oneShot,
      "micro-batch split labels must equal the one-shot batch labels")
  }

  test("anchors rejects a non-integral id column instead of silently " +
      "casting to null") {
    import spark.implicits._
    val df = Seq(("a", "x" * 60), ("b", "y" * 60)).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      SubstringDedup.anchors(df)
    }
    assert(e.getMessage.contains("integral"))
  }

  test("byte-based winnowing: equals the char tier on pure ASCII " +
      "(hex-gram payloads aside), and on multibyte text positions are " +
      "BYTE offsets with the guarantee measured in bytes") {
    val rnd = new scala.util.Random(55)
    // ASCII: byte offsets == char offsets, selections identical
    val ascii = (0 until 300).map(_ => ('a' + rnd.nextInt(5)).toChar).mkString
    val charSel = SubstringDedup.winnowPositions(ascii, 7, 5)
    val byteSel = SubstringDedup.winnowBytePositions(ascii, 7, 5)
    // selection keys differ (md5 of raw chars vs md5 of hex), so the
    // anchor SETS may differ — but both obey coverage and both carry
    // the true gram; check payload correctness byte-for-byte
    byteSel.foreach { case (p, hexGram) =>
      val bytes = ascii.getBytes("UTF-8")
      val want = bytes.slice(p - 1, p - 1 + 7)
        .map(b => f"${b & 0xff}%02X").mkString
      assert(hexGram === want)
    }
    assert(charSel.nonEmpty && byteSel.nonEmpty)
    // multibyte: two docs share a >= w+k-1 BYTE duplicate that is
    // mostly 2-byte chars; the byte tier must catch it
    val k = 20; val w = 11
    val shared = (0 until 20).map(i => "éüñß".charAt(i % 4)).mkString // 40 bytes
    assert(shared.getBytes("UTF-8").length >= w + k - 1)
    import spark.implicits._
    val docs = Seq(
      (1L, filler(0, 57) + shared + filler(1, 83)),
      (2L, filler(2, 131) + shared + filler(3, 41)),
      (3L, filler(4, 150))).toDF("doc_id", "text")
    val anch = SubstringDedup.anchorsBytes(docs, k = k, w = w)
    val dup = SubstringDedup.duplicatedAnchors(anch)
      .select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(dup === Set(1L, 2L),
      "both holders of the multibyte duplicate, and only them")
    // and every byte anchor's position is a valid UTF-8 byte offset
    // carrying the true hex gram
    val rows = anch.collect()
    val textById = Map(1L -> (filler(0, 57) + shared + filler(1, 83)),
      2L -> (filler(2, 131) + shared + filler(3, 41)),
      3L -> filler(4, 150))
    rows.foreach { r =>
      val bytes = textById(r.getAs[Long]("doc_id")).getBytes("UTF-8")
      val p = r.getAs[Int]("pos")
      val want = bytes.slice(p - 1, p - 1 + k)
        .map(b => f"${b & 0xff}%02X").mkString
      assert(r.getAs[String]("g") === want)
    }
  }

  test("within-document repetition counts as duplicated") {
    val k = 20; val w = 11
    val rep = (0 until (w + k - 1)).map(i => ('Q' + i % 3).toChar).mkString
    val doc = filler(6, 50) + rep + filler(7, 50) + rep + filler(8, 50)
    val anch = SubstringDedup.anchors(corpus(5L -> doc), k = k, w = w)
    val dup = SubstringDedup.duplicatedAnchors(anch)
    assert(dup.count() >= 2, "both copies anchor the repeated gram")
  }
}
