package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Exact-substring duplicate detection via winnowing fingerprints —
  * the character-level dedup tier (find *verbatim repeated spans*, not
  * near-duplicate documents) that training-data pipelines run alongside
  * document-level MinHash (Lee et al. 2022, "Deduplicating Training
  * Data Makes Language Models Better", arXiv:2107.06499, use suffix
  * arrays for the single-machine form; Schleimer/Wilkerson/Aiken 2003,
  * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD,
  * give the distribution-friendly one used here).
  *
  * The reference library has no analogue — its closest surface is a
  * word-count MapReduce over text lines (mapreduce/main.py:61-76);
  * this module exists for the 100 TB training-data north star.
  *
  * Algorithm. Slide a k-char window over each document; hash every
  * k-gram (md5 — deterministic and engine-identical, so the DuckDB
  * oracle replays selection bit-for-bit). From each run of `w`
  * consecutive gram hashes select the RIGHTMOST MINIMUM as an anchor
  * (classic winnowing). Two guarantees follow, both content-local, so
  * two copies of the same text at DIFFERENT offsets in different
  * documents select the same anchors:
  *   - any duplicated substring of length >= w + k - 1 contains a full
  *     gram window in each copy, and each copy selects the same gram
  *     from it -> every sufficiently long verbatim duplicate is caught
  *     (no false negatives above the threshold);
  *   - density is ~2/(w+1) of positions, so the shuffled anchor
  *     relation is a small constant fraction of corpus characters.
  * Anchors carry the gram STRING, so a cross-document match means the
  * k chars are truly equal (no hash false positives); at 100 TB the
  * payload would switch to (xxhash64, length) with a collision rate of
  * ~n²/2⁶⁴ accepted or re-verified against the corpus by position.
  *
  * Scale contract: anchor generation is a linear per-partition scan
  * (monotone-deque sliding minimum, O(chars) per document, no
  * shuffle); duplicate detection is ONE exchange keyed on the gram;
  * span merging is a per-document window (partitioned by doc_id,
  * thousands of parallel groups, each a handful of rows). Nothing is
  * quadratic in documents or characters.
  */
object SubstringDedup {

  /** Defaults: k=20-char grams, w=11-gram windows -> any verbatim
    * duplicate of >= 30 chars is guaranteed caught. */
  val DefaultK = 20
  val DefaultW = 11

  /** Winnowing anchor positions for one text: 1-based gram positions
    * (matching SQL `substr`), rightmost-minimum per full window of `w`
    * gram hashes. Texts shorter than w + k - 1 chars have no full
    * window and yield nothing — correct, because they cannot contain a
    * duplicate of threshold length either.
    *
    * Hashes stay RAW 16-byte md5 digests: unsigned byte-wise order is
    * exactly the lexicographic order of the lowercase-hex encoding the
    * DuckDB oracle compares (each byte's two hex digits are monotone in
    * the byte value, fixed width), so selection is bit-identical to the
    * oracle's `min(md5hex || inverted-pos)` with zero hex encoding in
    * the hot path. For ASCII text (char index == UTF-8 byte offset)
    * each gram digests straight from the shared byte array — no
    * per-gram substring/encode; non-ASCII text falls back to per-gram
    * encoding, preserving "md5 of the gram's UTF-8 bytes" exactly.
    *
    * Sliding minimum is the textbook monotone deque: each index is
    * pushed and popped at most once, O(grams) total. Rightmost
    * tie-break = "pop equal keys from the back", which also makes the
    * selection independent of absolute position (both copies of a
    * duplicated window keep the same RELATIVE survivor), preserving
    * the guarantee even when a window contains the same gram twice. */
  private[functions] def winnowPositions(
      text: String, k: Int, w: Int): Seq[(Int, String)] = {
    val n = text.length
    val m = n - k + 1
    if (m < w) return Nil
    val md = java.security.MessageDigest.getInstance("MD5")
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val direct = bytes.length == n // pure ASCII: char index == byte offset
    val hashes = new Array[Array[Byte]](m)
    var i = 0
    while (i < m) {
      if (direct) md.update(bytes, i, k)
      else md.update(text.substring(i, i + k)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      hashes(i) = md.digest() // finalizes AND resets the digest
      i += 1
    }
    @inline def geq(a: Array[Byte], b: Array[Byte]): Boolean =
      java.util.Arrays.compareUnsigned(a, b) >= 0
    val out = scala.collection.mutable.LinkedHashSet.empty[Int]
    val dq = new java.util.ArrayDeque[Int]() // indices, hashes increasing
    i = 0
    while (i < m) {
      // rightmost tie-break: an equal hash arriving later evicts the
      // earlier one, so the deque head is always the rightmost minimum
      while (!dq.isEmpty && geq(hashes(dq.peekLast), hashes(i))) dq.pollLast()
      dq.addLast(i)
      if (dq.peekFirst <= i - w) dq.pollFirst()
      if (i >= w - 1) out += dq.peekFirst
      i += 1
    }
    // gram strings materialize only for the ~2/(w+1) selected anchors
    out.toSeq.map(p => (p + 1, text.substring(p, p + k)))
  }

  private val HexDigits = "0123456789ABCDEF".getBytes(
    java.nio.charset.StandardCharsets.US_ASCII)

  /** BYTE-based winnowing anchors for one text: positions are 1-based
    * offsets into the UTF-8 ENCODING, grams are the k bytes in
    * uppercase hex — the multibyte-corpus variant that removes the
    * char-vs-byte indexing caveat (`substr` in the oracle slices the
    * blob's hex string: byte p ↦ hex offset 2p-1, k bytes ↦ 2k hex
    * chars, so both engines hash the identical VARCHAR). Guarantee:
    * any verbatim duplicate of >= w + k - 1 BYTES shares an anchor —
    * the same bound in bytes that the char variant gives in chars,
    * now independent of the corpus's encoding width. */
  private[functions] def winnowBytePositions(
      text: String, k: Int, w: Int): Seq[(Int, String)] = {
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = bytes.length
    val m = n - k + 1
    if (m < w) return Nil
    // hex encoding once per doc; gram i digests hexBytes[2i, 2i+2k)
    val hexBytes = new Array[Byte](2 * n)
    var b = 0
    while (b < n) {
      val v = bytes(b) & 0xff
      hexBytes(2 * b) = HexDigits(v >>> 4)
      hexBytes(2 * b + 1) = HexDigits(v & 0xf)
      b += 1
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    val hashes = new Array[Array[Byte]](m)
    var i = 0
    while (i < m) {
      md.update(hexBytes, 2 * i, 2 * k)
      hashes(i) = md.digest()
      i += 1
    }
    @inline def geq(a: Array[Byte], bb: Array[Byte]): Boolean =
      java.util.Arrays.compareUnsigned(a, bb) >= 0
    val out = scala.collection.mutable.LinkedHashSet.empty[Int]
    val dq = new java.util.ArrayDeque[Int]()
    i = 0
    while (i < m) {
      while (!dq.isEmpty && geq(hashes(dq.peekLast), hashes(i))) dq.pollLast()
      dq.addLast(i)
      if (dq.peekFirst <= i - w) dq.pollFirst()
      if (i >= w - 1) out += dq.peekFirst
      i += 1
    }
    out.toSeq.map(p => (p + 1, new String(hexBytes, 2 * p, 2 * k,
      java.nio.charset.StandardCharsets.US_ASCII)))
  }

  /** Byte-based anchor relation (doc_id, pos, g): [[anchors]] over the
    * UTF-8 encoding — pos is a byte offset, g the hex-encoded gram.
    * Feed the result to the same [[duplicatedAnchors]] /
    * [[duplicatedSpans]] chain (span bounds then measure BYTES). */
  def anchorsBytes(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = DefaultK,
      w: Int = DefaultW): DataFrame = {
    require(k >= 1 && w >= 1)
    anchorRelation(df, idCol, textCol)(winnowBytePositions(_, k, w))
  }

  /** Shared anchor-scan scaffolding for [[anchors]]/[[anchorsBytes]]:
    * integral-id validation (a silent cast("long") would map
    * string/UUID ids to null and collapse every document onto one
    * key), the parallelism-aware spread (the CPU-bound winnowing scan
    * must never pin to one core on a small-file input — at real scale
    * the corpus already has >= parallelism partitions and no shuffle
    * happens), and the per-text flatMap. */
  private def anchorRelation(df: DataFrame, idCol: String,
      textCol: String)(perText: String => Seq[(Int, String)]): DataFrame = {
    val idType = df.schema(idCol).dataType
    require(Seq("byte", "short", "integer", "long")
        .contains(idType.typeName),
      s"anchor scan: id column '$idCol' must be an integral type, got " +
        s"${idType.typeName}; hash or dense-rank non-numeric ids first")
    val sp = df.sparkSession
    import sp.implicits._
    val target = sp.sparkContext.defaultParallelism
    val base = df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
    val spread =
      if (base.rdd.getNumPartitions < target) base.repartition(target)
      else base
    spread
      .flatMap { case (id, text) =>
        perText(text).map { case (p, g) => (id, p, g) }
      }
      .toDF(idCol, "pos", "g")
  }

  /** Anchor relation (doc_id, pos, g): winnowing fingerprints of every
    * document. One linear pass; shuffle-free EXCEPT when the input
    * arrives in fewer partitions than the session's parallelism (the
    * local small-file case: one parquet row-group = one partition
    * would pin the whole CPU-bound winnowing scan to one core), where
    * a round-robin repartition spreads it first — at real scale the
    * corpus already has >= parallelism partitions and no shuffle
    * happens. */
  def anchors(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = DefaultK,
      w: Int = DefaultW): DataFrame = {
    require(k >= 1 && w >= 1)
    anchorRelation(df, idCol, textCol)(winnowPositions(_, k, w))
  }

  /** Anchors whose gram recurs — selected at >= 2 distinct (doc, pos)
    * sites anywhere in the corpus (cross-document AND within-document
    * repetition both count, as in exact-substring dedup). ONE exchange
    * keyed on the gram; the recurring-gram set is duplicate-rate-
    * proportional (tiny for real corpora), hence the broadcast
    * semi-join back, mirroring TextDedup.pairableShingles — a corpus
    * with a pathological dup rate would drop the hint and let AQE
    * choose. */
  def duplicatedAnchors(anch: DataFrame): DataFrame = {
    val hot = anch.groupBy(col("g")).agg(count(lit(1)).as("nd"))
      .filter(col("nd") > 1).select(col("g"))
      .localCheckpoint(true)
    anch.join(broadcast(hot), Seq("g"), "leftsemi")
  }

  /** Incremental ingest report: each batch anchor labeled against the
    * indexed corpus's anchor-gram set, aggregated per batch document —
    * (doc_id, n_corpus_dup, n_batch_dup, n_new). corpus_dup = the gram
    * is indexed; batch_dup = an earlier batch anchor ((doc_id, pos)
    * order — keep-first) carries the same gram; new otherwise. One
    * gram-keyed equi join against the index relation plus a gram-keyed
    * window over BATCH anchors only: per-ingest cost tracks the batch,
    * never the corpus (the index is a materialized table between
    * ingests — the anchor analogue of the LSH band index).
    *
    * `priorIngestGrams` (streaming use): grams already seen in EARLIER
    * micro-batches of the SAME logical ingest. Anchors matching them
    * (and not the corpus index) label `batch_dup` regardless of their
    * within-batch rank, so splitting one ingest across micro-batches
    * that arrive in (doc_id, pos) order produces labels identical to
    * the one-batch run — the batch-split invariance the streaming
    * wrapper relies on. Defaults to None (pure batch semantics). */
  def incrementalDedup(indexGrams: DataFrame, batchAnchors: DataFrame,
      idCol: String = "doc_id",
      priorIngestGrams: Option[DataFrame] = None): DataFrame = {
    val idx = indexGrams.select(col("g")).distinct()
      .withColumn("in_idx", lit(1))
    val byGram = Window.partitionBy(col("g"))
      .orderBy(col(idCol), col("pos"))
    val withPrior = priorIngestGrams match {
      case Some(pg) =>
        batchAnchors.join(
          pg.select(col("g")).distinct().withColumn("in_prior", lit(1)),
          Seq("g"), "left")
      case None => batchAnchors.withColumn("in_prior", lit(null))
    }
    withPrior.join(idx, Seq("g"), "left")
      .withColumn("rn", row_number().over(byGram))
      .groupBy(col(idCol))
      .agg(
        sum(when(col("in_idx") === 1, 1L).otherwise(0L))
          .as("n_corpus_dup"),
        sum(when(col("in_idx").isNull &&
            (col("in_prior") === 1 || col("rn") > 1), 1L).otherwise(0L))
          .as("n_batch_dup"),
        sum(when(col("in_idx").isNull && col("in_prior").isNull &&
            col("rn") === 1, 1L).otherwise(0L))
          .as("n_new"))
  }

  /** Scrubbed corpus: every duplicated span removed from every
    * document (the CCNet-style boilerplate cut — repeated content
    * contributes nothing to training, so it goes everywhere it
    * appears; a keep-one policy would thread a canonical-holder
    * choice through the span join and is a caller-side variant).
    *
    * Reconstruction is relational: each span row yields the kept
    * segment BEFORE it (from the previous span's end + 1), a final
    * per-doc segment covers the tail, segments cut `substring` from
    * the rejoined text, and a per-doc sort + join stitches them. The
    * stitch is an `array_join(transform(array_sort(...)))` over the
    * handful of per-doc segments — an interpreted lambda at a per-ROW
    * site (bounded by spans-per-doc, never per-pair; same contract as
    * the other allowed per-row lambda sites in PlanSpec).
    *
    * Returns (doc_id, text_scrubbed) for EVERY document — docs with
    * no duplicated span pass through unchanged.
    *
    * `spans` feeds TWO plan branches (the per-span pre-segments and
    * the per-doc tail aggregate): pass it localCheckpointed when it
    * derives from an expensive pipeline, as the `substr_dedup_scrub`
    * check query does, or Spark recomputes the whole anchor chain per
    * branch.
    *
    * PRECONDITION: `spans` must be per-document NON-OVERLAPPING and
    * merged (adjacent/overlapping intervals coalesced), exactly what
    * `duplicatedSpans` produces — the lag-based segment reconstruction
    * derives each kept segment from the PREVIOUS span's end, so raw
    * overlapping spans would emit overlapping kept segments and
    * duplicate characters in the output. Callers with raw intervals
    * must run them through `duplicatedSpans`-style islands merging
    * first. */
  def scrub(df: DataFrame, spans: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("span_start"))
    // kept segment before each span + one tail segment per touched doc
    val pre = spans
      .withColumn("seg_start",
        coalesce(lag(col("span_end"), 1).over(byDoc) + 1, lit(1)))
      .select(col(idCol), col("seg_start"), (col("span_start") - 1).as("seg_end"))
    val tail = spans.groupBy(col(idCol))
      .agg((max(col("span_end")) + 1).as("seg_start"))
      .withColumn("seg_end", lit(Int.MaxValue))
    val segs = pre.unionByName(tail)
      .filter(col("seg_end") >= col("seg_start"))
    val touched = segs
      .join(df.select(col(idCol), col(textCol)), Seq(idCol))
      .select(col(idCol),
        expr(s"substring($textCol, seg_start, " +
          s"greatest(least(seg_end, length($textCol)) - seg_start + 1, 0))")
          .as("seg"),
        col("seg_start"))
      .groupBy(col(idCol))
      .agg(expr("array_join(transform(array_sort(collect_list(" +
        "struct(seg_start, seg))), x -> x.seg), '')").as("text_scrubbed"))
    df.select(col(idCol), col(textCol))
      .join(touched, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("text_scrubbed"), col(textCol)).as("text_scrubbed"))
  }

  /** Duplicated spans per document: each duplicated anchor covers
    * chars [pos, pos+k-1]; overlapping-or-adjacent intervals merge
    * (gaps-and-islands over a per-document window — parallel across
    * documents, a handful of rows each). Returns
    * (doc_id, span_start, span_end) with 1-based inclusive bounds. */
  def duplicatedSpans(dup: DataFrame, idCol: String = "doc_id",
      k: Int = DefaultK): DataFrame = {
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    dup.select(col(idCol), col("pos"), (col("pos") + (k - 1)).as("end"))
      .withColumn("prev_max_end",
        max(col("end")).over(byDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_island",
        when(col("prev_max_end").isNull ||
          col("pos") > col("prev_max_end") + 1, 1).otherwise(0))
      .withColumn("island",
        sum(col("new_island")).over(byDoc.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(idCol), col("island"))
      .agg(min(col("pos")).as("span_start"), max(col("end")).as("span_end"))
      .drop("island")
  }
}
