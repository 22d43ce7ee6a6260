package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.TestSpark

/** Unit tests for the TextDedup operators on tiny in-memory corpora —
  * the oracle gate covers the 3-gram defaults end-to-end; these pin
  * the parameterized forms and edge behavior. */
class TextDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def corpus(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("shingles: n-gram generality and short-doc exclusion") {
    val df = corpus(
      1L -> "a b c d",     // bigrams: a b, b c, c d
      2L -> "x",           // too short for n=2
      3L -> "a  b")        // double space collapses: one bigram
    val got = TextDedup.shingles(df, n = 2).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === Set((1L, "a b"), (1L, "b c"), (1L, "c d"), (3L, "a b")))
  }

  test("shingles are distinct per doc") {
    val got = TextDedup.shingles(corpus(1L -> "a b a b a b"), n = 2)
      .collect().map(_.getString(1)).sorted
    assert(got.toSeq === Seq("a b", "b a"))
  }

  test("jaccardPairs finds exact duplicates and respects the threshold") {
    val df = corpus(
      1L -> "w1 w2 w3 w4 w5 w6",
      2L -> "w1 w2 w3 w4 w5 w6",   // exact dup of 1
      3L -> "z1 z2 z3 z4 z5 z6")   // disjoint
    val pairs = TextDedup.jaccardPairs(TextDedup.shingles(df))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("stopListedShingles drops only grams above maxDF; dedup signal " +
      "on clone pairs survives") {
    val df = corpus(
      1L -> "boiler plate header w1 w2 w3 w4",
      2L -> "boiler plate header w1 w2 w3 w4",  // clone of 1
      3L -> "boiler plate header z1 z2 z3 z4",
      4L -> "boiler plate header y1 y2 y3 y4",
      5L -> "boiler plate header q1 q2 q3 q4")
    val sh = TextDedup.shingles(df)
    // "boiler plate header" has df=5 — the only gram above maxDF=4
    val kept = TextDedup.stopListedShingles(sh, maxDF = 4)
    val dropped = sh.count() - kept.count()
    assert(dropped === 5, "exactly the df=5 gram's rows leave")
    assert(kept.filter(col("s") === "boiler plate header").count() === 0)
    // the clone pair is still found without the boilerplate gram
    val pairs = TextDedup.jaccardPairs(kept)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
    // maxDF >= max df is the identity
    assert(TextDedup.stopListedShingles(sh, maxDF = 5).count() === sh.count())
  }

  test("lshVerifiedPairs agrees with exhaustive jaccardPairs here") {
    val df = corpus(
      1L -> "w1 w2 w3 w4 w5 w6 w7 w8",
      2L -> "w1 w2 w3 w4 w5 w6 w7 w8",
      3L -> "w1 w2 w3 w4 w5 w6 w7 different",
      4L -> "q1 q2 q3 q4 q5 q6 q7 q8")
    val sh = TextDedup.shingles(df)
    val exact = TextDedup.jaccardPairs(sh)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = TextDedup.lshVerifiedPairs(sh)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // identical docs share every band bucket, so recall is total here;
    // verification guarantees precision
    assert(lsh === exact)
  }

  test("lshVerifiedPairs broadcast gate: the un-hinted fallback is " +
      "result-identical and actually plans no broadcast of the candidates") {
    val df = corpus(
      1L -> "w1 w2 w3 w4 w5 w6 w7 w8",
      2L -> "w1 w2 w3 w4 w5 w6 w7 w8",
      3L -> "w1 w2 w3 w4 w5 w6 w7 different",
      4L -> "q1 q2 q3 q4 q5 q6 q7 q8")
    val sh = TextDedup.shingles(df)
    val hinted = TextDedup.lshVerifiedPairs(sh)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // gate = 0 forces the fallback path: every candidate set exceeds it
    val fallback = TextDedup.lshVerifiedPairs(sh, maxBroadcastCandidates = 0L)
    assert(fallback.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      === hinted)
    // and the fallback plan carries no builder-forced broadcast hint
    // (AQE may still legitimately choose a broadcast join on size)
    val analyzed = fallback.queryExecution.analyzed.toString
    assert(!analyzed.contains("ResolvedHint"),
      s"fallback plan still carries a broadcast hint:\n$analyzed")
  }

  test("chunkDedup drops cross-doc duplicate chunks and its broadcast " +
      "gate fallback is result-identical and un-hinted") {
    // 4-token chunks: docs 1 and 2 share their FIRST chunk exactly, so
    // it is dropped from both; every other chunk is unique and survives
    val df = corpus(
      1L -> "c1 c2 c3 c4 a1 a2 a3 a4",
      2L -> "c1 c2 c3 c4 b1 b2 b3 b4",
      3L -> "z1 z2 z3 z4")
    def rows(gate: Long) =
      TextDedup.chunkDedup(df, chunkTokens = 4, maxBroadcastDupChunks = gate)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val hinted = rows(100000L)
    assert(hinted.map { case (id, n, _) => (id, n) } ===
      Set((1L, 1L), (2L, 1L), (3L, 1L)), "shared chunk leaves both docs")
    // surviving text differs doc by doc -> doc_sigs are all distinct
    assert(hinted.map(_._3).size === 3)
    // gate = 0 forces the fallback: identical rows, no forced hint
    assert(rows(0L) === hinted)
    val fallback =
      TextDedup.chunkDedup(df, chunkTokens = 4, maxBroadcastDupChunks = 0L)
    val analyzed = fallback.queryExecution.analyzed.toString
    assert(!analyzed.contains("ResolvedHint"),
      s"fallback plan still carries a broadcast hint:\n$analyzed")
  }

  test("incrementalDedup broadcast gate: fallback is result-identical") {
    val docs = corpus(
      1L -> "w1 w2 w3 w4 w5 w6 w7 w8",
      3L -> "q1 q2 q3 q4 q5 q6 q7 q8",
      2L -> "w1 w2 w3 w4 w5 w6 w7 w8",
      8L -> "m1 m2 m3 m4 m5 m6 m7 m8")
    val sh = TextDedup.shingles(docs)
    val isBatch = col("doc_id") % 2 === 0
    def run(gate: Long) = TextDedup.incrementalDedup(
        corpusSh = sh.where(!isBatch),
        batchSh = sh.where(isBatch),
        batchIds = docs.where(isBatch).select(col("doc_id")),
        maxBroadcastCandidates = gate)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(run(0L) === run(100000L))
  }

  test("incrementalDedup labels batch docs against the corpus index") {
    import spark.implicits._
    // corpus: 1, 3; batch: 2 (dup of 1), 4 (dup of 6? no — unique),
    // 6 and 8 near-dups of each other (batch-internal, keep-first)
    val docs = corpus(
      1L -> "w1 w2 w3 w4 w5 w6 w7 w8",
      3L -> "q1 q2 q3 q4 q5 q6 q7 q8",
      2L -> "w1 w2 w3 w4 w5 w6 w7 w8",
      4L -> "z1 z2 z3 z4 z5 z6 z7 z8",
      6L -> "m1 m2 m3 m4 m5 m6 m7 m8",
      8L -> "m1 m2 m3 m4 m5 m6 m7 m8")
    val sh = TextDedup.shingles(docs)
    val isBatch = col("doc_id") % 2 === 0
    val out = TextDedup.incrementalDedup(
        corpusSh = sh.where(!isBatch),
        batchSh = sh.where(isBatch),
        batchIds = docs.where(isBatch).select(col("doc_id")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(out === Set(
      (2L, "corpus_dup", 1L),
      (4L, "new", -1L),
      (6L, "new", -1L),
      (8L, "batch_dup", 6L)))
  }

  test("clusterRepresentatives keeps the max-score doc per cluster") {
    import spark.implicits._
    // two clusters: {1,2,3} labeled 1, {10,11} labeled 10
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("node", "label")
    val docs = Seq((1L, 5L), (2L, 9L), (3L, 9L), (10L, 4L), (11L, 2L))
      .toDF("doc_id", "n_chars")
    val reps = TextDedup.clusterRepresentatives(labels, docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // score tie between 2 and 3 → lower doc_id wins
    assert(reps === Set((1L, 2L, 9L, 3L), (10L, 10L, 4L, 2L)))
  }
}
