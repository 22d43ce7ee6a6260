package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class FingerprintsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bandedHammingPairs: exact dup, near dup within one band, " +
      "cross-band recall miss, and far pair all behave per contract") {
    val base = 0x123456789ABCDEFL
    val hi = (base >>> 32) & 0xFFFFFFFFL
    val lo = base & 0xFFFFFFFFL
    val rows = Seq(
      (1L, hi, lo),                      // reference
      (2L, hi, lo),                      // exact dup: hamming 0
      (3L, hi, lo ^ 0x7L),               // 3 bits, all in band 0 → found
      // 8 bits spread 2 per band: NO band matches → candidate never
      // generated even though hamming 8 could pass a looser threshold
      (4L, hi ^ 0x30003L, lo ^ 0x30003L),
      (5L, ~hi & 0xFFFFFFFFL, ~lo & 0xFFFFFFFFL)) // far: hamming 64
    val pairs = Fingerprints.bandedHammingPairs(
        rows.toDF("id", "hi", "lo"), maxHamming = 8)
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs === Set((1L, 2L, 0), (2L, 3L, 3), (1L, 3L, 3)))
  }

  test("bandedHammingPairs with a group column sums Hamming across " +
      "groups and requires same-group band collisions") {
    val rows = Seq(
      // clip 1: two frames
      (1L, 0, 100L, 200L), (1L, 1, 300L, 400L),
      // clip 2: frame 0 identical, frame 1 differs by 2 bits in lo
      (2L, 0, 100L, 200L), (2L, 1, 300L, 400L ^ 0x3L),
      // clip 3: same hashes as clip 1 but frames SWAPPED — per-group
      // distance is large even though the multiset matches
      (3L, 0, 300L, 400L), (3L, 1, 100L, 200L))
    val pairs = Fingerprints.bandedHammingPairs(
        rows.toDF("id", "g", "hi", "lo"), maxHamming = 4,
        groupCol = Some("g"))
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs.contains((1L, 2L, 2)))
    assert(!pairs.exists(p => p._1 == 1L && p._2 == 3L))
  }

  test("bandedHammingPairs ENFORCES identical group sets: a pair whose " +
      "shared frames match but whose lengths differ is dropped") {
    val rows = Seq(
      // clip 1: two frames
      (1L, 0, 100L, 200L), (1L, 1, 300L, 400L),
      // clip 2: frames 0-1 IDENTICAL to clip 1, but a third frame
      // exists — summing only shared groups would report hamming 0
      // while frame 2 was never compared
      (2L, 0, 100L, 200L), (2L, 1, 300L, 400L), (2L, 2, 555L, 666L),
      // clip 3: identical to clip 1, same length — stays a near-dup
      (3L, 0, 100L, 200L), (3L, 1, 300L, 400L),
      // clip 4: same group COUNT as clip 1 but different group SET
      // ({1,2}): only frame 1 is shared, so count equality alone
      // would not catch it — set equality must
      (4L, 1, 300L, 400L), (4L, 2, 100L, 200L))
    val pairs = Fingerprints.bandedHammingPairs(
        rows.toDF("id", "g", "hi", "lo"), maxHamming = 4,
        groupCol = Some("g"))
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs.contains((1L, 3L, 0)), "equal-length exact dup survives")
    assert(!pairs.exists(p => p._1 == 1L && p._2 == 2L),
      "length-mismatched pair must be dropped, not scored on its prefix")
    assert(!pairs.exists(p => p._1 == 1L && p._2 == 4L),
      "same count but different group set must be dropped")
  }
}
