package graft.functions

import java.sql.Timestamp

/** Typed range splitting — the PropertyRange analogue
  * (reference python/src/mapreduce/property_range.py:164-199 continuous
  * split, :316-423 discrete datetime split;
  * java/.../inputs/DatastoreShardStrategy.java:406 splitRange).
  *
  * In Spark, range sharding of a *scan* is normally Catalyst's job
  * (FilePartition planning + `repartitionByRange`); these helpers exist
  * for the cases the reference used them for — driving range-partitioned
  * work explicitly (per-range queries against an external system,
  * bounded backfills) — plus the reference's over-split + round-robin
  * assignment that fights skew (input_readers.py:716-785: "assign
  * ranges to shards round-robin so a dense subrange doesn't land on one
  * shard").
  */
object Ranges {

  /** Split [lo, hi) into n contiguous, exhaustive, non-overlapping
    * subranges (sizes differ by at most 1). */
  def splitLong(lo: Long, hi: Long, n: Int): Seq[(Long, Long)] = {
    require(n > 0 && hi >= lo)
    val span = hi - lo
    val k = math.min(n.toLong, math.max(span, 1L)).toInt
    (0 until k).map { i =>
      val a = lo + span * i / k
      val b = lo + span * (i + 1) / k
      (a, b)
    }.filter(r => r._2 > r._1 || span == 0)
  }

  /** Continuous double split (property_range.py `_split_float`). */
  def splitDouble(lo: Double, hi: Double, n: Int): Seq[(Double, Double)] = {
    require(n > 0 && hi >= lo)
    (0 until n).map { i =>
      (lo + (hi - lo) * i / n, lo + (hi - lo) * (i + 1) / n)
    }
  }

  /** Discrete datetime split on whole-second boundaries (the reference
    * splits datetimes discretely so range edges are valid values,
    * property_range.py:316-423). */
  def splitTimestamp(lo: Timestamp, hi: Timestamp, n: Int): Seq[(Timestamp, Timestamp)] =
    splitLong(lo.getTime / 1000, hi.getTime / 1000, n)
      .map { case (a, b) => (new Timestamp(a * 1000), new Timestamp(b * 1000)) }

  /** Lexicographic string split: interpolate in the byte space of the
    * first 8 bytes (the reference interpolates in its allowed character
    * space, property_range.py `_split_byte_string`-style). Bounds are
    * prefixes — exhaustive for keys within [lo, hi). */
  def splitString(lo: String, hi: String, n: Int): Seq[(String, String)] = {
    def toNum(s: String): Long = {
      val b = s.getBytes("UTF-8")
      var acc = 0L
      var i = 0
      while (i < 7) { acc = (acc << 8) | (if (i < b.length) b(i) & 0xffL else 0L); i += 1 }
      acc
    }
    def toStr(x: Long): String = {
      val b = new Array[Byte](7)
      var i = 0
      while (i < 7) { b(i) = ((x >>> (8 * (6 - i))) & 0xff).toByte; i += 1 }
      new String(b.takeWhile(_ != 0), "ISO-8859-1")
    }
    val bounds = splitLong(toNum(lo), toNum(hi), n)
    bounds.zipWithIndex.map { case ((a, b), i) =>
      val left = if (i == 0) lo else toStr(a)
      val right = if (i == bounds.size - 1) hi else toStr(b)
      (left, right)
    }
  }

  /** Over-split + round-robin shard assignment (the reference's skew
    * mitigation): split into oversplitFactor×shards subranges and deal
    * them round-robin, so a dense subrange shares its shard with sparse
    * ones. Returns one list of subranges per shard. */
  def oversplitRoundRobin(lo: Long, hi: Long, shards: Int,
      oversplitFactor: Int = 4): Seq[Seq[(Long, Long)]] = {
    require(shards > 0 && oversplitFactor > 0)
    val subs = splitLong(lo, hi, shards * oversplitFactor)
    (0 until shards).map(s => subs.zipWithIndex.collect {
      case (r, i) if i % shards == s => r
    })
  }
}
