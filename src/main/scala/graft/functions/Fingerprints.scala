package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded-Hamming near-dup join over 64-bit perceptual fingerprints —
  * the LSH candidates-then-verify architecture applied to fixed-width
  * hashes (image aHash, acoustic energy-rise bits, per-frame video
  * hashes). Shared by `image_neardup` / `audio_neardup` /
  * `video_neardup` and probed by ScaleCheck.
  *
  * Scale contract (100 TB): candidates come from ONE equi join keyed by
  * (group, band, 16-bit band value) — cost tracks actual collisions,
  * never pairs²; the exact bit_count(xor) verify touches candidates
  * only. Recall: with 4 bands, pairs within Hamming distance 3 are
  * GUARANTEED candidates (pigeonhole); beyond that, found iff some band
  * is untouched — the standard LSH recall trade, and the caller's
  * oracle replays the same semantics so the approximation itself is
  * checkable.
  */
object Fingerprints {

  /** Near-dup pairs (doc_a < doc_b, total Hamming <= maxHamming) from a
    * fingerprint relation with columns `id: Long, hi: Long, lo: Long`
    * (the 64-bit hash as two 32-bit halves, both non-negative) and
    * optionally `groupCol` — a per-entity sub-fingerprint key (e.g.
    * video frame index). With a group column, candidates must collide
    * within the same group and the verify SUMS Hamming distance across
    * all groups of the pair (entities must have identical group sets,
    * as fixed-length clips do). */
  def bandedHammingPairs(hashes: DataFrame, maxHamming: Int,
      groupCol: Option[String] = None): DataFrame = {
    require(maxHamming >= 0, s"maxHamming must be >= 0, got $maxHamming")
    val withG = groupCol match {
      case Some(c) => hashes.withColumn("_g", col(c))
      case None => hashes.withColumn("_g", lit(0))
    }
    val bands = withG.select(col("id"), col("_g"), explode(array(
        struct(lit(0).as("b"), col("lo").bitwiseAND(lit(65535L)).as("bv")),
        struct(lit(1).as("b"), shiftright(col("lo"), 16).as("bv")),
        struct(lit(2).as("b"), col("hi").bitwiseAND(lit(65535L)).as("bv")),
        struct(lit(3).as("b"), shiftright(col("hi"), 16).as("bv"))))
        .as("e"))
      .select(col("id"), col("_g"), col("e.b").as("b"), col("e.bv").as("bv"))
    val cand = bands.as("a").join(bands.as("c"),
        col("a._g") === col("c._g") && col("a.b") === col("c.b") &&
          col("a.bv") === col("c.bv") && col("a.id") < col("c.id"))
      .select(col("a.id").as("doc_a"), col("c.id").as("doc_b"))
      .distinct()
    cand
      .join(withG.select(col("id").as("doc_a"), col("_g").as("ga"),
        col("hi").as("ha_hi"), col("lo").as("ha_lo")), "doc_a")
      .join(withG.select(col("id").as("b_doc"), col("_g").as("gb"),
        col("hi").as("hb_hi"), col("lo").as("hb_lo")),
        col("doc_b") === col("b_doc") && col("ga") === col("gb"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(sum(bit_count(col("ha_hi").bitwiseXOR(col("hb_hi"))) +
        bit_count(col("ha_lo").bitwiseXOR(col("hb_lo"))))
        .cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }
}
