package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic content-hash sampling operators — the reproducible
  * alternative to `rand()`/`df.sample`: membership depends only on the
  * row key (md5, identical across engines), so a sample is stable
  * across runs, task retries, cluster sizes, and engines. The property
  * a training pipeline needs: re-running a 100 TB job reproduces the
  * exact same train/val/test membership.
  */
object Sampling {

  /** First hex nibble of md5(key) — a uniform 16-way bucket id. */
  def hashNibble(key: Column): Column =
    substring(md5(key.cast("string")), 1, 1)

  /** Keep rows whose key hashes into the first `sixteenths` of the
    * 16 buckets (e.g. 1 → a 1/16 sample, 4 → 1/4). */
  def hashSample(df: DataFrame, key: Column, sixteenths: Int = 1): DataFrame = {
    require(sixteenths >= 1 && sixteenths <= 16)
    val hi = "0123456789abcdef" (sixteenths - 1).toString
    df.filter(hashNibble(key).between("0", hi))
  }

  /** Deterministic train/val/test split assignment: a `split` column
    * from the key's hash nibble — 12/2/2 sixteenths by default (75%
    * train, 12.5% val, 12.5% test). */
  def splitColumn(key: Column, trainSixteenths: Int = 12,
      valSixteenths: Int = 2): Column = {
    require(trainSixteenths >= 1 && valSixteenths >= 1
      && trainSixteenths + valSixteenths < 16)
    val hex = "0123456789abcdef"
    val trainHi = hex(trainSixteenths - 1).toString
    val valSet = (trainSixteenths until trainSixteenths + valSixteenths)
      .map(hex(_).toString)
    when(hashNibble(key).between("0", trainHi), "train")
      .when(hashNibble(key).isin(valSet: _*), "val")
      .otherwise("test")
  }

  /** Deterministic stratified sample: the first `perStratum` rows of
    * each stratum in content-hash order (key tiebreak) — equal-size
    * per-stratum samples, reproducible and skew-proof. One window
    * shuffle on the stratum key; a stratum bigger than an executor's
    * row budget would pre-filter with `hashSample` first. */
  def stratified(df: DataFrame, stratum: Column, key: Column,
      perStratum: Int): DataFrame = {
    val w = Window.partitionBy(stratum)
      .orderBy(md5(key.cast("string")), key)
    df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= perStratum).drop("rn")
  }
}
