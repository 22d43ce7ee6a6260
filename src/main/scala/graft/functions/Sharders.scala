package graft.functions

import org.apache.spark.Partitioner
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** Sharders — key→shard assignment (reference Sharder.java:1-24).
  *
  * The reference's HashingSharder (impl/HashingSharder.java:17-40) uses
  * murmur3_32 of the serialized key and **range division, not modulo**, so
  * a key's shard is stable when the shard count is a divisor-multiple —
  * `shard = (hash - MIN) / ceil(range / n)`. Spark's HashPartitioner
  * (modulo) is semantics-equivalent for correctness; the division variant
  * is provided for byte-level parity when needed (SURVEY.md §4 row 6).
  */
object Sharders {

  /** Murmur3-division sharder over pre-hashed ints, matching
    * HashingSharder.java:33-39: treat the hash as unsigned-ish by offset
    * from Int.MinValue and divide the space into n equal ranges. */
  def divisionShard(hash: Int, numShards: Int): Int = {
    val span = (1L << 32) / numShards + (if ((1L << 32) % numShards == 0) 0 else 1)
    (((hash.toLong - Int.MinValue.toLong)) / span).toInt
  }

  /** RDD-level Partitioner with murmur3-division semantics (keys hashed
    * via their UTF-8 serialized form, as the reference hashes the
    * marshalled key bytes). */
  class HashingSharder(numShards: Int) extends Partitioner {
    require(numShards > 0)
    def numPartitions: Int = numShards
    def getPartition(key: Any): Int = {
      val s = UTF8String.fromString(String.valueOf(key))
      val h = Murmur3_x86_32.hashUnsafeBytes(
        s.getBaseObject, s.getBaseOffset, s.numBytes(), 0)
      divisionShard(h, numShards)
    }
  }

  /** Column-level shard assignment using Spark's codegen'd murmur3 `hash`
    * — the declarative form: `df.repartition(n, shardCol)` or
    * `withColumn("shard", shardColumn(key, n))`. Modulo variant (Spark
    * default, non-negative). */
  def shardColumn(key: Column, numShards: Int): Column =
    pmod(hash(key), lit(numShards))
}
