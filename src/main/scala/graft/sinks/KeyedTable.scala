package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Keyed upsert ("merge into") over a hash-bucketed parquet table — the
  * DatastoreOutput semantics (reference outputs/DatastoreOutput.java:1-50
  * performs keyed entity upserts, batched through
  * DatastoreMutationPool.java:56).
  *
  * Layout: the table directory is partitioned by `__bucket =
  * pmod(xxhash64(key), numBuckets)`. An upsert batch therefore touches
  * only the buckets its keys hash into: those partitions are read,
  * merged (updates win by key), and rewritten under
  * partitionOverwriteMode=dynamic — untouched buckets' files are never
  * read or rewritten, which is what makes a small mutation batch
  * against a 100 TB table O(batch), not O(table). Each bucket rewrite
  * goes through Spark's commit protocol (task-attempt tmp + rename), so
  * a retried writer never leaves a partially-applied bucket — the same
  * exactly-once contract the reference gets from datastore transactions.
  *
  * numBuckets trades batch-write amplification (each touched bucket is
  * rewritten whole) against small-file count; a real deployment sizes
  * it so a bucket ≈ a few hundred MB.
  */
object KeyedTable {

  private def bucket(keyCol: String, numBuckets: Int) =
    pmod(xxhash64(col(keyCol)), lit(numBuckets.toLong)).cast("int")

  /** Single-writer enforcement. The merge-into protocol reads the
    * touched buckets and rewrites them under a dynamic-partition
    * overwrite; two writers interleaving those phases would silently
    * lose one writer's rows (read-modify-write with no isolation — the
    * reference got transactional batching from the Datastore itself,
    * `outputs/DatastoreOutput.java:1-50`). Full snapshot isolation
    * needs a table format; what this guard promises is strictly less
    * but loud: a second concurrent writer FAILS with a clear error
    * instead of corrupting the table. The lock is an atomically-created
    * marker file (`FileSystem.createNewFile` — atomic on HDFS and
    * local FS alike) holding writer/host/time for diagnosis; a crashed
    * writer leaves a stale lock that must be cleared explicitly with
    * [[clearLock]] — failing closed is the point. */
  private def withTableLock[T](spark: SparkSession, dir: String)(body: => T): T = {
    val path = new org.apache.hadoop.fs.Path(dir, "_graft_write_lock")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val created =
      try fs.createNewFile(path)
      catch { case _: java.io.IOException => false }
    if (!created) {
      val holder =
        try {
          val in = fs.open(path)
          try {
            val buf = new Array[Byte](256)
            val n = in.read(buf)
            new String(buf, 0, math.max(n, 0), "UTF-8")
          } finally in.close()
        } catch { case scala.util.control.NonFatal(_) => "<unreadable>" }
      throw new IllegalStateException(
        s"KeyedTable at $dir is locked by another writer [$holder] — " +
          "concurrent upserts are not isolated and would corrupt the " +
          "table; wait for the writer, or clearLock() if it crashed")
    }
    try {
      val out = fs.create(path, true)
      try out.write(
        s"pid=${ProcessHandle.current().pid()} host=${
          java.net.InetAddress.getLocalHost.getHostName} t=${
          System.currentTimeMillis()}".getBytes("UTF-8"))
      finally out.close()
      body
    } finally fs.delete(path, false)
  }

  /** Remove a stale writer lock left by a crashed writer. Only safe
    * once the operator has confirmed no writer is alive. */
  def clearLock(spark: SparkSession, dir: String): Unit = {
    val path = new org.apache.hadoop.fs.Path(dir, "_graft_write_lock")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(path, false)
  }

  /** Create (or replace) the bucketed table from a full snapshot. */
  def create(df: DataFrame, dir: String, keyCol: String,
      numBuckets: Int = 16): Unit =
    df.withColumn("__bucket", bucket(keyCol, numBuckets))
      .write.mode(SaveMode.Overwrite).partitionBy("__bucket").parquet(dir)

  /** Read the table back without the physical bucket column. */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir).drop("__bucket")

  /** Apply a keyed mutation batch: rows whose key exists are replaced,
    * new keys are inserted (entity put semantics — the reference has no
    * partial-property update either). Idempotent: re-applying the same
    * batch is a no-op. Schema of `updates` must match the table's.
    *
    * Plan shape: updates are checkpointed (they may derive from this
    * very table), touched buckets are discovered from the (bounded)
    * bucket set, survivors come from an anti join of ONLY those
    * partitions (partition pruning asserted in OutputsSpec), and the
    * merged rows are checkpointed before the dynamic-partition
    * overwrite so no task reads a file the commit is about to replace. */
  def upsert(spark: SparkSession, dir: String, updates: DataFrame,
      keyCol: String, numBuckets: Int = 16): Unit = withTableLock(spark, dir) {
    val up = updates.withColumn("__bucket", bucket(keyCol, numBuckets))
      .localCheckpoint(true)
    val touched = up.select("__bucket").distinct()
      .collect().map(_.getInt(0)).sorted // bounded by numBuckets
    val existing = spark.read.parquet(dir)
      .filter(col("__bucket").isin(touched.map(Integer.valueOf).toIndexedSeq: _*))
    val survivors = existing.join(
      broadcast(up.select(col(keyCol))), Seq(keyCol), "left_anti")
    val merged = up.unionByName(survivors).localCheckpoint(true)
    val key = "spark.sql.sources.partitionOverwriteMode"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try merged.write.mode(SaveMode.Overwrite).partitionBy("__bucket").parquet(dir)
    finally old.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }
}
