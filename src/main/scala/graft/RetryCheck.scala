package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, concat, lit}
import java.util.concurrent.atomic.AtomicInteger

/** Fault-injection check (SURVEY.md §5(f) — the RougeMapper analogue,
  * reference EndToEndTest.java:400-697): a mapper whose first attempt on
  * every partition throws, run under `local[4,3]` so Spark's task retry
  * (the reference's slice/shard retry taxonomy) re-executes it.
  *
  * Asserts the semantics the reference encodes:
  *  - OUTPUT is exactly-once: retried tasks replace, never duplicate
  *    (Spark lineage + task commit = the reference's idempotent slice
  *    re-enqueue with deterministic task names);
  *  - COUNTERS are exactly-once under task FAILURE: accumulator updates
  *    from failed attempts are discarded (matching the reference's
  *    per-shard aggregation). The at-least-once caveat documented in
  *    mr.Counters applies to lineage RECOMPUTE: a second action over an
  *    uncached transformation re-runs it and counts again.
  *
  * Runs as its own main because the retry-enabled master must be set at
  * SparkContext creation — it cannot share the test suite's session.
  */
object RetryCheck {
  // per-JVM attempt tracker: first attempt of each partition fails
  val attempts = new java.util.concurrent.ConcurrentHashMap[Int, AtomicInteger]()
  // separate trackers for the upsert/delete write-path scenarios
  val upsertAttempts = new java.util.concurrent.ConcurrentHashMap[Int, AtomicInteger]()
  val deleteAttempts = new java.util.concurrent.ConcurrentHashMap[Int, AtomicInteger]()
  val versionedAttempts = new java.util.concurrent.ConcurrentHashMap[Int, AtomicInteger]()
  val mergeAttempts = new java.util.concurrent.ConcurrentHashMap[Int, AtomicInteger]()

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4, 3]") // 4 threads, 3 task failures tolerated
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val counters = new graft.mr.Counters(spark)
    val processed = counters.counter("records-processed")

    val ds = spark.range(0, 1000, 1, 4).as[Long]
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val n = attempts.computeIfAbsent(pid, _ => new AtomicInteger(0))
          .incrementAndGet()
        it.map { x =>
          processed.add(1L)
          if (n == 1 && x % 250 == 249) // fail late in the first attempt,
            throw new RuntimeException(s"injected failure, partition $pid")
          x * 2
        }
      }

    val out = ds.collect()
    val ok1 = out.length == 1000 && out.toSet == (0L until 1000L).map(_ * 2).toSet
    // every partition ran twice (1 failed + 1 successful attempt)
    val ok2 = attempts.size == 4 &&
      attempts.values.stream.allMatch(a => a.get == 2)
    // failed-attempt updates were discarded: exactly 1000 despite retries
    val exactUnderFailure = counters.value("records-processed") == 1000L
    // a second action recomputes the uncached lineage → counts again
    ds.count()
    val overOnRecompute = counters.value("records-processed") == 2000L

    println(s"[retry-check] exactly-once-output=$ok1 " +
      s"all-partitions-retried=$ok2 " +
      s"counters-exact-under-failure=$exactUnderFailure " +
      s"counters-overcount-on-recompute=$overOnRecompute " +
      s"final-counter=${counters.value("records-processed")}")

    // --- keyed-upsert sink under injected write-path failures ---
    // (reference DatastoreOutput applies mutations transactionally; the
    // Spark analogue is task retry + the file-commit protocol: a batch
    // whose computation fails mid-task must still apply exactly once)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-retry-upsert").toString + "/t"
    val base = spark.range(0, 100).select(col("id").as("k"),
      concat(lit("v"), col("id")).as("v"))
    graft.sinks.KeyedTable.create(base, dir, "k")
    val updates = spark.range(0, 20, 1, 4).as[Long]
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val n = upsertAttempts.computeIfAbsent(pid, _ => new AtomicInteger(0))
          .incrementAndGet()
        it.flatMap { x =>
          if (n == 1 && x % 5 == 4)
            throw new RuntimeException(s"injected upsert failure, partition $pid")
          Seq((x * 5, s"U${x * 5}"), (x * 5 + 1000, s"I${x * 5 + 1000}"))
        }
      }.toDF("k", "v")
    graft.sinks.KeyedTable.upsert(spark, dir, updates, "k")
    val got = graft.sinks.KeyedTable.read(spark, dir)
      .as[(Long, String)].collect().toMap
    val expected =
      (0L until 100L).map(k =>
        k -> (if (k % 5 == 0) s"U$k" else s"v$k")).toMap ++
      (0L until 20L).map(x => (x * 5 + 1000) -> s"I${x * 5 + 1000}").toMap
    val upsertOk = got == expected
    val upsertRetried = upsertAttempts.size == 4 &&
      upsertAttempts.values.stream.allMatch(a => a.get == 2)
    println(s"[retry-check] upsert-exactly-once=$upsertOk " +
      s"upsert-partitions-retried=$upsertRetried rows=${got.size}")

    // --- keyed-delete under injected key-computation failures ---
    // (the right-to-be-forgotten path must hold the same exactly-once
    // contract: a doomed-key batch whose computation fails mid-task
    // deletes each named key exactly once after retry — never a
    // partial deletion, never a resurrected row)
    val doomed = spark.range(0, 100, 1, 4).as[Long]
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val n = deleteAttempts.computeIfAbsent(pid, _ => new AtomicInteger(0))
          .incrementAndGet()
        it.flatMap { x =>
          if (n == 1 && x % 25 == 24)
            throw new RuntimeException(s"injected delete failure, partition $pid")
          if (x % 3 == 0) Some(x) else None
        }
      }.toDF("k")
    graft.sinks.KeyedTable.delete(spark, dir, doomed, "k")
    val afterDelete = graft.sinks.KeyedTable.read(spark, dir)
      .as[(Long, String)].collect().toMap
    val expectedAfterDelete = expected.filter {
      case (k, _) => !(k < 100 && k % 3 == 0)
    }
    val deleteOk = afterDelete == expectedAfterDelete
    val deleteRetried = deleteAttempts.size == 4 &&
      deleteAttempts.values.stream.allMatch(a => a.get == 2)
    println(s"[retry-check] delete-exactly-once=$deleteOk " +
      s"delete-partitions-retried=$deleteRetried rows=${afterDelete.size}")

    // --- VERSIONED store under injected write-path failures ---
    // (the optimistic MVCC path: a mutation whose batch computation
    // fails mid-task must still commit exactly one new version with
    // exactly the batch's puts — task retry happens BELOW the manifest
    // CAS, so the log shows one commit, never a half-written one)
    val vdir = java.nio.file.Files
      .createTempDirectory("graft-retry-versioned").toString + "/t"
    graft.sinks.VersionedKeyedTable.create(base, vdir, "k")
    val vUpdates = spark.range(0, 20, 1, 4).as[Long]
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val n = versionedAttempts
          .computeIfAbsent(pid, _ => new AtomicInteger(0)).incrementAndGet()
        it.flatMap { x =>
          if (n == 1 && x % 5 == 4)
            throw new RuntimeException(
              s"injected versioned failure, partition $pid")
          Seq((x * 5, s"U${x * 5}"), (x * 5 + 1000, s"I${x * 5 + 1000}"))
        }
      }.toDF("k", "v")
    graft.sinks.VersionedKeyedTable.upsert(spark, vdir, vUpdates, "k")
    val vGot = graft.sinks.VersionedKeyedTable.read(spark, vdir)
      .as[(Long, String)].collect().toMap
    val versionedOk = vGot == expected
    val versionedRetried = versionedAttempts.size == 4 &&
      versionedAttempts.values.stream.allMatch(a => a.get == 2)
    val oneCommit =
      graft.sinks.VersionedKeyedTable.snapshot(spark, vdir).version == 2L
    println(s"[retry-check] versioned-exactly-once=$versionedOk " +
      s"versioned-partitions-retried=$versionedRetried " +
      s"versioned-one-commit=$oneCommit rows=${vGot.size}")

    // --- three-clause MERGE under injected source failures ---
    // (the merge's full-outer remerge runs inside the same optimistic
    // protocol: a source whose computation fails mid-task must apply
    // each clause exactly once after retry — deletes don't double,
    // updates don't compound, inserts don't duplicate, and the log
    // shows ONE new version)
    val mSource = spark.range(0, 40, 1, 4).as[Long]
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val n = mergeAttempts
          .computeIfAbsent(pid, _ => new AtomicInteger(0)).incrementAndGet()
        it.map { x =>
          if (n == 1 && x % 10 == 9)
            throw new RuntimeException(
              s"injected merge failure, partition $pid")
          // keys 0,3,6..117: k%2==0 -> matched (k<100) or insert;
          // flag deletes every k%4==0 matched row
          (x * 3, s"M${x * 3}", x * 3 % 4 == 0)
        }
      }.toDF("k", "v", "del")
    graft.sinks.VersionedKeyedTable.merge(spark, vdir, mSource, "k",
      whenMatchedDelete = Some(col("s.del")),
      whenMatchedUpdate = Map("v" ->
        concat(col("t.v"), lit("+"), col("s.v"))))
    val mGot = graft.sinks.VersionedKeyedTable.read(spark, vdir)
      .select(col("k"), col("v")).as[(Long, String)].collect().toMap
    val mKeys = (0L until 40L).map(_ * 3)
    val mExpected = (expected -- mKeys.filter(k => k < 1100 &&
        expected.contains(k) && k % 4 == 0)) ++
      mKeys.filter(k => expected.contains(k) && k % 4 != 0)
        .map(k => k -> s"${expected(k)}+M$k") ++
      mKeys.filterNot(expected.contains).map(k => k -> s"M$k")
    val mergeOk = mGot == mExpected
    val mergeRetried = mergeAttempts.size == 4 &&
      mergeAttempts.values.stream.allMatch(a => a.get == 2)
    val mergeOneCommit =
      graft.sinks.VersionedKeyedTable.snapshot(spark, vdir).version == 3L
    println(s"[retry-check] merge-exactly-once=$mergeOk " +
      s"merge-partitions-retried=$mergeRetried " +
      s"merge-one-commit=$mergeOneCommit rows=${mGot.size}")

    spark.stop()
    if (!(ok1 && ok2 && exactUnderFailure && overOnRecompute &&
      upsertOk && upsertRetried && deleteOk && deleteRetried &&
      versionedOk && versionedRetried && oneCommit &&
      mergeOk && mergeRetried && mergeOneCommit)) sys.exit(1)
  }
}
