package graft.sinks

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import graft.TestSpark

/** APPLY CHANGES (CDC feed apply): out-of-order and duplicate events
  * converge to highest-sequence-per-key, deletes remove rows, replays
  * are per-row no-ops across batches, stale events never regress, a
  * delete outranks an upsert at an equal sequence, and a NULL stored
  * sequence (plain-upsert provenance) accepts any event. */
class ApplyChangesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft-cdc").toString + "/t"

  private def state(dir: String): Map[Long, (Long, String)] =
    VersionedKeyedTable.read(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getString(2))).toMap

  test("within-batch out-of-order + duplicates converge to latest; " +
      "deletes remove; late insert for an absent key is dropped") {
    val dir = freshDir()
    VersionedKeyedTable.create(
      Seq((1L, 0L, "init"), (2L, 0L, "init")).toDF("k", "seq", "v"),
      dir, "k", 4)
    val feed = Seq(
      (1L, 2L, "U", "newer"), (1L, 1L, "U", "older"), // out of order
      (2L, 5L, "D", ""), (2L, 3L, "U", "doomed"),     // delete wins
      (3L, 1L, "I", "fresh"), (3L, 1L, "I", "fresh"), // duplicate insert
      (4L, 7L, "D", "")                                // delete of absent
    ).toDF("k", "seq", "op", "v")
    VersionedKeyedTable.applyChanges(spark, dir, feed, "k", "seq", "op")
    assert(state(dir) === Map(
      1L -> (2L, "newer"), 3L -> (1L, "fresh")))
  }

  test("cross-batch: replay is a per-row no-op (zero change rows), " +
      "stale events never regress, equal sequence is already-applied") {
    val dir = freshDir()
    VersionedKeyedTable.create(
      Seq((1L, 10L, "ten")).toDF("k", "seq", "v"), dir, "k", 4)
    val b1 = Seq((1L, 20L, "U", "twenty"), (2L, 1L, "I", "two"))
      .toDF("k", "seq", "op", "v")
    VersionedKeyedTable.applyChanges(spark, dir, b1, "k", "seq", "op")
    assert(state(dir) === Map(1L -> (20L, "twenty"), 2L -> (1L, "two")))
    // replay the whole batch: state identical AND the commit's change
    // feed is EMPTY — per-row idempotence, not just convergence
    val vBefore = VersionedKeyedTable.snapshot(spark, dir).version
    VersionedKeyedTable.applyChanges(spark, dir, b1, "k", "seq", "op")
    val vAfter = VersionedKeyedTable.snapshot(spark, dir).version
    assert(state(dir) === Map(1L -> (20L, "twenty"), 2L -> (1L, "two")))
    assert(VersionedKeyedTable.changesBetween(spark, dir, "k",
      vBefore, vAfter).count() === 0L)
    // stale event (seq 15 < applied 20) is a no-op
    VersionedKeyedTable.applyChanges(spark, dir,
      Seq((1L, 15L, "U", "stale")).toDF("k", "seq", "op", "v"),
      "k", "seq", "op")
    assert(state(dir)(1L) === ((20L, "twenty")))
    // stale delete is ALSO a no-op (the sequence gate guards deletes)
    VersionedKeyedTable.applyChanges(spark, dir,
      Seq((1L, 15L, "D", "")).toDF("k", "seq", "op", "v"),
      "k", "seq", "op")
    assert(state(dir).contains(1L))
  }

  test("EQUAL-SEQUENCE delete/upsert pairs converge to the SAME state " +
      "no matter how the feed is batched: the cross-batch delete gate " +
      "(>=) matches the within-batch tiebreak (delete wins at a tie), " +
      "while upsert replays at the stored sequence stay no-ops") {
    // one batch: U@5 + D@5 -> delete wins (the window tiebreak)
    val dir1 = freshDir()
    VersionedKeyedTable.create(
      Seq((9L, 0L, "seed")).toDF("k", "seq", "v"), dir1, "k", 4)
    VersionedKeyedTable.applyChanges(spark, dir1,
      Seq((1L, 5L, "U", "five"), (1L, 5L, "D", ""))
        .toDF("k", "seq", "op", "v"), "k", "seq", "op")
    assert(!state(dir1).contains(1L), "within one batch the delete wins")
    // two batches, upsert first: the same pair must reach the same
    // state — the delete lands against the stored seq-5 row (>= gate)
    val dir2 = freshDir()
    VersionedKeyedTable.create(
      Seq((9L, 0L, "seed")).toDF("k", "seq", "v"), dir2, "k", 4)
    VersionedKeyedTable.applyChanges(spark, dir2,
      Seq((1L, 5L, "U", "five")).toDF("k", "seq", "op", "v"),
      "k", "seq", "op")
    assert(state(dir2)(1L) === ((5L, "five")))
    VersionedKeyedTable.applyChanges(spark, dir2,
      Seq((1L, 5L, "D", "")).toDF("k", "seq", "op", "v"),
      "k", "seq", "op")
    assert(!state(dir2).contains(1L),
      "across batches the equal-sequence delete must still win — " +
        "final state must not depend on batching")
    // a STRICTLY stale delete (below the stored sequence) stays a no-op
    VersionedKeyedTable.applyChanges(spark, dir2,
      Seq((9L, 3L, "U", "nine")).toDF("k", "seq", "op", "v"),
      "k", "seq", "op")
    VersionedKeyedTable.applyChanges(spark, dir2,
      Seq((9L, 2L, "D", "")).toDF("k", "seq", "op", "v"),
      "k", "seq", "op")
    assert(state(dir2)(9L) === ((3L, "nine")))
    // an equal-sequence UPSERT replay is still a per-row no-op (empty
    // change feed) — only deletes widened their gate
    val vBefore = VersionedKeyedTable.snapshot(spark, dir2).version
    VersionedKeyedTable.applyChanges(spark, dir2,
      Seq((9L, 3L, "U", "replayed")).toDF("k", "seq", "op", "v"),
      "k", "seq", "op")
    assert(state(dir2)(9L) === ((3L, "nine")))
    assert(VersionedKeyedTable.changesBetween(spark, dir2, "k",
      vBefore, VersionedKeyedTable.snapshot(spark, dir2).version)
      .count() === 0L)
  }

  test("a NULL stored sequence accepts any event; feed/table contract " +
      "violations fail loudly") {
    val dir = freshDir()
    VersionedKeyedTable.create(
      Seq((1L, Option.empty[Long], "manual")).toDF("k", "seq", "v"),
      dir, "k", 4)
    VersionedKeyedTable.applyChanges(spark, dir,
      Seq((1L, 1L, "U", "cdc")).toDF("k", "seq", "op", "v"),
      "k", "seq", "op")
    assert(state(dir)(1L) === ((1L, "cdc")))
    // op column colliding with a table column is refused
    intercept[IllegalArgumentException] {
      VersionedKeyedTable.applyChanges(spark, dir,
        Seq((1L, 2L, "U", "x")).toDF("k", "seq", "v", "extra"),
        "k", "seq", "v")
    }
    // feed missing the sequence column is refused
    intercept[IllegalArgumentException] {
      VersionedKeyedTable.applyChanges(spark, dir,
        Seq((1L, "U")).toDF("k", "op"), "k", "seq", "op")
    }
  }
}
