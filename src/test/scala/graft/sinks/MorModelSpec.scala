package graft.sinks

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files
import graft.TestSpark

/** MODEL-BASED invariant net for the merge-on-read mutation core
  * (upsertMor / deleteMor / mutateMor — the round-14 generalization):
  * a deterministic pseudo-random sequence of mixed mutations is
  * applied BOTH to the store and to an in-memory Map model, and after
  * EVERY step the store must agree with the model on (a) full
  * contents, (b) metadata COUNT(*) exactness (the per-entry
  * kills-exactly-one-row invariant), and (c) survival of every
  * pre-existing data file (MoR never rewrites). Interleaved compacts
  * fold the pending state without changing either answer. One seeded
  * RNG — failures reproduce. */
class MorModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("a 30-step randomized mix of upsertMor/deleteMor/mutateMor " +
      "(+ interleaved compacts) tracks the Map model exactly: " +
      "contents, metadata counts, and append-only file sets") {
    val dir = Files.createTempDirectory("graft-mormodel").toString + "/t"
    val rnd = new scala.util.Random(20260816L)
    val model = scala.collection.mutable.Map[Long, Long]()
    val init = (1L to 60L).map(i => (i, i * 100L))
    init.foreach { case (k, v) => model(k) = v }
    VersionedKeyedTable.create(init.toDF("k", "v"), dir, "k", 4)

    def keys(n: Int): Seq[Long] =
      Seq.fill(n)(rnd.nextLong(120L) + 1L).distinct

    def check(step: String): Unit = {
      val got = VersionedKeyedTable.read(spark, dir)
        .as[(Long, Long)].collect().toMap
      assert(got === model.toMap, s"contents diverged at $step")
      assert(VersionedKeyedTable.countRows(spark, dir) ===
        Some(model.size.toLong), s"metadata count diverged at $step")
    }

    for (step <- 1 to 30) {
      val before = VersionedKeyedTable.snapshot(spark, dir)
        .files.values.flatten.toSet
      val op = rnd.nextInt(4)
      op match {
        case 0 => // upsertMor: puts
          val ks = keys(rnd.nextInt(8) + 1)
          val rows = ks.map(k => (k, step * 1000L + k))
          VersionedKeyedTable.upsertMor(spark, dir,
            rows.toDF("k", "v"), "k")
          rows.foreach { case (k, v) => model(k) = v }
        case 1 => // deleteMor: doomed keys (some absent — no-ops)
          val ks = keys(rnd.nextInt(8) + 1)
          VersionedKeyedTable.deleteMor(spark, dir, ks.toDF("k"), "k")
          ks.foreach(model.remove)
        case 2 => // mutateMor: puts AND deletes in one commit, with
          // a deliberate overlap (a key both put and doomed is a put)
          val put = keys(rnd.nextInt(6) + 1)
          val del = keys(rnd.nextInt(6) + 1)
          val rows = put.map(k => (k, step * 1000L + k))
          VersionedKeyedTable.mutateMor(spark, dir,
            rows.toDF("k", "v"), Some(del.toDF("k")), "k")
          del.filterNot(put.contains).foreach(model.remove)
          rows.foreach { case (k, v) => model(k) = v }
        case 3 => // compact: folds pending state, changes NOTHING
          VersionedKeyedTable.compact(spark, dir, "k",
            maxFilesPerBucket = 4)
      }
      // MoR mutations are APPEND-ONLY: every pre-existing data file
      // survives them (compaction is the one legitimate re-writer)
      if (op != 3) {
        val after = VersionedKeyedTable.snapshot(spark, dir)
          .files.values.flatten.toSet
        assert(before.subsetOf(after),
          s"a MoR mutation dropped a pre-existing data file at " +
            s"step $step (op $op)")
      }
      check(s"step $step")
    }
    // closing compact: everything folds, nothing changes
    VersionedKeyedTable.compact(spark, dir, "k")
    assert(VersionedKeyedTable.snapshot(spark, dir).deletes.isEmpty)
    check("final compact")
  }
}
