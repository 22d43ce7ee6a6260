package graft.sinks

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files
import graft.TestSpark

/** WRITABLE BRANCHES (write-audit-publish): a branch is a zero-copy
  * independent table stamped with its fork version; publish lands the
  * branch's NET changes on main as ONE merge commit, refusing when
  * main advanced past the audited fork. The Iceberg WAP workflow over
  * the linked-clone primitive. */
class WapBranchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(p: String): String =
    Files.createTempDirectory(s"graft-wap-$p").toString

  private def state(dir: String): Map[Long, Long] =
    VersionedKeyedTable.read(spark, dir)
      .as[(Long, Long)].collect().toMap

  test("branch writes stay invisible on main; publish lands the net " +
      "change (upserts + deletes, multi-commit collapsed) as ONE " +
      "CDF-captured commit; a no-commit branch publishes as a no-op") {
    val base = fresh("pub")
    val main = s"$base/main"; val br = s"$base/br"
    VersionedKeyedTable.create(
      (1L to 50L).map(i => (i, i * 10L)).toDF("k", "v"), main, "k", 4)
    val fork = VersionedKeyedTable.branchFrom(spark, main, br)
    assert(fork === 1L)
    // three branch commits: update, insert, delete — main untouched
    VersionedKeyedTable.upsert(spark, br,
      Seq((1L, 111L), (60L, 600L)).toDF("k", "v"), "k")
    VersionedKeyedTable.upsert(spark, br,
      Seq((3L, 333L)).toDF("k", "v"), "k")
    VersionedKeyedTable.delete(spark, br, Seq(2L).toDF("k"), "k")
    assert(state(main) === (1L to 50L).map(i => i -> i * 10L).toMap,
      "branch writes must be invisible on main until publish")
    assert(VersionedKeyedTable.snapshot(spark, main).version === 1L)
    // the audit step: read the branch (what publishes IS what reads)
    assert(state(br)(1L) === 111L && !state(br).contains(2L))
    val after = VersionedKeyedTable.publish(spark, main, br, "k")
    assert(after === 2L, "the publish is exactly ONE commit on main")
    val expect = ((1L to 50L).map(i => i -> i * 10L).toMap +
      (1L -> 111L) + (3L -> 333L) + (60L -> 600L)) - 2L
    assert(state(main) === expect)
    // the publish is ordinary CDF on main
    val cdf = VersionedKeyedTable.changesBetween(spark, main, "k", 1L, 2L)
    assert(cdf.filter(col("change_type") === "delete").count() === 1L)
    assert(cdf.count() === 4L, "net change: 2 updates, 1 insert, 1 delete")
    // publishing a branch with no commits past the fork is a no-op —
    // even against a moved main
    val quiet = s"$base/quiet"
    VersionedKeyedTable.branchFrom(spark, main, quiet)
    VersionedKeyedTable.upsert(spark, main,
      Seq((7L, 700L)).toDF("k", "v"), "k")
    assert(VersionedKeyedTable.publish(spark, main, quiet, "k") === 3L)
    assert(VersionedKeyedTable.snapshot(spark, main).version === 3L)
  }

  test("STRICT fork gate: publish refuses when main advanced past the " +
      "audited fork; allowDiverged merges keyed last-writer-wins; a " +
      "plain clone (no fork stamp) refuses publish outright") {
    val base = fresh("gate")
    val main = s"$base/main"
    VersionedKeyedTable.create(
      (1L to 20L).map(i => (i, i * 10L)).toDF("k", "v"), main, "k", 4)
    val br = s"$base/br"
    VersionedKeyedTable.branchFrom(spark, main, br)
    VersionedKeyedTable.upsert(spark, br,
      Seq((1L, 111L)).toDF("k", "v"), "k")
    // main moves past the fork (someone else committed)
    VersionedKeyedTable.upsert(spark, main,
      Seq((1L, 999L), (2L, 222L)).toDF("k", "v"), "k")
    val e = intercept[IllegalArgumentException] {
      VersionedKeyedTable.publish(spark, main, br, "k")
    }
    assert(e.getMessage.contains("advanced past the audited fork"))
    assert(state(main)(1L) === 999L, "the refusal changed nothing")
    // allowDiverged: the branch's change wins for ITS keys, main's
    // disjoint progress survives
    VersionedKeyedTable.publish(spark, main, br, "k",
      allowDiverged = true)
    assert(state(main)(1L) === 111L && state(main)(2L) === 222L)
    // a plain cloneAt carries no fork stamp — publish refuses loudly
    val clone = s"$base/clone"
    VersionedKeyedTable.cloneAt(spark, main, clone)
    VersionedKeyedTable.upsert(spark, clone,
      Seq((9L, 9L)).toDF("k", "v"), "k")
    val e2 = intercept[IllegalArgumentException] {
      VersionedKeyedTable.publish(spark, main, clone, "k")
    }
    assert(e2.getMessage.contains("not a branch"))
  }

  test("a branch written MERGE-ON-READ publishes identically: MoR " +
      "commits capture ordinary CDF, so the net change lands on main " +
      "without the branch ever compacting — and main carries no " +
      "pending MoR state afterwards") {
    val base = fresh("mor")
    val main = s"$base/main"; val br = s"$base/br"
    VersionedKeyedTable.create(
      (1L to 30L).map(i => (i, i)).toDF("k", "v"), main, "k", 4)
    VersionedKeyedTable.branchFrom(spark, main, br)
    VersionedKeyedTable.upsertMor(spark, br,
      Seq((1L, -1L), (31L, 310L)).toDF("k", "v"), "k")
    VersionedKeyedTable.deleteMor(spark, br, Seq(2L).toDF("k"), "k")
    assert(VersionedKeyedTable.snapshot(spark, br)
      .deletes.valuesIterator.flatten.nonEmpty,
      "the branch really is in pending-MoR state")
    VersionedKeyedTable.publish(spark, main, br, "k")
    assert(state(main) === ((1L to 30L).map(i => i -> i).toMap +
      (1L -> -1L) + (31L -> 310L)) - 2L)
    assert(VersionedKeyedTable.snapshot(spark, main).deletes.isEmpty,
      "the publish merge on main is copy-on-write — no pending state " +
        "leaks across")
  }

  test("additive schema evolution on the branch carries through the " +
      "publish; SQL faces: CALL cat.branch / cat.publish with the " +
      "evidence row, and the branch is an ordinary SQL identifier") {
    val base = fresh("sql")
    spark.conf.set("spark.sql.catalog.gwap",
      classOf[graft.sinks.v2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gwap.base", base)
    VersionedKeyedTable.create(
      (1L to 10L).map(i => (i, i * 10L)).toDF("k", "v"),
      s"$base/t", "k", 4)
    spark.sql("CALL gwap.branch(tbl => 't', name => 'dev')")
    // the branch is a full SQL citizen: evolve it and write wider
    spark.sql("ALTER TABLE gwap.dev ADD COLUMNS (tagv BIGINT)")
    spark.sql("INSERT INTO gwap.dev VALUES (1, 111, 7), (11, 110, 8)")
    spark.sql("DELETE FROM gwap.dev WHERE k = 2")
    // main is untouched and unevolved
    assert(spark.table("gwap.t").columns.toSeq === Seq("k", "v"))
    val r = spark.sql("CALL gwap.publish(tbl => 't', branch => 'dev')")
      .collect()(0)
    assert(r.getLong(2) === r.getLong(1) + 1,
      "the publish evidence row shows exactly one commit")
    // main evolved additively through the publish; pre-branch rows
    // read the late column as null
    val got = spark.sql("SELECT k, v, tagv FROM gwap.t")
      .collect().map(row => row.getLong(0) -> (row.getLong(1),
        if (row.isNullAt(2)) None else Some(row.getLong(2)))).toMap
    assert(got(1L) === ((111L, Some(7L))))
    assert(got(11L) === ((110L, Some(8L))))
    assert(!got.contains(2L))
    assert(got(3L) === ((30L, None)))
    // a stale publish through SQL refuses too
    spark.sql("CALL gwap.branch(tbl => 't', name => 'dev2')")
    spark.sql("INSERT INTO gwap.dev2 VALUES (5, 555, 1)")
    spark.sql("INSERT INTO gwap.t VALUES (6, 666, 9)")
    intercept[Exception] {
      spark.sql("CALL gwap.publish(tbl => 't', branch => 'dev2')")
        .collect()
    }
    // allow_diverged merges
    spark.sql("CALL gwap.publish(tbl => 't', branch => 'dev2', " +
      "allow_diverged => true)").collect()
    assert(spark.sql("SELECT v FROM gwap.t WHERE k = 5")
      .collect()(0).getLong(0) === 555L)
  }
}
