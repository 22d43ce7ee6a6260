package graft.sinks

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import graft.TestSpark

/** TAGS: immutable named version pointers — creation semantics
  * (atomic, idempotent on the same version, never moved), resolution
  * (programmatic + `VERSION AS OF 'name'` + `t$tags` + CALL
  * procedures), and the vacuum contract (tagged versions are retained
  * past the retention count until the tag is dropped). */
class VersionedTagsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft-tags").toString + "/t"

  test("tag pins a version: idempotent re-tag, refused move, refused " +
      "numeric name, resolution and listing") {
    val dir = freshDir()
    VersionedKeyedTable.create(
      (1L to 50L).map(i => (i, s"v$i")).toDF("k", "v"), dir, "k", 4)
    val v1 = VersionedKeyedTable.tag(spark, dir, "baseline")
    assert(v1 === 1L)
    assert(VersionedKeyedTable.tag(spark, dir, "baseline",
      Some(1L)) === 1L) // idempotent
    VersionedKeyedTable.upsert(spark, dir,
      Seq((1L, "NEW")).toDF("k", "v"), "k")
    intercept[IllegalStateException] {
      VersionedKeyedTable.tag(spark, dir, "baseline") // would move
    }
    intercept[IllegalArgumentException] {
      VersionedKeyedTable.tag(spark, dir, "42") // numeric = ambiguous
    }
    VersionedKeyedTable.tag(spark, dir, "after-fix")
    assert(VersionedKeyedTable.tags(spark, dir) ===
      Map("baseline" -> 1L, "after-fix" -> 2L))
    assert(VersionedKeyedTable.readTagged(spark, dir, "baseline")
      .where($"k" === 1L).as[(Long, String)].head()._2 === "v1")
    assert(VersionedKeyedTable.readTagged(spark, dir, "after-fix")
      .where($"k" === 1L).as[(Long, String)].head()._2 === "NEW")
  }

  test("vacuum RETAINS tagged versions past keepVersions; deleteTag " +
      "releases them for reclamation") {
    val dir = freshDir()
    VersionedKeyedTable.create(
      (1L to 60L).map(i => (i, s"v$i")).toDF("k", "v"), dir, "k", 4)
    VersionedKeyedTable.tag(spark, dir, "pinned")
    // three more commits so v1 falls past keepVersions=1
    (1 to 3).foreach(i => VersionedKeyedTable.upsert(spark, dir,
      Seq((i.toLong, s"gen$i")).toDF("k", "v"), "k"))
    VersionedKeyedTable.vacuum(spark, dir, keepVersions = 1,
      graceMs = 0L, stagingGraceMs = 0L)
    // the tagged snapshot still reads IN FULL (manifest + data files)
    assert(VersionedKeyedTable.readTagged(spark, dir, "pinned")
      .count() === 60L)
    assert(VersionedKeyedTable.readTagged(spark, dir, "pinned")
      .where($"k" === 1L).as[(Long, String)].head()._2 === "v1")
    // untagged intermediates were reclaimed
    assert(VersionedKeyedTable.completeVersions(spark, dir)
      .toSet === Set(1L, 4L))
    // released tag -> next vacuum reclaims the old version
    VersionedKeyedTable.deleteTag(spark, dir, "pinned")
    VersionedKeyedTable.vacuum(spark, dir, keepVersions = 1,
      graceMs = 0L, stagingGraceMs = 0L)
    assert(VersionedKeyedTable.completeVersions(spark, dir) === Seq(4L))
    intercept[IllegalStateException] {
      VersionedKeyedTable.readTagged(spark, dir, "pinned")
    }
  }

  test("SQL: VERSION AS OF 'tag' resolves, t$tags lists, CALL " +
      "cat.tag/drop_tag manage tags, unknown names fail loudly") {
    val base = Files.createTempDirectory("graft-tags-cat").toString
    spark.conf.set("spark.sql.catalog.tcat",
      classOf[graft.sinks.v2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.tcat.base", base)
    val dir = s"$base/t"
    VersionedKeyedTable.create(
      (1L to 40L).map(i => (i, i * 2L)).toDF("k", "x"), dir, "k", 2)
    spark.sql("CALL tcat.tag(tbl => 't', name => 'rel1')")
    VersionedKeyedTable.delete(spark, dir,
      Seq(1L, 2L).toDF("k"), "k")
    assert(spark.sql("SELECT count(*) AS n FROM tcat.t")
      .as[Long].head() === 38L)
    assert(spark.sql(
        "SELECT count(*) AS n FROM tcat.t VERSION AS OF 'rel1'")
      .as[Long].head() === 40L)
    assert(spark.sql("SELECT name, version FROM tcat.`t$tags`")
      .as[(String, Long)].collect().toSeq === Seq(("rel1", 1L)))
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM tcat.t VERSION AS OF 'nope'").collect()
    }
    assert(e.getMessage.contains("nope"))
    spark.sql("CALL tcat.drop_tag(tbl => 't', name => 'rel1')")
    assert(spark.sql("SELECT count(*) AS n FROM tcat.`t$tags`")
      .as[Long].head() === 0L)
  }
}
