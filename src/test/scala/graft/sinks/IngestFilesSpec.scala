package graft.sinks

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import graft.TestSpark

/** IDEMPOTENT FILE INGEST (the COPY INTO shape): only never-ingested
  * source files load, a caught-up re-run commits nothing, new files
  * arriving between runs load incrementally, hidden/underscore names
  * are skipped, and the marker registry survives vacuum. */
class IngestFilesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def scratch(p: String): String =
    Files.createTempDirectory("graft-ingest-" + p).toString

  test("first run loads all; re-run is a no-op; a new file loads " +
      "incrementally; hidden files skipped") {
    val src = scratch("src")
    val dir = scratch("tbl") + "/t"
    (1L to 10L).map(i => (i, s"a$i")).toDF("k", "v")
      .coalesce(1).write.parquet(s"$src/batch1")
    (11L to 20L).map(i => (i, s"b$i")).toDF("k", "v")
      .coalesce(1).write.parquet(s"$src/batch2")
    VersionedKeyedTable.create(
      spark.emptyDataset[(Long, String)].toDF("k", "v"), dir, "k", 4)
    val n1 = VersionedKeyedTable.ingestFiles(spark, dir, src, "k")
    assert(n1 >= 2) // at least one data file per batch dir
    assert(VersionedKeyedTable.read(spark, dir).count() === 20L)
    val vAfter = VersionedKeyedTable.snapshot(spark, dir).version
    // caught up: no new files, no commit
    assert(VersionedKeyedTable.ingestFiles(spark, dir, src, "k") === 0)
    assert(VersionedKeyedTable.snapshot(spark, dir).version === vAfter)
    // a third batch lands; only it loads
    (21L to 25L).map(i => (i, s"c$i")).toDF("k", "v")
      .coalesce(1).write.parquet(s"$src/batch3")
    val n3 = VersionedKeyedTable.ingestFiles(spark, dir, src, "k")
    assert(n3 >= 1)
    assert(VersionedKeyedTable.read(spark, dir).count() === 25L)
    // the parquet _SUCCESS markers were never candidates
    assert(VersionedKeyedTable.ingestedFiles(spark, dir)
      .forall(id => !id.contains("_SUCCESS")))
  }

  test("marker registry survives vacuum; ingest commit stamps its " +
      "file list in commit metadata") {
    val src = scratch("src2")
    val dir = scratch("tbl2") + "/t"
    (1L to 5L).map(i => (i, i * 2)).toDF("k", "v")
      .coalesce(1).write.parquet(s"$src/b1")
    VersionedKeyedTable.create(
      spark.emptyDataset[(Long, Long)].toDF("k", "v"), dir, "k", 4)
    VersionedKeyedTable.ingestFiles(spark, dir, src, "k")
    val snap = VersionedKeyedTable.snapshot(spark, dir)
    assert(snap.meta.get("graft.ingest.files").exists(_.nonEmpty))
    assert(snap.meta.get("graft.ingest.source").contains(src))
    // churn versions past retention, then vacuum — markers survive
    (1 to 3).foreach(i => VersionedKeyedTable.upsert(spark, dir,
      Seq((100L + i, 0L)).toDF("k", "v"), "k"))
    VersionedKeyedTable.vacuum(spark, dir, keepVersions = 1, graceMs = 0L)
    assert(VersionedKeyedTable.ingestedFiles(spark, dir).nonEmpty)
    assert(VersionedKeyedTable.ingestFiles(spark, dir, src, "k") === 0)
  }

  test("t$ingest metadata relation lists the loaded registry with " +
      "file lengths") {
    val src = scratch("src4")
    val base = scratch("tbl4")
    val dir = s"$base/t"
    (1L to 5L).map(i => (i, i)).toDF("k", "v")
      .coalesce(1).write.parquet(s"$src/b1")
    VersionedKeyedTable.create(
      spark.emptyDataset[(Long, Long)].toDF("k", "v"), dir, "k", 4)
    VersionedKeyedTable.ingestFiles(spark, dir, src, "k")
    val cat = "ging" + scala.util.Random.alphanumeric.take(6)
      .mkString.toLowerCase
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sinks.v2.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.base", base)
    val rows = spark.sql(s"SELECT file, length FROM $cat.`t$$ingest`")
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getString(0).endsWith(".parquet") &&
      !r.isNullAt(1) && r.getLong(1) > 0L))
  }

  test("DEEP source paths ingest idempotently: the marker filename is " +
      "a fixed-length digest (a URL-encoded identity would exceed the " +
      "filesystem's ~255-byte filename limit and silently re-ingest " +
      "forever), the identity round-trips through marker content, and " +
      "legacy filename-encoded markers still resolve") {
    val src = scratch("deep")
    val dir = scratch("tbldeep") + "/t"
    // a source path deep enough that enc(relpath|len) > 255 bytes
    val deep = (1 to 30).map(i => f"level_$i%02d_directory").mkString("/")
    (1L to 5L).map(i => (i, s"d$i")).toDF("k", "v")
      .coalesce(1).write.parquet(s"$src/$deep/leaf")
    VersionedKeyedTable.create(
      spark.emptyDataset[(Long, String)].toDF("k", "v"), dir, "k", 4)
    assert(VersionedKeyedTable.ingestFiles(spark, dir, src, "k") === 1)
    val v1 = VersionedKeyedTable.snapshot(spark, dir).version
    // THE no-op contract the digest exists for: the re-run must see
    // the marker (0 files, no commit), not re-pay O(file) every run
    assert(VersionedKeyedTable.ingestFiles(spark, dir, src, "k") === 0)
    assert(VersionedKeyedTable.snapshot(spark, dir).version === v1)
    // the registry holds the full identity (content, not filename)
    val ids = VersionedKeyedTable.ingestedFiles(spark, dir)
    assert(ids.size === 1 && ids.head.startsWith(deep.take(20)),
      s"the stored identity must be the relative path ($ids)")
    // marker filenames are fixed-length hex digests
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names = fs.listStatus(new org.apache.hadoop.fs.Path(dir, "_ingest"))
      .map(_.getPath.getName).toSeq
    assert(names.forall(n => n.length == 64 &&
      n.forall(c => c.isDigit || ('a' to 'f').contains(c))),
      s"marker names must be SHA-256 hex ($names)")
    // LEGACY marker compatibility: a round-13-format marker (identity
    // URL-encoded in the filename, content '1') still counts as
    // ingested — upgrading must not re-ingest the whole registry
    (6L to 9L).map(i => (i, s"x$i")).toDF("k", "v")
      .coalesce(1).write.parquet(s"$src/shallow")
    val shallowRel = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$src/shallow"))
      .map(_.getPath.getName).find(_.endsWith(".parquet")).get
    val shallowLen = fs.getFileStatus(new org.apache.hadoop.fs.Path(
      s"$src/shallow/$shallowRel")).getLen
    val legacyId = java.net.URLEncoder.encode(
      s"shallow/$shallowRel|$shallowLen", "UTF-8")
    val out = fs.create(new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(dir, "_ingest"), legacyId), true)
    out.write("1\n#end\n".getBytes("UTF-8")); out.close()
    assert(VersionedKeyedTable.ingestFiles(spark, dir, src, "k") === 0,
      "a legacy filename-encoded marker must still read as ingested")
  }

  test("missing key column in source files fails loudly; missing " +
      "source dir fails loudly") {
    val src = scratch("src3")
    val dir = scratch("tbl3") + "/t"
    (1L to 3L).map(i => (i, i)).toDF("notk", "v")
      .coalesce(1).write.parquet(s"$src/b1")
    VersionedKeyedTable.create(
      spark.emptyDataset[(Long, Long)].toDF("k", "v"), dir, "k", 4)
    intercept[IllegalArgumentException] {
      VersionedKeyedTable.ingestFiles(spark, dir, src, "k")
    }
    intercept[IllegalArgumentException] {
      VersionedKeyedTable.ingestFiles(spark, dir, src + "/nope", "k")
    }
  }
}
